"""Distributed Bloom filter construction on Spark.

The Spark replacement for the reference's Redis distribution layer
(/root/reference/src/main/java/orestes/bloomfilter/redis/*): instead of
one shared mutable bit array behind WATCH/MULTI transactions
(RedisBitSet.java:36-100, CountingBloomFilterRedis.java:114-156), each
partition builds an immutable local bitset from its Arrow batches and
the partials are OR-merged associatively — Spark's partial/final
aggregation shape, realized with ``mapInPandas`` (partials) +
``applyInPandas`` tree merge (final), because PySpark has no native
binary-reducing UDAF over opaque state.

Everything stays vectorized: Arrow batch -> numpy hash matrix ->
bool-array scatter -> ``np.packbits``.  No per-row Python anywhere in
the hot path (the Spark analog of the reference's pipelined bulk ops,
redis/BloomFilterRedis.java:51-97).

Scale notes (100 TB / 1000-executor design):
- Partials are 1 row x (m/8) bytes per partition.  Driver collect of P
  partials is P*m/8 bytes; above ``tree_merge_threshold`` partitions the
  build inserts a shuffle-light two-phase merge (group = pid % G) so the
  driver sees only G rows.
- The plain build needs NO shuffle at all: any row may land in any
  partition, so we never repartition unless asked.
- Per-group (e.g. per-repo) builds hash-partition by group and are
  exposed in grouped.py with salted two-phase merging for skew.
"""

from __future__ import annotations

import time
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .counting import CountingBloomFilter, add_saturating, counter_dtype, counter_max
from .filter import BloomFilter, popcount
from .hashing import as_bytes_array, get_hash_fn, murmur3_32
from .params import FilterConfig

#: Above this many input partitions the partials are tree-merged on
#: executors before the driver sees them.
DEFAULT_TREE_MERGE_THRESHOLD = 64
#: Fan-in of the executor-side merge stage.
DEFAULT_TREE_MERGE_GROUPS = 16

PARTIAL_SCHEMA = (
    "part_id int, rows bigint, ones bigint, fingerprint bigint, "
    "t_ms double, bitset binary"
)

COUNTING_PARTIAL_SCHEMA = (
    "part_id int, rows bigint, nonzero bigint, overflows bigint, "
    "fingerprint bigint, t_ms double, counters binary"
)


def _key_series_to_bytes(series: pd.Series) -> np.ndarray:
    """Arrow batch column -> object ndarray of UTF-8 bytes.

    Matches BloomFilter.toBytes (BloomFilter.java:152-154): the UTF-8
    bytes of the element's string form; binary columns pass through.
    """
    vals = series.to_numpy(dtype=object, copy=False)
    return as_bytes_array(vals)


def _fingerprint(keys: np.ndarray) -> int:
    """Order-independent content fingerprint of a key batch: the sum of
    murmur3 hashes mod 2^63 (cheap, vectorized, merge-associative).
    Backs per-partition lineage (see checkpoint.py)."""
    if len(keys) == 0:
        return 0
    return int(murmur3_32(keys, 0).astype(np.uint64).sum() % np.uint64(2**63))


def key_column(col: str, cast: bool = True) -> Column:
    """Normalize the key column: everything hashes as its string form,
    like the reference's toString()-based toBytes."""
    c = F.col(col)
    return c.cast("string") if cast else c


def _partition_bits_builder(config: FilterConfig, colname: str):
    """mapInPandas generator: one (part_id, metrics, bitset) row per
    partition — the partial-aggregate step."""
    m, k = config.m, config.k
    method = config.hash_method
    num_bytes = config.num_bytes

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t0 = time.time()
        hash_fn = get_hash_fn(method)
        seen = np.zeros(m, dtype=bool)
        rows = 0
        fingerprint = np.uint64(0)
        for pdf in batches:
            keys = _key_series_to_bytes(pdf[colname])
            if len(keys) == 0:
                continue
            pos = hash_fn(keys, m, k)
            seen[pos.ravel()] = True
            rows += len(keys)
            fingerprint += murmur3_32(keys, 0).astype(np.uint64).sum()
        bits = np.packbits(seen, bitorder="little")
        if bits.size < num_bytes:
            bits = np.pad(bits, (0, num_bytes - bits.size))
        ctx = TaskContext.get()
        yield pd.DataFrame(
            {
                "part_id": [ctx.partitionId() if ctx else -1],
                "rows": [rows],
                "ones": [popcount(bits)],
                "fingerprint": [int(fingerprint % np.uint64(2**63))],
                "t_ms": [(time.time() - t0) * 1000.0],
                "bitset": [bits.tobytes()],
            }
        )

    return gen


def _or_merge_partials(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas reducer: OR a group of partial bitsets into one row.
    Associative + commutative, so Spark may group/evaluate in any order."""
    arrays = [np.frombuffer(b, dtype=np.uint8) for b in pdf["bitset"]]
    acc = np.bitwise_or.reduce(np.vstack(arrays), axis=0)
    return pd.DataFrame(
        {
            "part_id": [int(pdf["part_id"].min())],
            "rows": [int(pdf["rows"].sum())],
            "ones": [popcount(acc)],
            "fingerprint": [int(pdf["fingerprint"].astype(np.uint64).sum() % np.uint64(2**63))],
            "t_ms": [float(pdf["t_ms"].sum())],
            "bitset": [acc.tobytes()],
        }
    )


def build_partials(df: DataFrame, col: str, config: FilterConfig) -> DataFrame:
    """Per-partition partial bitsets as a DataFrame (the map-side combine).

    One output row per input partition:
    ``(part_id, rows, ones, fingerprint, t_ms, bitset)``.
    """
    keyed = df.select(key_column(col).alias("__key"))
    return keyed.mapInPandas(
        _partition_bits_builder(config, "__key"), schema=PARTIAL_SCHEMA
    )


def merge_partial_rows(rows, config: FilterConfig) -> BloomFilter:
    """Driver-side final merge of collected partial rows."""
    acc = np.zeros(config.num_bytes, dtype=np.uint8)
    for row in rows:
        arr = np.frombuffer(row["bitset"], dtype=np.uint8)
        np.bitwise_or(acc, arr, out=acc)
    return BloomFilter(config, acc)


def build_bloom(
    df: DataFrame,
    col: str,
    config: FilterConfig,
    *,
    num_partitions: Optional[int] = None,
    tree_merge_threshold: int = DEFAULT_TREE_MERGE_THRESHOLD,
    tree_merge_groups: int = DEFAULT_TREE_MERGE_GROUPS,
) -> BloomFilter:
    """Build a Bloom filter over ``df[col]`` distributed.

    Lifecycle (SURVEY.md §3.1): scan -> select key (column pruning pushes
    to the source) -> mapInPandas partials -> [tree merge if wide] ->
    driver OR-merge.  No shuffle in the default path.
    """
    if num_partitions is not None:
        df = df.repartition(num_partitions)
    partials = build_partials(df, col, config)
    n_parts = df.rdd.getNumPartitions()
    if n_parts > tree_merge_threshold:
        partials = (
            partials.withColumn(
                "part_id", F.pmod(F.col("part_id"), F.lit(tree_merge_groups))
            )
            .groupBy("part_id")
            .applyInPandas(_or_merge_partials, schema=PARTIAL_SCHEMA)
        )
    rows = partials.collect()
    bf = merge_partial_rows(rows, config)
    return bf


# ---------------------------------------------------------------------------
# Counting build
# ---------------------------------------------------------------------------


def _partition_counters_builder(config: FilterConfig, colname: str, weight: int):
    m, k = config.m, config.k
    method = config.hash_method
    dt = counter_dtype(config.counting_bits)
    mx = counter_max(config.counting_bits)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t0 = time.time()
        hash_fn = get_hash_fn(method)
        counters = np.zeros(m, dtype=dt)
        overflows = [0]
        rows = 0
        fingerprint = np.uint64(0)

        def on_over(n):
            overflows[0] += n

        for pdf in batches:
            keys = _key_series_to_bytes(pdf[colname])
            if len(keys) == 0:
                continue
            pos = hash_fn(keys, m, k)
            counts = np.bincount(pos.ravel(), minlength=m)
            if weight != 1:
                counts = counts * weight
            add_saturating(counters, counts, mx, on_over)
            rows += len(keys)
            fingerprint += murmur3_32(keys, 0).astype(np.uint64).sum()
        ctx = TaskContext.get()
        yield pd.DataFrame(
            {
                "part_id": [ctx.partitionId() if ctx else -1],
                "rows": [rows],
                "nonzero": [int(np.count_nonzero(counters))],
                "overflows": [overflows[0]],
                "fingerprint": [int(fingerprint % np.uint64(2**63))],
                "t_ms": [(time.time() - t0) * 1000.0],
                "counters": [counters.tobytes()],
            }
        )

    return gen


def build_counting_partials(
    df: DataFrame, col: str, config: FilterConfig, weight: int = 1
) -> DataFrame:
    keyed = df.select(key_column(col).alias("__key"))
    return keyed.mapInPandas(
        _partition_counters_builder(config, "__key", weight),
        schema=COUNTING_PARTIAL_SCHEMA,
    )


def build_counting(
    df: DataFrame,
    col: str,
    config: FilterConfig,
    *,
    num_partitions: Optional[int] = None,
    tree_merge_threshold: int = DEFAULT_TREE_MERGE_THRESHOLD,
    tree_merge_groups: int = DEFAULT_TREE_MERGE_GROUPS,
) -> CountingBloomFilter:
    """Distributed counting-filter build: per-partition uint counters,
    merged by element-wise saturating add (associative & commutative up
    to saturation — the extension that makes the counting filter
    distributable; see counting.py module docstring)."""
    if num_partitions is not None:
        df = df.repartition(num_partitions)
    partials = build_counting_partials(df, col, config)
    n_parts = df.rdd.getNumPartitions()
    if n_parts > tree_merge_threshold:
        dt = counter_dtype(config.counting_bits)
        mx = counter_max(config.counting_bits)

        def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
            acc = np.zeros(config.m, dtype=dt)
            over = [0]
            for b in pdf["counters"]:
                add_saturating(acc, np.frombuffer(b, dtype=dt), mx, lambda n: over.__setitem__(0, over[0] + n))
            return pd.DataFrame(
                {
                    "part_id": [int(pdf["part_id"].min())],
                    "rows": [int(pdf["rows"].sum())],
                    "nonzero": [int(np.count_nonzero(acc))],
                    "overflows": [int(pdf["overflows"].sum()) + over[0]],
                    "fingerprint": [int(pdf["fingerprint"].astype(np.uint64).sum() % np.uint64(2**63))],
                    "t_ms": [float(pdf["t_ms"].sum())],
                    "counters": [acc.tobytes()],
                }
            )

        partials = (
            partials.withColumn(
                "part_id", F.pmod(F.col("part_id"), F.lit(tree_merge_groups))
            )
            .groupBy("part_id")
            .applyInPandas(merge_group, schema=COUNTING_PARTIAL_SCHEMA)
        )
    rows = partials.collect()
    cbf = CountingBloomFilter(config)
    total_over = 0
    for row in rows:
        arr = np.frombuffer(row["counters"], dtype=counter_dtype(config.counting_bits))
        add_saturating(cbf.counters, arr, cbf.max_count, cbf._on_overflow)
        total_over += int(row["overflows"])
    cbf._overflows += total_over
    return cbf


def build_counting_with_removals(
    adds: DataFrame,
    removes: DataFrame,
    col: str,
    config: FilterConfig,
) -> CountingBloomFilter:
    """Distributed remove (SURVEY.md §3.3): removals aggregate into a
    second counter sketch subtracted (floored at 0) from the adds sketch
    — merge order is irrelevant by associativity, so no transactional
    machinery is needed (vs. redis/CountingBloomFilterRedis.java:119-156)."""
    added = build_counting(adds, col, config)
    removed = build_counting(removes, col, config)
    return added.subtract(removed)
