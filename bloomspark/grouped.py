"""Per-group Bloom filters with salted two-phase merge (skew handling).

Builds one filter per group (e.g. one per ``repo``) as a DataFrame of
``(group, rows, ones, bitset)``.  Skewed groups — the Zipf-heavy repo in
FIXTURES.md F1 — would overload a single reducer under a naive
``groupBy(group)``, so the build is two-phase:

stage 1: ``groupBy(group, salt)`` partial bitsets, where
         ``salt = pmod(xxhash64(key), salt_partitions)`` splits a hot
         group across ``salt_partitions`` reducers;
stage 2: ``groupBy(group)`` OR-merge of the (at most salt_partitions)
         partials per group — tiny inputs, no skew.

This is the "salting + two-phase merge" the north rule requires;
Catalyst's AQE skew handling only covers joins/native aggs, not custom
pandas partials, so it is hand-rolled here (SURVEY.md §4).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .build import _series_to_keys, key_column
from .counting import add_saturating, counter_dtype, counter_max
from .filter import BloomFilter, popcount
from .hashing import get_hash_fn, murmur3_32
from .params import FilterConfig

GROUPED_SCHEMA = "group string, rows bigint, ones bigint, bitset binary"
GROUPED_COUNTING_SCHEMA = "group string, rows bigint, nonzero bigint, counters binary"


def build_bloom_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    config: FilterConfig,
    *,
    salt_partitions: int = 8,
) -> DataFrame:
    """One Bloom filter per group -> DataFrame (group, rows, ones, bitset)."""
    m, k = config.m, config.k
    method = config.hash_method
    num_bytes = config.num_bytes

    def stage1(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = _series_to_keys(pdf["__key"])
        pos = get_hash_fn(method)(keys, m, k)
        seen = np.zeros(m, dtype=bool)
        seen[pos.ravel()] = True
        bits = np.packbits(seen, bitorder="little")
        if bits.size < num_bytes:
            bits = np.pad(bits, (0, num_bytes - bits.size))
        return pd.DataFrame(
            {
                "group": [pdf["__group"].iloc[0]],
                "rows": [len(keys)],
                "ones": [popcount(bits)],
                "bitset": [bits.tobytes()],
            }
        )

    def stage2(pdf: pd.DataFrame) -> pd.DataFrame:
        arrays = [np.frombuffer(b, dtype=np.uint8) for b in pdf["bitset"]]
        acc = np.bitwise_or.reduce(np.vstack(arrays), axis=0)
        return pd.DataFrame(
            {
                "group": [pdf["group"].iloc[0]],
                "rows": [int(pdf["rows"].sum())],
                "ones": [popcount(acc)],
                "bitset": [acc.tobytes()],
            }
        )

    keyed = df.select(
        F.col(group_col).cast("string").alias("__group"),
        key_column(key_col).alias("__key"),
        F.pmod(F.xxhash64(key_column(key_col)), F.lit(salt_partitions)).alias("__salt"),
    )
    partials = keyed.groupBy("__group", "__salt").applyInPandas(
        stage1, schema=GROUPED_SCHEMA
    )
    return partials.groupBy("group").applyInPandas(stage2, schema=GROUPED_SCHEMA)


def build_counting_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    config: FilterConfig,
    *,
    salt_partitions: int = 8,
) -> DataFrame:
    """One counting filter per group -> (group, rows, nonzero, counters)."""
    m, k = config.m, config.k
    method = config.hash_method
    dt = counter_dtype(config.counting_bits)
    mx = counter_max(config.counting_bits)

    def stage1(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = _series_to_keys(pdf["__key"])
        pos = get_hash_fn(method)(keys, m, k)
        counters = np.zeros(m, dtype=dt)
        add_saturating(counters, np.bincount(pos.ravel(), minlength=m), mx)
        return pd.DataFrame(
            {
                "group": [pdf["__group"].iloc[0]],
                "rows": [len(keys)],
                "nonzero": [int(np.count_nonzero(counters))],
                "counters": [counters.tobytes()],
            }
        )

    def stage2(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(m, dtype=dt)
        for b in pdf["counters"]:
            add_saturating(acc, np.frombuffer(b, dtype=dt), mx)
        return pd.DataFrame(
            {
                "group": [pdf["group"].iloc[0]],
                "rows": [int(pdf["rows"].sum())],
                "nonzero": [int(np.count_nonzero(acc))],
                "counters": [acc.tobytes()],
            }
        )

    keyed = df.select(
        F.col(group_col).cast("string").alias("__group"),
        key_column(key_col).alias("__key"),
        F.pmod(F.xxhash64(key_column(key_col)), F.lit(salt_partitions)).alias("__salt"),
    )
    partials = keyed.groupBy("__group", "__salt").applyInPandas(
        stage1, schema=GROUPED_COUNTING_SCHEMA
    )
    return partials.groupBy("group").applyInPandas(
        stage2, schema=GROUPED_COUNTING_SCHEMA
    )


def collect_group_filters(grouped: DataFrame, config: FilterConfig) -> dict:
    """Collect a per-group build into {group: BloomFilter} (small dims).

    Uses ``toPandas()`` (Arrow path) — never row-``collect()`` binary
    partials through py4j (CLAUDE.md invariant)."""
    pdf = grouped.select("group", "bitset").toPandas()
    return {
        g: BloomFilter.from_bytes(config, bytes(b))
        for g, b in zip(pdf["group"], pdf["bitset"])
    }


def with_group_membership(
    df: DataFrame,
    group_col: str,
    key_col: str,
    grouped_filters: DataFrame,
    config: FilterConfig,
    *,
    out_col: str = "member",
) -> DataFrame:
    """Probe each row's key against ITS OWN group's filter.

    ``grouped_filters`` is the output of :func:`build_bloom_per_group`
    with the same ``config``.  The filters table is small (one row per
    group), so it is collected once on the driver (Arrow ``toPandas``)
    and broadcast to the executors as a ``{group: bitset}`` dict —
    exactly like the single-filter probe (probe.py:29-43).  The probe
    UDF receives ONLY the (group, key) columns; the multi-MB bitsets
    never appear as a per-row column, so Arrow batch volume is
    O(rows × key_bytes), not O(rows × m/8).  (Round-1 shipped the
    bitset per probe row through a broadcast join — petabytes of Arrow
    traffic at a 10⁹-row grid.)  The plan is a pure scan → Project →
    ArrowEvalPython: no join, no shuffle.  Rows whose group has no
    filter probe False.  This is the Spark shape of the reference's
    pipelined bulk contains (redis/BloomFilterRedis.java:75-97) at
    per-tenant granularity.
    """
    from pyspark.sql.functions import pandas_udf

    from .filter import test_positions
    from .hashing import get_hash_fn

    m, k, method = config.m, config.k, config.hash_method
    fdf = grouped_filters.select("group", "bitset").toPandas()
    filters = {g: bytes(b) for g, b in zip(fdf["group"], fdf["bitset"])}
    bc = df.sparkSession.sparkContext.broadcast(filters)

    @pandas_udf("boolean")
    def probe(groups: pd.Series, keys: pd.Series) -> pd.Series:
        table = bc.value
        kb = _series_to_keys(keys)
        pos = get_hash_fn(method)(kb, m, k)
        out = np.zeros(len(keys), dtype=bool)
        # factorize by group: one vectorized bit-test per distinct filter
        codes, uniques = pd.factorize(groups)
        for ui, g in enumerate(uniques):
            raw = table.get(g)
            if raw is None:
                continue
            idx = np.nonzero(codes == ui)[0]
            bits = np.frombuffer(raw, dtype=np.uint8)
            out[idx] = test_positions(bits, pos[idx])
        return pd.Series(out)

    return df.withColumn(
        out_col, probe(F.col(group_col).cast("string"), key_column(key_col))
    )
