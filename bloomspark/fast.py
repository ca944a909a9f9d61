"""JVM-native fast-mode membership tier: Bloom build + probe with zero
Python in the hot path.

Why this exists: every parity-tier build/probe crosses the JVM<->Python
Arrow boundary once per batch, and that hop is this repo's measured
scaling limiter (BASELINE.md "stage-by-stage": a no-op mapInArrow pass
scales only 2.9x from 2->8 pinned cores while the pure-JVM scan scales
3.73x).  Java-bit-parity genuinely requires Python hashing — but a user
who just wants "has this key been seen?" over 100 TB does not need
parity, they need the whole pipeline inside whole-stage codegen.  This
tier computes positions as native Spark long expressions
(``F.xxhash64``), aggregates bits with a native ``bit_or`` hash
aggregate, and probes with broadcast hash joins — scan to answer, no
Python worker anywhere.  (No reference file to cite: the reference is
single-node; the design target is the repo's own measurement.)

The hash scheme ("XXHash64KM") is Kirsch-Mitzenmacher double hashing
over Spark's xxhash64:

    h1 = xxhash64(key)                       -- seed 42, UTF-8 bytes
    h2 = xxhash64(key, lit(FAST_SEED2))      -- = XXH64.hashLong(C, h1)
    pos_i = pmod(pmod(h1, m) + i * pmod(h2|1, m), m)

reduced mod m BEFORE the multiply so every intermediate fits a Spark
long under ANSI arithmetic.  ``bloomspark.hashing.positions_xxh64km``
is the bit-identical numpy replica (registered as a normal hash
method), so fast-built filters are ordinary :class:`BloomFilter`
objects: driver ``contains``, union/intersect, JSON serde, checkpoint
and the broadcast pandas probe all work on them unchanged — and a
filter built by the parity-tier ``build_bloom`` with
``hash_method="XXHash64KM"`` is byte-identical to the native build
(asserted in tests/test_fast.py).

Plan shapes (pinned in tests/test_plans.py):

- **build**: scan -> project (hash exprs) -> explode(k) -> partial
  hash-agg -> exchange(word) -> final hash-agg.  Map-side combine caps
  each partition's shuffle output at its distinct words (<= m/64 rows),
  independent of row count — the 100-TB property.
- **probe**: scan -> project -> k broadcast hash joins against the ONE
  shared nonzero-words table -> project.  No shuffle, no Python; the
  words table is broadcast once (16 B/word, fill-bounded).

Scale limits: the collected form needs m/8 driver bytes (same as any
single filter); past that, keep the filter AS the words DataFrame
(``fast_bloom_words``) or go to the sharded tier (sharded.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .filter import BloomFilter
from .hashing import FAST_SEED2
from .params import FilterConfig

FAST_HASH_METHOD = "XXHash64KM"

WORDS_SCHEMA = "word long, bits long"


def _require_fast(config: FilterConfig) -> None:
    if config.hash_method != FAST_HASH_METHOD:
        raise ValueError(
            f"fast tier requires hash_method={FAST_HASH_METHOD!r} "
            f"(got {config.hash_method!r}); parity-tier methods cannot be "
            "computed JVM-side"
        )


def _fast_key(col: str) -> Column:
    # nulls hash as the empty string, matching Keys.from_arrow's
    # fill_null on the Python side
    return F.coalesce(F.col(col).cast("string"), F.lit(""))


def fast_hash_cols(col: str, config: FilterConfig):
    """(a, b) = (pmod(h1, m), pmod(h2|1, m)) as native long Columns."""
    key = _fast_key(col)
    mm = F.lit(config.m)
    a = F.pmod(F.xxhash64(key), mm)
    b = F.pmod(F.xxhash64(key, F.lit(FAST_SEED2)).bitwiseOR(F.lit(1)), mm)
    return a, b


def fast_position_cols(col: str, config: FilterConfig):
    """The k bit positions as native long Columns (the JVM twin of
    hashing.positions_xxh64km)."""
    a, b = fast_hash_cols(col, config)
    mm = F.lit(config.m)
    return [F.pmod(a + F.lit(i) * b, mm) for i in range(config.k)]


def fast_bloom_words(df: DataFrame, col: str, config: FilterConfig) -> DataFrame:
    """The filter as a distributed (word, bits) DataFrame — 64-bit words
    of the bitset, only nonzero words present, little-endian bit order
    (word w bit j = global bit 64*w + j, identical byte layout to
    BloomFilter.to_bytes).  Entirely native: explode + bit_or hash
    aggregate, nothing ever leaves the JVM."""
    _require_fast(config)
    pos = F.explode(F.array(*fast_position_cols(col, config))).alias("pos")
    return (
        df.select(pos)
        .selectExpr(
            "pos div 64 AS word",
            "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)) AS mask",
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def build_fast_bloom(df: DataFrame, col: str, config: FilterConfig) -> BloomFilter:
    """Native build collected into an ordinary :class:`BloomFilter`.

    The driver receives at most m/64 (word, bits) rows — the dense
    bitset's own size in a sparse dress — via one Arrow ``toPandas``.
    For filters too big to collect, keep :func:`fast_bloom_words`
    distributed or shard (sharded.py)."""
    _require_fast(config)
    if config.extended:
        raise ValueError(
            "extended-m fast filters cannot be collected to one driver "
            "bitset; keep fast_bloom_words distributed or use sharded.py"
        )
    pdf = fast_bloom_words(df, col, config).toPandas()
    n_words = (config.m + 63) // 64
    arr = np.zeros(n_words, dtype=np.uint64)
    if len(pdf):
        arr[pdf["word"].to_numpy(dtype=np.int64)] = (
            pdf["bits"].to_numpy(dtype=np.int64).view(np.uint64)
        )
    bits = np.frombuffer(arr.tobytes(), dtype=np.uint8)[: config.num_bytes].copy()
    return BloomFilter(config, bits)


def words_from_bloom(spark: SparkSession, bloom: BloomFilter) -> DataFrame:
    """A BloomFilter's nonzero 64-bit words as a (word, bits) DataFrame
    — lets any XXHash64KM filter (fast-built, parity-built, restored
    from JSON/checkpoint) feed the native probe."""
    _require_fast(bloom.config)
    raw = bloom.to_bytes()
    pad = (-len(raw)) % 8
    arr = np.frombuffer(raw + b"\x00" * pad, dtype=np.uint64)
    nz = np.nonzero(arr)[0]
    pdf = pd.DataFrame(
        {"word": nz.astype(np.int64), "bits": arr[nz].view(np.int64)}
    )
    return spark.createDataFrame(pdf, schema=WORDS_SCHEMA)


def with_fast_membership(
    df: DataFrame,
    col: str,
    words: DataFrame | BloomFilter,
    config: FilterConfig,
    *,
    out_col: str = "member",
) -> DataFrame:
    """Append a boolean membership column with a 100% JVM plan.

    Each of the k positions is tested by a broadcast hash join of its
    64-bit word index against the shared nonzero-words table, then a
    native shift/mask; a missing word (left-join null) is a 0 word.
    The plan is scan -> k codegen'd broadcast joins -> project: no
    shuffle, no Python worker, no per-row bitset traffic.  ``words``
    may be the distributed table from :func:`fast_bloom_words` or any
    XXHash64KM :class:`BloomFilter`."""
    _require_fast(config)
    if isinstance(words, BloomFilter):
        if not words.config.is_compatible_to(config):
            raise ValueError("filter is not compatible with the probe config")
        words = words_from_bloom(df.sparkSession, words)
    wtab = words.select("word", "bits")
    a, b = fast_hash_cols(col, config)
    out = df.withColumn("__fa", a).withColumn("__fb", b)
    temp = ["__fa", "__fb"]
    tests = []
    for i in range(config.k):
        p, w, bi = f"__fp{i}", f"__fw{i}", f"__fbits{i}"
        out = out.withColumn(
            p, F.pmod(F.col("__fa") + F.lit(i) * F.col("__fb"), F.lit(config.m))
        ).withColumn(w, F.expr(f"{p} div 64"))
        out = out.join(
            F.broadcast(
                wtab.select(F.col("word").alias(w), F.col("bits").alias(bi))
            ),
            w,
            "left",
        )
        tests.append(
            F.coalesce(
                F.expr(f"(shiftright({bi}, CAST({p} % 64 AS INT)) & 1) = 1"),
                F.lit(False),
            )
        )
        temp += [p, w, bi]
    member = tests[0]
    for t in tests[1:]:
        member = member & t
    return out.withColumn(out_col, member).drop(*temp)
