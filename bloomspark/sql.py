"""SQL-callable surface: register built filters as named Spark SQL
functions, so `spark.sql(...)` queries (BI tools, notebook users, SQL
pipelines) can probe a sketch without touching the DataFrame API.

The reference exposes probes as Java methods (BloomFilter.contains,
CountingBloomFilter.getEstimatedCount); the Spark-native equivalent of
"callable from anywhere" is a registered function.  Registration
broadcasts the filter bytes ONCE (same mechanism as probe.py's UDFs);
every SQL invocation is an Arrow-batched vectorized probe, never
per-row Python.

Keys hash as their string form (build.key_column semantics), and the
registered functions CAST their argument to string internally, so
``seen(o_orderkey)`` works on any column type — matching
``with_membership(df, "o_orderkey", bf)`` bit-for-bit.

The fast tier (fast.py) is deliberately NOT registered here: its
probes are pure Column expression trees (no function call at all) —
use ``with_fast_membership`` or inline the expression; a SQL-named
wrapper would route them through Python and forfeit the tier's point.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

from .counting import CountingBloomFilter, counter_dtype
from .filter import BloomFilter, test_positions
from .hashing import get_hash_fn, keys_from_pandas
from .params import FilterConfig


def _coerce_str(keys: pd.Series) -> pd.Series:
    # SQL callers pass any type; normalize like key_column's
    # cast("string") (ints/bools render as Spark string form).  Float
    # dtypes are REJECTED (round-7 advice): pandas repr ("0.0001",
    # "10000000.0") diverges from the JVM cast's Java Double.toString
    # form ("1.0E-4", "1.0E7") that the build side hashed, which would
    # silently produce false negatives.  Cast to string in SQL
    # (CAST(x AS STRING)) so the JVM renders the key.
    if keys.dtype == object:
        return keys
    if keys.dtype == bool:
        return keys.map({True: "true", False: "false"})
    if pd.api.types.is_float_dtype(keys.dtype):
        raise ValueError(
            "registered bloom SQL functions cannot hash float-typed "
            "arguments bit-faithfully (pandas and Java Double.toString "
            "render them differently); CAST the argument to STRING in "
            "the SQL so the JVM formats it"
        )
    return keys.astype("string").astype(object)


def register_membership(
    spark: SparkSession, name: str, bloom: BloomFilter
) -> None:
    """Register ``name(key) -> boolean``: bulk ``contains`` against a
    snapshot of ``bloom`` (re-register after mutating the filter)."""
    bc = spark.sparkContext.broadcast((bloom.config.to_dict(), bloom.to_bytes()))

    @pandas_udf("boolean")
    def probe(keys: pd.Series) -> pd.Series:
        cfg_dict, raw = bc.value
        cfg = FilterConfig.from_dict(cfg_dict)
        bits = np.frombuffer(raw, dtype=np.uint8)
        kb = keys_from_pandas(_coerce_str(keys))
        pos = get_hash_fn(cfg.hash_method)(kb, cfg.m, cfg.k)
        return pd.Series(test_positions(bits, pos))

    spark.udf.register(name, probe)


def register_estimated_count(
    spark: SparkSession, name: str, cbf: CountingBloomFilter
) -> None:
    """Register ``name(key) -> long``: bulk Minimum-Selection count
    estimates against a snapshot of ``cbf``."""
    bc = spark.sparkContext.broadcast((cbf.config.to_dict(), cbf.to_bytes()))

    @pandas_udf("long")
    def probe(keys: pd.Series) -> pd.Series:
        cfg_dict, raw = bc.value
        cfg = FilterConfig.from_dict(cfg_dict)
        counters = np.frombuffer(raw, dtype=counter_dtype(cfg.counting_bits))
        kb = keys_from_pandas(_coerce_str(keys))
        pos = get_hash_fn(cfg.hash_method)(kb, cfg.m, cfg.k)
        return pd.Series(counters[pos].min(axis=1).astype(np.int64))

    spark.udf.register(name, probe)
