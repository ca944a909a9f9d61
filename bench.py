#!/usr/bin/env python
"""Headline benchmark: distributed Bloom build/probe/count throughput.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ..., "rows_per_sec": ...}``.

Pass ``--scaling`` to additionally run the identical build job at two
parallelism levels — taskset-pinned to N and 4N cores so the small level
cannot borrow idle cores — on the same input, reporting throughput at
both plus scaling efficiency (the sandbox adaptation of the
two-cluster-size criterion, BASELINE.md 'Our target protocol').  Two
pairs are measured: the primary 1->4 (where the box's per-core resources
are not contended) and 2->8 (which additionally measures the shared
DRAM / Arrow-IPC ceiling — quantified stage by stage in BASELINE.md).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BEST_OF = int(os.environ.get("BLOOMSPARK_BENCH_BEST_OF", "3"))


def make_spark(cores: int, app: str = "bloomspark-bench"):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(2 * cores))
        .config("spark.sql.adaptive.enabled", "true")
        # small bench files must still split across all cores
        .config("spark.sql.files.maxPartitionBytes", "2m")
        .config("spark.sql.files.openCostInBytes", "0")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )


def bench_queries(spark, sf_dir: str):
    """Each entry: name -> (seconds, rows_processed)."""
    from pyspark.sql import functions as F

    from bloomspark import (
        FilterConfig,
        build_bloom,
        build_counting,
        with_estimated_count,
        with_membership,
    )
    from bloomspark.grouped import build_bloom_per_group

    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_li = lineitem.count()
    n_ord = orders.count()

    results = {}

    def timed(name, fn, rows, clear=True):
        # best-of-3: the host shows ~2x run-to-run noise (shared box), so
        # single-run BENCH numbers made round-over-round regressions
        # indistinguishable from noise (r2 verdict).  Each repeat starts
        # from a clean Spark cache so persisted intermediates (q7's
        # shingles) don't turn later runs into cache reads — only
        # JVM/worker warmup and the OS page cache carry.  clear=False is
        # for probes whose input is a deliberately persisted build
        # (q14 probes the shard table q13 materialized).
        best = None
        for _ in range(BEST_OF):
            if clear:
                spark.catalog.clearCache()
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        results[name] = (best, rows)

    # the bench parquet files hold a single row group, so an explicit
    # repartition (included in the timing) is required for any parallelism;
    # one task wave (nparts == cores) measured faster than two on this host
    nparts = CPUS
    cfg = FilterConfig.complete(n=n_li, p=0.01)
    # warm-up outside the timings: spawns the full worker pool (one per
    # task slot) + numpy/Arrow JIT, and exercises BOTH Python-UDF runner
    # kinds (mapInArrow partials AND arrow_udf/collect_list pipeline) so
    # no single timed query pays the one-time codegen/runner init
    build_bloom(lineitem.limit(50_000), "l_orderkey", cfg, num_partitions=nparts)
    from bloomspark.pipeline import minhash_lsh_pairs as _warm_mh

    _warm_mh(
        spark.read.parquet(f"{sf_dir}/documents.parquet").limit(500),
        verify_threshold=0.8,
    ).count()
    bf_holder = {}

    timed(
        "q1_bloom_build",
        lambda: bf_holder.__setitem__(
            "bf", build_bloom(lineitem, "l_orderkey", cfg, num_partitions=nparts)
        ),
        n_li,
    )
    bf = bf_holder["bf"]

    timed(
        "q2_bloom_probe",
        lambda: with_membership(orders, "o_orderkey", bf)
        .where(F.col("member"))
        .count(),
        n_ord,
    )

    ccfg = FilterConfig.complete(n=max(n_li // 30, 1000), p=1e-6, counting_bits=16)
    cbf_holder = {}
    timed(
        "q3_counting_build",
        lambda: cbf_holder.__setitem__(
            "c", build_counting(lineitem, "l_partkey", ccfg, num_partitions=nparts)
        ),
        n_li,
    )

    timed(
        "q4_count_probe",
        lambda: with_estimated_count(
            lineitem.select("l_partkey"), "l_partkey", cbf_holder["c"]
        )
        .agg(F.sum("est_count"))
        .collect(),
        n_li,
    )

    gcfg = FilterConfig.complete(n=max(n_ord // 3, 1000), p=0.001)
    timed(
        "q5_grouped_salted_build",
        lambda: build_bloom_per_group(
            orders, "o_orderpriority", "o_orderkey", gcfg, salt_partitions=8
        ).collect(),
        n_ord,
    )

    # sha-keyed build over a composite string key (string-heavy hashing path)
    scfg = FilterConfig.complete(n=n_li, p=0.01)
    timed(
        "q6_sha_key_build",
        lambda: build_bloom(
            lineitem.select(
                F.sha2(
                    F.concat_ws(":", "l_orderkey", "l_linenumber"), 256
                ).alias("sha")
            ),
            "sha",
            scfg,
            num_partitions=nparts,
        ),
        n_li,
    )

    # training-data pipeline queries over documents/embeddings
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_docs = docs.count()

    from bloomspark.pipeline import brute_force_topk, minhash_lsh_pairs

    timed(
        "q7_minhash_lsh_dedup",
        lambda: minhash_lsh_pairs(docs.repartition(nparts // 2), verify_threshold=0.8).count(),
        n_docs,
    )

    # cluster resolution (round-6): LSH pairs -> connected components
    # over 30k synthetic near-dup docs (same generator as the sf1 s6
    # cell).  Pair generation is persisted OUTSIDE the timer — the cell
    # guards the min-label-propagation rounds (join+groupBy per round +
    # the cadenced convergence actions), the new operator of round 5.
    from bloomspark.pipeline import duplicate_clusters

    cdocs = _synthetic_docs(spark, 30_000, nparts)
    cpairs = minhash_lsh_pairs(cdocs, id_col="doc_id", text_col="text",
                               verify_threshold=0.8).persist()
    cpairs.count()
    timed(
        "x19_cluster_resolution",
        lambda: duplicate_clusters(cpairs).count(),
        30_000,
        clear=False,
    )
    cpairs.unpersist()

    qvec = emb.select("embedding").first()[0]
    timed(
        "q8_knn_bruteforce",
        lambda: brute_force_topk(emb, [float(x) for x in qvec], k=10).collect(),
        emb.count(),
    )

    # bucketed kNN join (round-6): the scale-safe LSH composition as an
    # operator — per-table equi-join on hyperplane buckets, codegen
    # cosine inside the join, window rank.  Self-join of the embeddings
    # table (every vector's 5 approximate neighbors); no cartesian
    # (plan-pinned in tests/test_plans.py).
    from bloomspark.pipeline import knn_join_lsh

    n_emb = emb.count()
    timed(
        "x20_knn_join_lsh",
        lambda: knn_join_lsh(emb, emb, k=5, planes=10, tables=2).count(),
        n_emb,
    )

    # sketch tier over the north-rule source-code table shape: 2M
    # synthesized (repo, path, commit, lang, content) rows, HLL on the
    # content sha, t-digest quantiles on lineitem prices
    from bloomspark.sketches import HyperLogLog, TDigest, build_sketch
    from bloomspark.sources import source_code_table

    n_code = 2_000_000
    code = source_code_table(spark, n_code, partitions=nparts).select(
        F.sha2("content", 256).alias("sha")
    )
    timed(
        "q9_hll_code_distinct",
        lambda: build_sketch(code, "sha", HyperLogLog(p=14)).estimate(),
        n_code,
    )
    timed(
        "q10_tdigest_price",
        lambda: build_sketch(
            lineitem.repartition(nparts), "l_extendedprice", TDigest(delta=200)
        ).quantile(0.99),
        n_li,
    )

    # JVM-native fast tier (fast.py): same membership workload as q1/q2
    # but positions/aggregation/probe entirely in whole-stage codegen —
    # the plan the 100-TB path runs, with no Arrow hop to scale-limit
    from bloomspark.fast import build_fast_bloom, with_fast_membership

    fcfg = FilterConfig.complete(n=n_li, p=0.01, hash_method="XXHash64KM")
    fbf_holder = {}
    timed(
        "q11_fast_build",
        lambda: fbf_holder.__setitem__(
            "bf",
            build_fast_bloom(lineitem.repartition(nparts), "l_orderkey", fcfg),
        ),
        n_li,
    )
    timed(
        "q12_fast_probe",
        lambda: with_fast_membership(orders, "o_orderkey", fbf_holder["bf"], fcfg)
        .where(F.col("member"))
        .count(),
        n_ord,
    )

    # sharded tier (sharded.py): the TB-scale never-collected shape —
    # 64 independent shard bitsets built via the salted grouped build,
    # probed by cogroup co-partitioning
    from bloomspark.sharded import build_sharded_bloom, with_sharded_membership

    num_shards = 64
    shcfg = FilterConfig.complete(n=max(n_li // num_shards, 1000), p=0.01)
    shard_holder = {}

    def _sharded_build():
        shards = build_sharded_bloom(
            lineitem.repartition(nparts), "l_orderkey", shcfg, num_shards=num_shards
        ).persist()
        shards.count()  # materialize the build under the timer
        shard_holder["shards"] = shards

    timed("q13_sharded_build", _sharded_build, n_li)
    timed(
        "q14_sharded_probe",
        lambda: with_sharded_membership(
            orders.select("o_orderkey"),
            "o_orderkey",
            shard_holder["shards"],
            shcfg,
            num_shards=num_shards,
        )
        .where(F.col("member"))
        .count(),
        n_ord,
        clear=False,
    )
    shard_holder["shards"].unpersist()

    # sharded COUNTING tier (round-5): same never-collected cogroup
    # shape with counter arrays.  x-prefixed = excluded from the
    # headline total so round-over-round totals stay comparable.
    from bloomspark.sharded import (
        build_sharded_counting,
        with_sharded_estimated_count,
    )

    sccfg = FilterConfig.complete(
        n=max(n_li // num_shards, 100), p=0.01, counting_bits=16
    )
    scount_holder = {}

    def _sharded_counting_build():
        sh = build_sharded_counting(
            lineitem.repartition(nparts), "l_orderkey", sccfg,
            num_shards=num_shards,
        ).persist()
        sh.count()
        scount_holder["shards"] = sh

    timed("x17_sharded_counting_build", _sharded_counting_build, n_li)
    timed(
        "x18_sharded_count_probe",
        lambda: with_sharded_estimated_count(
            orders.select("o_orderkey"),
            "o_orderkey",
            scount_holder["shards"],
            sccfg,
            num_shards=num_shards,
        )
        .agg(F.sum("est_count"))
        .collect(),
        n_ord,
        clear=False,
    )
    scount_holder["shards"].unpersist()

    # IVF ANN (simsearch.py): bounded-sample centroid training is done
    # once outside the timer (the production amortization); the timed
    # probe is assignment + n_probe cell pruning + in-cell brute force
    from bloomspark.pipeline import ivf_assign, ivf_topk, ivf_train_centroids

    cent = ivf_train_centroids(emb, n_centroids=32, sample_rows=5000)
    emb_cells = ivf_assign(emb, cent).persist()
    emb_cells.count()  # materialize assignments outside the probe timer
    timed(
        "q16_ivf_topk",
        lambda: ivf_topk(
            emb_cells, [float(x) for x in qvec], cent, k=10, n_probe=8,
            cell_col="ivf_cell",
        ).collect(),
        emb.count(),
        clear=False,
    )
    emb_cells.unpersist()

    # bloom-pruned exact join (join.py): the 100-TB semi-join-reduction
    # pattern — lineitem pruned by a fast-tier filter of the urgent
    # orders' keys inside the scan stage, then the ordinary exact join
    from bloomspark.join import bloom_prune_join

    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    n_urgent = urgent.count()
    timed(
        "q15_bloom_prune_join",
        lambda: bloom_prune_join(
            lineitem.repartition(nparts),
            urgent,
            ("l_orderkey", "o_orderkey"),
            n_build=n_urgent,
        ).count(),
        n_li,
    )

    # sharded bloom-pruned join (join.py, round 6): the both-sides-huge
    # regime — the build-side filter stays a never-collected (shard,
    # bitset) DataFrame, lineitem co-partitions with it on the shard id
    # in one cogroup, then the ordinary exact join removes false
    # positives.  x-prefixed until it carries two rounds of history.
    from bloomspark.join import sharded_prune_join

    timed(
        "x21_sharded_prune_join",
        lambda: sharded_prune_join(
            lineitem.repartition(nparts),
            urgent,
            ("l_orderkey", "o_orderkey"),
            n_build=n_urgent,
            num_shards=16,
        ).count(),
        n_li,
    )

    # Misra-Gries heavy hitters (sketches/frequent.py, round 6): top-k
    # partkeys WITH identities in one mapInArrow pass + driver merge —
    # estimation mode at sf0.1 (distinct partkeys >> k), the 100-TB
    # configuration.  x-prefixed until it carries two rounds of history.
    from bloomspark.sketches import FrequentItemsSketch, build_sketch

    timed(
        "x22_frequent_topk",
        lambda: build_sketch(
            lineitem.repartition(nparts),
            "l_partkey",
            FrequentItemsSketch(k=2048),
        ).top_k(10),
        n_li,
    )

    # Bloom-index data skipping (sources/skipping.py, round 6): lineitem
    # re-written once (outside the timers) as a 32-file range-clustered
    # lake; x23 times the per-file index build (grouped two-phase,
    # states never driver-resident), x24 the point-lookup path: prune
    # pass over the index -> read ONLY surviving files -> exact residual
    # filter.  The skip ratio is the cell's point — at 100 TB this is
    # the difference between touching 4 files and touching all of them.
    import shutil
    import tempfile

    from bloomspark.sources import build_file_index, pruned_read

    lake_dir = tempfile.mkdtemp(prefix="bloomspark_lake_")
    lake_path = f"{lake_dir}/lineitem"
    (
        lineitem.repartitionByRange(32, "l_orderkey")
        .write.mode("overwrite")
        .parquet(lake_path)
    )
    lake = spark.read.parquet(lake_path)
    # distinct orderkeys per range file ~ (distinct overall)/32
    n_per_file = max(n_li // (4 * 32), 1000)
    icfg = FilterConfig.complete(n=n_per_file, p=1e-4)
    idx_holder = {}
    timed(
        "x23_file_index_build",
        lambda: idx_holder.__setitem__(
            "i", build_file_index(lake, "l_orderkey", icfg).persist()
        )
        or idx_holder["i"].count(),
        n_li,
    )
    probe_keys = [1, n_li // 2, n_li - 1, 7777]
    timed(
        "x24_file_skip_read",
        lambda: pruned_read(
            spark, idx_holder["i"], "l_orderkey", probe_keys, icfg
        ).count(),
        n_li,
        clear=False,
    )
    idx_holder["i"].unpersist()
    shutil.rmtree(lake_dir, ignore_errors=True)

    # Deterministic document packing (pipeline/packing.py, round 6):
    # 600k lineitem rows laid out on 64 hash-bucketed token streams
    # (l_quantity as the token proxy) — times the one hash exchange +
    # per-bucket window running sum that IS the packing layout.
    # x-prefixed until it carries two rounds of history.
    from bloomspark.pipeline import pack_documents

    timed(
        "x25_pack_layout",
        lambda: pack_documents(
            lineitem.repartition(nparts),
            ["l_orderkey", "l_linenumber"],
            "l_quantity",
            budget=8192,
            num_buckets=64,
        ).count(),
        n_li,
    )

    # Windowed distinct-count stream (streaming.windowed_distinct_stream,
    # round 6): the full Structured Streaming path — file source ->
    # applyInPandasWithState Theta-per-window -> memory sink — over the
    # 100k-row events table (720 hourly windows).  Times stateful-
    # operator overhead end-to-end, not just the fold.
    import uuid

    from bloomspark.streaming import windowed_distinct_stream

    def _windowed_stream():
        name = "bench_wd_" + uuid.uuid4().hex[:8]
        src_dir = tempfile.mkdtemp(prefix="bloomspark_wd_bench_")
        os.symlink(
            os.path.join(sf_dir, "events.parquet"),
            os.path.join(src_dir, "events.parquet"),
        )
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        ).parquet(src_dir)
        out = windowed_distinct_stream(
            stream, key_col="user_id", time_col="ts", window="1 hour"
        )
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        n = spark.table(name).count()
        shutil.rmtree(src_dir, ignore_errors=True)
        return n

    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    timed("x26_windowed_distinct_stream", _windowed_stream, n_events)

    return results


def _synthetic_docs(spark, rows: int, partitions: int):
    """Deterministic ~30-word documents with ~5% near-duplicates (id %
    20 == 19 copies the previous doc's words plus one extra word ->
     3-shingle jaccard ~0.81, above the 0.8 dedup threshold).  Pure
    Spark expressions: generation is codegen-fast and identical across
    runs and parallelism levels."""
    from pyspark.sql import functions as F

    df = spark.range(0, rows, 1, partitions)
    i = F.col("id")
    j = F.when(i % 20 == 19, i - 1).otherwise(i)
    words = F.transform(
        F.sequence(F.lit(0), F.lit(29)),
        lambda p: F.substring(
            F.sha2(
                F.concat(
                    F.lit("w"), F.pmod(F.xxhash64(j, p), F.lit(997)).cast("string")
                ),
                256,
            ),
            1,
            6,
        ),
    )
    text = F.concat(
        F.array_join(words, " "),
        F.when(i % 20 == 19, F.lit(" zz9x")).otherwise(F.lit("")),
    )
    return df.select(i.alias("doc_id"), text.alias("text"))


def _synthetic_embeddings(spark, rows: int, dim: int, partitions: int):
    """Deterministic pseudo-random unit-cube embeddings from xxhash64 of
    (id, component) — content depends only on ids, never on RNG state."""
    from pyspark.sql import functions as F

    return spark.range(0, rows, 1, partitions).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda jj: (
                (F.pmod(F.xxhash64(F.col("id"), jj), F.lit(2001)) - 1000) / 1000.0
            ),
        ).cast("array<float>").alias("embedding"),
    )


def bench_sf1_queries(spark):
    """The six scale-tier queries one order of magnitude above sf0.1
    (round-3 verdict item 6): 6M-key membership workloads, 50k-doc
    minhash, 20k-vector IVF and a 4-batch streaming dedup — where
    constant factors (worker spawn, JVM warmup, broadcast setup) stop
    dominating and regressions in the scaling-relevant code paths show.
    Inputs are synthesized deterministically with pure Spark expressions
    (TESTDATA.md ships no sf1 parquet); single-run timings (the signal
    at these sizes is several times the host noise floor)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from bloomspark import FilterConfig
    from bloomspark.fast import build_fast_bloom, with_fast_membership
    from bloomspark.join import bloom_prune_join
    from bloomspark.pipeline import (
        ivf_assign,
        ivf_topk,
        ivf_train_centroids,
        minhash_lsh_pairs,
    )
    from bloomspark.sharded import build_sharded_bloom, with_sharded_membership
    from bloomspark.streaming import _make_dedup_batch_processor

    nparts = CPUS
    n_fact, n_probe = 6_000_000, 1_500_000
    results = {}

    def timed(name, fn):
        spark.catalog.clearCache()
        t0 = time.time()
        fn()
        results[name] = round(time.time() - t0, 4)

    fact = spark.range(0, n_fact, 1, nparts).select(
        F.sha2(F.col("id").cast("string"), 256).alias("sha"),
        F.pmod(F.col("id"), F.lit(n_fact // 4)).alias("fkey"),
        (F.col("id") % 100).alias("val"),
    )
    probes = spark.range(0, 2 * n_probe, 2, nparts).select(
        F.sha2(F.col("id").cast("string"), 256).alias("sha")
    )

    # warm-up outside the timings (same rationale as the sf0.1 block):
    # JVM codegen + the Python worker pool both spawn here, not under s1
    from bloomspark import build_bloom as _warm_build

    warm = spark.range(0, 200_000, 1, nparts).select(
        F.sha2(F.col("id").cast("string"), 256).alias("sha")
    )
    wcfg = FilterConfig.complete(n=200_000, p=0.01, hash_method="XXHash64KM")
    build_fast_bloom(warm, "sha", wcfg)
    _warm_build(warm, "sha", wcfg)

    fcfg = FilterConfig.complete(n=n_fact, p=0.01, hash_method="XXHash64KM")
    holder = {}
    timed("s1_fast_build_6m", lambda: holder.__setitem__(
        "bf", build_fast_bloom(fact, "sha", fcfg)))
    timed("s2_fast_probe_1m5", lambda: with_fast_membership(
        probes, "sha", holder["bf"], fcfg).where("member").count())

    num_shards = 64
    shcfg = FilterConfig.complete(n=n_fact // num_shards, p=0.01)

    def _shard_build():
        shards = build_sharded_bloom(
            fact, "sha", shcfg, num_shards=num_shards
        ).persist()
        shards.count()
        holder["shards"] = shards

    timed("s3_sharded_build_6m", _shard_build)
    timed("s4_sharded_probe_1m5", lambda: with_sharded_membership(
        probes, "sha", holder["shards"], shcfg, num_shards=num_shards
    ).where("member").count())
    holder["shards"].unpersist()

    dim = spark.range(0, n_fact // 4, 20, nparts // 2).select(
        F.col("id").alias("dkey"), (F.col("id") % 7).alias("dval")
    )
    timed("s5_prune_join_6m", lambda: bloom_prune_join(
        fact, dim, ("fkey", "dkey"), p=0.01, n_build=n_fact // 80
    ).count())

    docs = _synthetic_docs(spark, 30_000, nparts)
    timed("s6_minhash_lsh_30k", lambda: minhash_lsh_pairs(
        docs, verify_threshold=0.8).count())

    emb = _synthetic_embeddings(spark, 20_000, 64, nparts)
    cent = ivf_train_centroids(emb, n_centroids=32, sample_rows=5000)
    cells = ivf_assign(emb, cent).persist()
    cells.count()
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    timed("s7_ivf_topk_20k", lambda: ivf_topk(
        cells, qvec, cent, k=10, n_probe=8, cell_col="ivf_cell").collect())
    cells.unpersist()

    dcfg = FilterConfig.complete(n=2_000_000, p=0.01, hash_method="XXHash64KM")
    tmp = tempfile.mkdtemp(prefix="bloomspark_s8_")
    try:
        proc = _make_dedup_batch_processor(
            "sha", dcfg, os.path.join(tmp, "ck"), os.path.join(tmp, "out")
        )

        def _stream():
            # 3 batches x 500k keys, 50% overlap with the previous batch
            for b in range(3):
                batch = spark.range(
                    b * 250_000, b * 250_000 + 500_000, 1, nparts
                ).select(F.sha2(F.col("id").cast("string"), 256).alias("sha"))
                proc(batch, b)

        timed("s8_streaming_dedup_1m5", _stream)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    return results


SCALING_ROWS = int(os.environ.get("BLOOMSPARK_SCALING_ROWS", "20000000"))
#: Hash method for the scaling job.  The default KM hash is so cheap that
#: the job is memory-bandwidth-bound and cannot scale past ~8 cores on
#: this host; the chained Murmur3 method (~k sequential evaluations per
#: key, HashProvider.java:156-158) is compute-dense and scales.
SCALING_METHOD = os.environ.get("BLOOMSPARK_SCALING_METHOD", "Murmur3")


def scaling_worker(cores: int, mode: str = "python") -> None:
    """One scaling measurement in a fresh JVM: the identical CPU-bound
    build job, varying only the core count (same rows, same partitions).
    ``mode='python'`` is the parity-tier build (mapInArrow partials,
    chained-Murmur3 hashing); ``mode='native'`` is the fast tier
    (fast.py) — the same 20M-key membership build with ZERO Python
    workers, isolating whether the 2->8 ceiling is the Arrow hop
    (native scales) or shared DRAM (native hits it too);
    ``mode='sharded'`` is the never-collected tier (sharded.py) — the
    same keys into 16 per-shard bitsets through the salted (shard,
    salt) shuffle + cogroup merge, the DataFrame-resident shape a
    100-TB filter actually runs, with nothing driver-resident to
    serialize scaling.  Prints one JSON line consumed by run_scaling."""
    from pyspark.sql import SparkSession, functions as F

    from bloomspark import FilterConfig, build_bloom
    from bloomspark.fast import build_fast_bloom
    from bloomspark.sharded import build_sharded_bloom

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"bloomspark-scaling-{cores}")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    nparts = 64  # fixed across levels; >= 2 tasks/core at the big level
    method = "XXHash64KM" if mode == "native" else SCALING_METHOD
    if mode == "sharded":
        num_shards = 16
        cfg = FilterConfig.complete(
            n=SCALING_ROWS // num_shards, p=0.01, hash_method=method
        )

        def build_fn(df):
            sh = build_sharded_bloom(df, "sha", cfg, num_shards=num_shards)
            # materialize the whole distributed build under the timer;
            # summed ones doubles as the cross-level identity check
            return int(sh.agg(F.sum("ones")).collect()[0][0])

    else:
        cfg = FilterConfig.complete(n=SCALING_ROWS, p=0.01, hash_method=method)
        build_fn = (
            (lambda df: build_fast_bloom(df, "sha", cfg))
            if mode == "native"
            else (lambda df: build_bloom(df, "sha", cfg, tree_merge_groups=8))
        )
    keys = spark.range(0, SCALING_ROWS, 1, nparts).select(
        F.sha2(F.col("id").cast("string"), 256).alias("sha")
    )
    # warm-up excluded from the measurement: spawns every Python worker
    # (same partition count as the measured job), JIT, Arrow buffers
    warm = spark.range(0, 1_000_000, 1, nparts).select(
        F.sha2(F.col("id").cast("string"), 256).alias("sha")
    )
    build_fn(warm)
    # best-of-3: the sandbox host shows ~2x run-to-run noise, so a single
    # timing is meaningless; the minimum is the least-noisy estimate
    best = None
    bf = None
    for _ in range(3):
        t0 = time.time()
        bf = build_fn(keys)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    ones = bf if isinstance(bf, int) else bf.cardinality()
    print(
        json.dumps(
            {"cores": cores, "sec": best, "rows_per_sec": SCALING_ROWS / best,
             "ones": ones}
        )
    )
    spark.stop()


def run_scaling(n_small: int, n_big: int, mode: str = "python"):
    """Launch the identical job at two parallelism levels, each in its own
    process (fresh JVM — the sandbox stand-in for two cluster sizes)."""
    import subprocess

    import shutil

    out = {}
    for cores in (n_small, n_big):
        cmd = [sys.executable, os.path.abspath(__file__), "--scaling-worker",
               str(cores), mode]
        # pin the whole process tree (JVM + Python workers) to exactly
        # `cores` CPUs — without this, local[N] threads spill onto every
        # core of the box and the "small cluster" measurement is a lie
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        proc = subprocess.run(
            cmd,
            capture_output=True,
            text=True,
            timeout=1200,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        out[cores] = json.loads(line)
    assert out[n_small]["ones"] == out[n_big]["ones"], "results must be identical"
    eff = out[n_big]["rows_per_sec"] / (
        (n_big / n_small) * out[n_small]["rows_per_sec"]
    )
    return {
        "rows": SCALING_ROWS,
        "cores_small": n_small,
        "cores_big": n_big,
        "sec_small": round(out[n_small]["sec"], 2),
        "sec_big": round(out[n_big]["sec"], 2),
        "throughput_small": round(out[n_small]["rows_per_sec"], 1),
        "throughput_big": round(out[n_big]["rows_per_sec"], 1),
        "scaling_efficiency": round(eff, 4),
    }


def _steal_jiffies() -> int:
    """Hypervisor steal-time counter (field 8 of /proc/stat cpu): this
    shared host takes multi-second steal BURSTS that can inflate any
    single cell 10-20x (BASELINE.md round-6 root cause), so every bench
    payload records the steal consumed ACROSS its own run as the noise
    covariate.  0 where unavailable."""
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:
        return 0


def main():
    sf_match = re.search(r"sf([\d.]+)", SF_DIR)
    sf = float(sf_match.group(1).rstrip(".")) if sf_match else -1.0
    steal0 = _steal_jiffies()

    spark = make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    results = bench_queries(spark, SF_DIR)
    spark.stop()

    queries = {name: round(sec, 4) for name, (sec, _) in results.items()}
    # x-prefixed queries are additive tier coverage (round-5+): reported
    # per-query but excluded from the headline total, which stays the
    # same 16-query sum every prior round's BENCH_r*.json recorded
    total = sum(v for k, v in queries.items() if not k.startswith("x"))
    build_sec, build_rows = results["q1_bloom_build"]
    payload = {
        "metric": "bloom build+probe+count suite wall time",
        "value": round(total, 4),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "best_of": BEST_OF,
        "build_rows_per_sec": round(build_rows / build_sec, 1),
        # the full-suite total including the x-prefixed tier cells; once
        # x17/x18 carry two rounds of history (after round 6) the
        # headline `value` promotes to this sum (BASELINE.md round-6)
        "total_incl_x": round(sum(queries.values()), 4),
    }

    run_sf1 = os.environ.get("BLOOMSPARK_BENCH_SF1", "1") != "0"
    if "--no-sf1" in sys.argv:
        run_sf1 = False
    if "--sf1" in sys.argv:
        run_sf1 = True
    if run_sf1:
        # scale-tier queries one order of magnitude up (6M rows,
        # deterministic synthetic inputs) — see bench_sf1_queries
        spark1 = make_spark(CPUS, app="bloomspark-bench-sf1")
        spark1.sparkContext.setLogLevel("ERROR")
        s_queries = bench_sf1_queries(spark1)
        spark1.stop()
        payload["sf1"] = {
            "queries": s_queries,
            "value": round(sum(s_queries.values()), 4),
            "rows_fact": 6_000_000,
            "best_of": 1,
        }

    if "--scaling" in sys.argv:
        # primary criterion: N=1 -> 4N=4 pinned cores (the pair where the
        # shared box actually scales its resources with the core count);
        # the 2->8 pair is reported alongside with the contention analysis
        # (BASELINE.md): at 8 pinned cores the JVM<->Python Arrow IPC
        # path contends for the same fixed DRAM/kernel resources, which a
        # real N->4N cluster (memory channels and NICs scale WITH nodes)
        # does not suffer.
        payload["scaling"] = run_scaling(1, 4)
        payload["scaling_2_8"] = run_scaling(2, 8)
        # the fast tier's legs: no Python worker anywhere, so any
        # remaining 2->8 shortfall is the box's shared-DRAM ceiling,
        # not the Arrow hop (round-2 verdict item 7)
        payload["scaling_fast"] = run_scaling(1, 4, mode="native")
        payload["scaling_fast_2_8"] = run_scaling(2, 8, mode="native")
        # the never-collected tier's legs: the same build THROUGH the
        # salted (shard, salt) shuffle + per-shard merge — the shape a
        # 100-TB filter actually runs (round-5)
        payload["scaling_sharded"] = run_scaling(1, 4, mode="sharded")
        payload["scaling_sharded_2_8"] = run_scaling(2, 8, mode="sharded")

    payload["steal_jiffies"] = _steal_jiffies() - steal0
    print(json.dumps(payload))


if __name__ == "__main__":
    if "--scaling-worker" in sys.argv:
        i = sys.argv.index("--scaling-worker")
        cores = int(sys.argv[i + 1])
        mode = sys.argv[i + 2] if len(sys.argv) > i + 2 else "python"
        scaling_worker(cores, mode)
    else:
        main()
