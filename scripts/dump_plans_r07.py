#!/usr/bin/env python
"""Dump .explain('formatted') plans for the round-7-touched bench/query
operators into plans/r07/<name>_<tag>.txt.

Usage: python scripts/dump_plans_r07.py TAG OUTDIR [REPO_PATH]
TAG is 'before' (run with REPO_PATH = a round-start worktree) or
'after' (current tree).  Planning only — no jobs run except the tiny
builds whose driver-held filters the probe plans need.
"""

import os
import sys

TAG = sys.argv[1]
OUTDIR = sys.argv[2]
REPO = sys.argv[3] if len(sys.argv) > 3 else os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))
)
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.1"
CPUS = 32


def main():
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName(f"plans-r07-{TAG}")
        .config("spark.sql.shuffle.partitions", str(2 * CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "2m")
        .config("spark.sql.files.openCostInBytes", "0")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUTDIR, exist_ok=True)

    from bloomspark import (
        FilterConfig,
        build_bloom,
        build_counting,
        with_estimated_count,
        with_membership,
    )
    from bloomspark.build import build_partials
    from bloomspark.grouped import build_bloom_per_group
    from bloomspark.join import sharded_prune_join
    from bloomspark.pipeline import knn_join_lsh
    from bloomspark.sharded import (
        build_sharded_bloom,
        build_sharded_counting,
        with_sharded_estimated_count,
        with_sharded_membership,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_li = 600_572

    def dump(name, df):
        p = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUTDIR, f"{name}_{TAG}.txt")
        with open(path, "w") as f:
            f.write(p)
        print("wrote", path)

    cfg = FilterConfig.complete(n=n_li, p=0.01)
    # q1: the partial-build DataFrame including the internal repartition
    try:
        from bloomspark.build import spread_repartition

        q1_src = spread_repartition(li, CPUS, "l_orderkey")
    except ImportError:  # round-start tree: round-robin repartition
        q1_src = li.repartition(CPUS)
    dump("q1_bloom_build_partials", build_partials(q1_src, "l_orderkey", cfg))

    # q5: grouped salted build
    gcfg = FilterConfig.complete(n=max(1_500_000 // 3, 1000), p=0.001)
    dump(
        "q5_grouped_build",
        build_bloom_per_group(
            orders, "o_orderpriority", "o_orderkey", gcfg, salt_partitions=8
        ),
    )

    # q13/x17: sharded builds
    shcfg = FilterConfig.complete(n=max(n_li // 64, 1000), p=0.01)
    shards_plan = build_sharded_bloom(
        li.repartition(CPUS), "l_orderkey", shcfg, num_shards=64
    )
    dump("q13_sharded_build", shards_plan)
    sccfg = FilterConfig.complete(n=max(n_li // 64, 100), p=0.01, counting_bits=16)
    dump(
        "x17_sharded_counting_build",
        build_sharded_counting(
            li.repartition(CPUS), "l_orderkey", sccfg, num_shards=64
        ),
    )

    # q14/x18: cogroup probes (against the build plans; never executed)
    dump(
        "q14_sharded_probe",
        with_sharded_membership(
            orders.select("o_orderkey"), "o_orderkey", shards_plan, shcfg,
            num_shards=64,
        ),
    )
    dump(
        "x18_sharded_count_probe",
        with_sharded_estimated_count(
            orders.select("o_orderkey"),
            "o_orderkey",
            build_sharded_counting(
                li.repartition(CPUS), "l_orderkey", sccfg, num_shards=64
            ),
            sccfg,
            num_shards=64,
        ),
    )

    # q2/q4: driver-filter probes (need small real builds)
    small_cfg = FilterConfig.complete(n=20_000, p=0.01)
    bf = build_bloom(li.limit(20_000), "l_orderkey", small_cfg, num_partitions=8)
    dump(
        "q2_bloom_probe",
        with_membership(orders, "o_orderkey", bf).where(F.col("member")),
    )
    ccfg = FilterConfig.complete(n=20_000, p=1e-6, counting_bits=16)
    cbf = build_counting(li.limit(20_000), "l_partkey", ccfg, num_partitions=8)
    dump(
        "q4_count_probe",
        with_estimated_count(li.select("l_partkey"), "l_partkey", cbf),
    )

    # x20: knn join
    dump("x20_knn_join_lsh", knn_join_lsh(emb, emb, k=5, planes=10, tables=2))

    # x21: sharded prune join
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    dump(
        "x21_sharded_prune_join",
        sharded_prune_join(
            li.repartition(CPUS), urgent, ("l_orderkey", "o_orderkey"),
            n_build=15_000, num_shards=16,
        ),
    )

    spark.stop()


if __name__ == "__main__":
    main()
