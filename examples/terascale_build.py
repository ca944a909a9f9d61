#!/usr/bin/env python
"""spark-submit entry: the north-star build as ONE submittable job.

The composition the 10^12-file recipe runs, demonstrated end to end at
whatever scale the input is:

  read table (Iceberg or parquet via the reader seam)
    -> checkpoint-resumable distributed Bloom build
       (content-addressed buckets, per-bucket lineage + metrics)
    -> per-row invariant check (content sha256 present + distinct)
    -> observed-FPP validation against the configured bound
    -> [--sharded] the never-collected sharded build + durable save

Deployment shape (north rule: "runs via spark-submit --py-files"):

    cd /root/repo && zip -qr /tmp/bloomspark.zip bloomspark
    spark-submit --master local[8] --py-files /tmp/bloomspark.zip \\
        examples/terascale_build.py \\
        --input /root/testdata/sf0.01/lineitem.parquet \\
        --key l_orderkey --p 0.01 --checkpoint /tmp/ts_ck

Prints one JSON line with the build report (rows, wall, throughput,
fill, per-bucket lineage summary, observed FPP) — the metrics contract
of the north rule.  tests/test_submit.py runs exactly this command.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="table path or Iceberg identifier")
    ap.add_argument("--key", required=True, help="key column to build over")
    ap.add_argument("--p", type=float, default=0.01)
    ap.add_argument("--n", type=int, default=None,
                    help="expected distinct keys (skips a count job)")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--num-buckets", type=int, default=16)
    ap.add_argument("--sharded", action="store_true",
                    help="also build + save the never-collected sharded form")
    ap.add_argument("--counting", action="store_true",
                    help="also build + save the sharded COUNTING form "
                         "(frequency estimates past broadcast scale)")
    ap.add_argument("--counting-bits", type=int, default=16)
    ap.add_argument("--num-shards", type=int, default=16)
    ap.add_argument("--fpp-probes", type=int, default=50_000)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("bloomspark-terascale-build").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import os

    from bloomspark import FilterConfig, with_membership
    from bloomspark.checkpoint import build_bloom_checkpointed
    from bloomspark.sources import read_table

    def load_lineage(ck_dir):
        path = os.path.join(ck_dir, "lineage.json")
        if not os.path.exists(path):
            return {}
        with open(path) as f:
            return json.load(f)

    t0 = time.time()
    df = read_table(spark, args.input)
    n = args.n if args.n is not None else df.count()
    cfg = FilterConfig.complete(n=max(n, 1), p=args.p)

    bf = build_bloom_checkpointed(
        df, args.key, cfg, args.checkpoint, num_buckets=args.num_buckets
    )
    wall = time.time() - t0
    lineage = load_lineage(args.checkpoint)

    # observed FPP on a guaranteed-disjoint probe population
    probes = spark.range(args.fpp_probes).select(
        F.concat(F.lit("__fpp_probe__:"), F.col("id").cast("string")).alias("k")
    )
    fps = with_membership(probes, "k", bf).where(F.col("member")).count()

    report = {
        "input": args.input,
        "rows": n,
        "wall_sec": round(wall, 3),
        "rows_per_sec": round(n / wall, 1) if wall > 0 else None,
        "m": cfg.m,
        "k": cfg.k,
        "fill_ratio": round(bf.cardinality() / cfg.m, 6),
        "estimated_population": bf.get_estimated_population(),
        "observed_fpp": fps / args.fpp_probes,
        "configured_p": args.p,
        "buckets": len(lineage.get("buckets", {})) if lineage else args.num_buckets,
        "resumed_buckets": lineage.get("resumed_buckets", []) if lineage else [],
    }

    if args.sharded:
        from bloomspark.sharded import (
            build_sharded_bloom,
            estimated_population_sharded,
            save_sharded,
        )

        shcfg = FilterConfig.complete(
            n=max(n // args.num_shards, 100), p=args.p
        )
        shards = build_sharded_bloom(
            df, args.key, shcfg, num_shards=args.num_shards
        )
        save_sharded(shards, args.checkpoint + "/sharded", shcfg,
                     num_shards=args.num_shards)
        report["sharded"] = {
            "num_shards": args.num_shards,
            "estimated_population": estimated_population_sharded(
                spark.read.parquet(args.checkpoint + "/sharded/shards"), shcfg
            ),
        }

    if args.counting:
        from bloomspark.sharded import (
            build_sharded_counting,
            estimated_population_sharded_counting,
            save_sharded_counting,
        )

        ccfg = FilterConfig.complete(
            n=max(n // args.num_shards, 100), p=args.p,
            counting_bits=args.counting_bits,
        )
        cshards = build_sharded_counting(
            df, args.key, ccfg, num_shards=args.num_shards
        )
        save_sharded_counting(cshards, args.checkpoint + "/sharded_counting",
                              ccfg, num_shards=args.num_shards)
        report["sharded_counting"] = {
            "num_shards": args.num_shards,
            "counting_bits": args.counting_bits,
            "estimated_population": estimated_population_sharded_counting(
                spark.read.parquet(
                    args.checkpoint + "/sharded_counting/shards"
                ),
                ccfg,
            ),
        }

    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
