#!/usr/bin/env python
"""spark-submit entry: the training-data pipeline composed end to end.

The beyond-reference layer as ONE submittable job over a documents
table — the shape a 100 TB corpus-preparation run takes, demonstrated
at whatever scale the input is:

  read documents parquet
    -> text quality + language ID (codegen expressions)
    -> exact dedup on the rolling-hash fingerprint
    -> near-dedup via MinHash+LSH, clusters resolved to representatives
    -> deterministic train/val/test split (leak-free under growth)
    -> corpus mixing by source at target proportions (mix_corpora)
    -> pack the train split into fixed-token context windows
       (pack_documents, concat-then-chunk)

Every stage is deterministic (hash-derived randomness only), so the
whole pipeline is retry-safe and reproducible run-to-run.

    cd /root/repo && zip -qr /tmp/bloomspark.zip bloomspark
    spark-submit --master local[8] --py-files /tmp/bloomspark.zip \\
        examples/training_pipeline.py \\
        --input /root/testdata/sf0.01/documents.parquet \\
        --budget 4096 --out /tmp/corpus_out

Prints one JSON line per stage with row counts and wall time, then a
final summary line — the audit trail a data-prep job leaves behind.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# running from a checkout without --py-files: make the repo importable
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--budget", type=int, default=4096)
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--out", default=None, help="optional parquet output dir")
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .appName("bloomspark-training-pipeline")
        .config("spark.sql.shuffle.partitions", str(args.cores * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql.window import Window

    from bloomspark.pipeline import (
        dedup_keep_representatives,
        duplicate_clusters,
        mix_corpora,
        minhash_lsh_pairs,
        pack_documents,
        pack_stats,
        with_fingerprint,
        with_language_id,
        with_quality,
        with_split,
    )

    t0 = time.time()

    def stage(name, df):
        n = df.count()
        print(json.dumps({"stage": name, "rows": n, "t": round(time.time() - t0, 2)}), flush=True)
        return df

    docs = stage("read", spark.read.parquet(args.input))

    # 1. quality + language gates (pure codegen; filters push into scan)
    scored = with_language_id(with_quality(docs))
    kept = stage(
        "quality_gate",
        scored.where(F.col("quality_score") >= args.min_quality).persist(),
    )

    # 2. exact dedup on the normalized rolling-hash fingerprint
    fp = with_fingerprint(kept)
    exact = stage(
        "exact_dedup",
        fp.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("fingerprint").orderBy("doc_id")
            ),
        )
        .where(F.col("__rn") == 1)
        .drop("__rn")
        .persist(),
    )

    # 3. near-dedup: LSH candidate pairs -> connected components ->
    #    keep one representative per cluster
    pairs = minhash_lsh_pairs(exact, text_col="text", id_col="doc_id")
    clusters = duplicate_clusters(pairs)
    deduped = stage(
        "near_dedup",
        dedup_keep_representatives(exact, clusters, id_col="doc_id").persist(),
    )

    # 4. leak-free split
    split = stage("split", with_split(deduped, ["doc_id"]))

    # 5. mix sources at target proportions (equal weights over the
    #    sources present; sizes from one aggregation, not per-source
    #    count actions)
    sizes = {
        r["source"]: r["n"]
        for r in split.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    weights = {s: 1.0 / len(sizes) for s in sizes}
    # float-sum guard: make the weights sum to exactly 1.0
    first = next(iter(weights))
    weights[first] += 1.0 - sum(weights.values())
    train = split.where(F.col("split") == "train")
    mixed = stage(
        "mix",
        mix_corpora(
            {s: train.where(F.col("source") == s) for s in sizes},
            ["doc_id"],
            weights,
            sizes=sizes,
        ),
    )

    # 6. pack the train mixture into fixed-token context windows
    packed = pack_documents(
        mixed, ["doc_id", "corpus", "epoch"], "n_chars", budget=args.budget
    )
    stage("pack", packed)
    fills = pack_stats(packed, "n_chars")
    summary = fills.agg(
        F.count("*").alias("packs"),
        F.avg("n_tokens").alias("avg_fill"),
        F.avg("n_docs").alias("avg_docs"),
    ).collect()[0]

    if args.out:
        packed.write.mode("overwrite").parquet(args.out)

    print(
        json.dumps(
            {
                "metric": "training pipeline end-to-end",
                "packs": summary["packs"],
                "avg_fill_tokens": round(summary["avg_fill"], 1),
                "avg_docs_per_pack": round(summary["avg_docs"], 2),
                "budget": args.budget,
                "wall_s": round(time.time() - t0, 2),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
