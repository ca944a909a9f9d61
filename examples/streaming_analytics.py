#!/usr/bin/env python
"""spark-submit entry: the streaming surface as ONE submittable job.

Replays an events parquet through a file streaming source and runs the
three streaming operators this repo ships, each to its own sink:

  - windowed distinct users per hour (Theta state,
    streaming.windowed_distinct_stream)
  - windowed p50/p95 of `value` per hour (KLL state,
    streaming.windowed_quantiles_stream)
  - bounded-state first-seen dedup on user_id (streaming_dedup,
    fast tier, exactly-once output dirs)

    cd /root/repo && zip -qr /tmp/bloomspark.zip bloomspark
    spark-submit --master local[4] --py-files /tmp/bloomspark.zip \\
        examples/streaming_analytics.py \\
        --events /root/testdata/sf0.01/events.parquet --out /tmp/sa_out

Prints one JSON line per operator with its row counts — the audit a
streaming deployment's first smoke run produces.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--window", default="1 hour")
    ap.add_argument("--cores", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .appName("bloomspark-streaming-analytics")
        .config("spark.sql.shuffle.partitions", str(args.cores * 2))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bloomspark import FilterConfig
    from bloomspark.streaming import (
        streaming_dedup,
        windowed_distinct_stream,
        windowed_quantiles_stream,
    )

    os.makedirs(args.out, exist_ok=True)
    src_dir = tempfile.mkdtemp(prefix="bloomspark_sa_")
    os.symlink(os.path.abspath(args.events), os.path.join(src_dir, "events.parquet"))
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )

    def run_to_memory(out_df, name):
        q = (
            out_df.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return spark.table(name)

    stream = spark.readStream.schema(schema).parquet(src_dir)
    distinct = run_to_memory(
        windowed_distinct_stream(
            stream, key_col="user_id", time_col="ts", window=args.window
        ),
        "sa_distinct",
    )
    distinct.write.mode("overwrite").parquet(f"{args.out}/windowed_distinct")
    print(json.dumps({"op": "windowed_distinct", "rows": distinct.count()}), flush=True)

    quantiles = run_to_memory(
        windowed_quantiles_stream(
            stream, value_col="value", time_col="ts", window=args.window,
            quantiles=(0.5, 0.95),
        ),
        "sa_quantiles",
    )
    quantiles.write.mode("overwrite").parquet(f"{args.out}/windowed_quantiles")
    print(json.dumps({"op": "windowed_quantiles", "rows": quantiles.count()}), flush=True)

    cfg = FilterConfig.complete(n=200_000, p=1e-6, hash_method="XXHash64KM")
    dedup_q = streaming_dedup(
        spark.readStream.schema(schema).parquet(src_dir),
        "user_id",
        cfg,
        checkpoint_dir=f"{args.out}/dedup_ck",
        output_dir=f"{args.out}/dedup_out",
        exactly_once_output=True,
    )
    try:
        dedup_q.processAllAvailable()
    finally:
        dedup_q.stop()
    first_seen = spark.read.parquet(f"{args.out}/dedup_out").count()
    print(json.dumps({"op": "streaming_dedup", "first_seen_rows": first_seen}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
