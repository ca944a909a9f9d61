#!/usr/bin/env python
"""Quiet-host re-measurement of the q7_minhash_lsh_dedup bench cell
(round-5 verdict item 2: 1.90 -> 2.07 -> 3.12 s across three artifacts
on an UNCHANGED code path — three monotone readings deserve a dedicated
measurement rather than a third "probably noise").

Protocol = exactly what cleared q6/q12 in round 5: each repeat is a
FRESH JVM in its own subprocess, taskset-pinned to the bench core set,
warm-up excluded, best-of-3 inside the process; 1-minute load average
recorded before each repeat so a co-tenant spike is visible in the
artifact.  Prints one JSON line per repeat + a summary line.

Usage: python scripts/measure_q7.py [repeats]    (default 3)
Do NOT run any other Spark job while this runs (CLAUDE.md invariant).
"""

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def worker() -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    from bloomspark.pipeline import minhash_lsh_pairs

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bloomspark-q7-remeasure")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "24g")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    job = lambda: minhash_lsh_pairs(  # noqa: E731 — the exact q7 lambda
        docs.repartition(CPUS // 2), verify_threshold=0.8
    ).count()
    job()  # warm-up: python workers, JIT, Arrow buffers — same as bench.py
    best, pairs = None, None
    for _ in range(3):
        t0 = time.time()
        pairs = job()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(json.dumps({"sec": round(best, 4), "pairs": pairs, "n_docs": n_docs}))
    spark.stop()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    secs = []
    for i in range(reps):
        load1 = os.getloadavg()[0]
        cmd = [sys.executable, os.path.abspath(__file__), "--worker"]
        import shutil

        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{CPUS - 1}"] + cmd
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=900)
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        r.update(repeat=i + 1, load1_before=round(load1, 2))
        secs.append(r["sec"])
        print(json.dumps(r), flush=True)
    print(
        json.dumps(
            {
                "summary": "q7_minhash_lsh_dedup fresh-JVM best-of-3 repeats",
                "repeats": reps,
                "secs": secs,
                "median": round(statistics.median(secs), 4),
                "min": min(secs),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker()
    else:
        main()
