#!/usr/bin/env python
"""Quiet-host re-measurement of a single bench cell in fresh pinned JVMs.

Generalizes scripts/measure_q7.py (the protocol that cleared q6/q12 in
round 5 and q7 in round 6) to any registered cell: each repeat is a
FRESH JVM in its own taskset-pinned subprocess, warm-up excluded,
best-of-3 inside the process; the 1-minute load average is recorded
before each repeat so a co-tenant spike is visible in the artifact.

Usage: python scripts/measure_cell.py CELL [repeats]   (default 3)
Cells: q10_tdigest (t-digest p99 over lineitem prices, the round-6
       noise-suspect), q7_minhash (kept for back-compat with
       measure_q7.py's artifact format).

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


def _session(app: str):
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "24g")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _job_q10(spark):
    # exactly bench.py's q10_tdigest_price lambda
    from bloomspark.sketches import TDigest, build_sketch

    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    n = lineitem.count()
    return (
        lambda: build_sketch(
            lineitem.repartition(CPUS // 2), "l_extendedprice", TDigest(delta=200)
        ).quantile(0.99),
        n,
    )


def _job_q7(spark):
    # exactly bench.py's q7_minhash_lsh_dedup lambda
    from bloomspark.pipeline import minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    return (
        lambda: minhash_lsh_pairs(
            docs.repartition(CPUS // 2), verify_threshold=0.8
        ).count(),
        n,
    )


CELLS = {"q10_tdigest": _job_q10, "q7_minhash": _job_q7}


def worker(cell: str) -> None:
    spark = _session(f"bloomspark-{cell}-remeasure")
    job, n = CELLS[cell](spark)
    job()  # warm-up: python workers, JIT, Arrow buffers — same as bench.py
    best = None
    for _ in range(3):
        t0 = time.time()
        job()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(json.dumps({"sec": round(best, 4), "rows": n}))
    spark.stop()


def main() -> None:
    cell = sys.argv[1]
    if cell not in CELLS:
        sys.exit(f"unknown cell {cell!r}; choose from {sorted(CELLS)}")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    secs = []
    for i in range(reps):
        load1 = os.getloadavg()[0]
        cmd = [sys.executable, os.path.abspath(__file__), "--worker", cell]
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
                "summary": f"{cell} fresh-JVM best-of-3 repeats",
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
        worker(sys.argv[sys.argv.index("--worker") + 1])
    else:
        main()
