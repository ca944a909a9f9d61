#!/usr/bin/env python
"""Measure the two fast-probe strategies (round-4 verdict item 3).

The k-join blocked probe broadcasts the blocked filter up to k times per
executor (Catalyst does not reuse the exchange across the k self-joins);
the exploded single-join probe broadcasts it once but pays an
explode(k) + groupBy(rid) shuffle + rid re-join.  This script measures
both on the SAME 20M-key workload (dense p=0.01 filter, probe all keys)
in fresh taskset-pinned JVMs, best-of-3 per leg — the repo's standard
protocol (CLAUDE.md).

Usage:
    python scripts/probe_strategy_bench.py              # run all legs
    python scripts/probe_strategy_bench.py --worker N STRAT   # internal
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("BLOOMSPARK_PROBE_BENCH_ROWS", "20000000"))
CORES_LEVELS = (4, 16)


def worker(cores: int, strategy: str) -> None:
    from pyspark.sql import SparkSession, functions as F

    from bloomspark import FilterConfig
    from bloomspark.fast import build_fast_bloom, with_fast_membership

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"probe-bench-{cores}-{strategy}")
        .config("spark.sql.shuffle.partitions", str(4 * cores))
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cfg = FilterConfig.complete(n=ROWS, p=0.01, hash_method="XXHash64KM")
    keys = spark.range(0, ROWS, 1, 64).select(
        F.sha2(F.col("id").cast("string"), 256).alias("sha")
    )
    bf = build_fast_bloom(keys, "sha", cfg)
    probe = keys

    def run():
        return (
            with_fast_membership(probe, "sha", bf, cfg, strategy=strategy)
            .where("member")
            .count()
        )

    # warm-up: one full pass (JIT, broadcast build)
    n = run()
    assert n == ROWS, n
    best = None
    for _ in range(3):
        t0 = time.time()
        run()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(json.dumps({
        "cores": cores, "strategy": strategy, "sec": best,
        "rows_per_sec": ROWS / best,
    }))
    spark.stop()


def main() -> None:
    out = []
    for strategy in ("kjoin", "exploded"):
        for cores in CORES_LEVELS:
            cmd = [sys.executable, os.path.abspath(__file__), "--worker",
                   str(cores), strategy]
            if shutil.which("taskset"):
                cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=3600)
            lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
            if not lines:
                print(proc.stdout[-2000:], proc.stderr[-2000:], file=sys.stderr)
                raise SystemExit(1)
            rec = json.loads(lines[-1])
            out.append(rec)
            print(rec, flush=True)
    print(json.dumps({"rows": ROWS, "legs": out}))


if __name__ == "__main__":
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        worker(int(sys.argv[i + 1]), sys.argv[i + 2])
    else:
        main()
