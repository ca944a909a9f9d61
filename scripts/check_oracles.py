#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()``
twin on DuckDB over the same parquet dir, compare row count, column
names, and order-insensitive values.

Usage: python scripts/check_oracles.py [query_name ...] [--sf DIR]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return round(val, 6)
    if isinstance(val, bytes):
        return val.hex()
    return val


def rows_to_canonical(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(normalize(r[i]) for i in order))
    out.sort(key=repr)
    return [cols[i] for i in order], out


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    sf_dir = "/root/testdata/sf0.01"
    args, skip = [], False
    for a in sys.argv[1:]:
        if skip:
            sf_dir = a
            skip = False
        elif a == "--sf":
            skip = True
        elif not a.startswith("--"):
            args.append(a)

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args or sorted(qs)
    failures = 0
    for name in names:
        sdf = qs[name](spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:24s} rows={len(srows):6d}  (no oracle — rows-only check)")
            continue
        ores = con.execute(oracles[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        sc, sv = rows_to_canonical(scols, [tuple(r) for r in srows])
        oc, ov = rows_to_canonical(ocols, orows)
        ok_cols = sc == oc
        ok_rows = len(sv) == len(ov)
        ok_vals = sv == ov
        status = "OK " if (ok_cols and ok_rows and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name:24s} {status} rows={len(sv)}/{len(ov)} cols={'OK' if ok_cols else f'{sc} vs {oc}'} "
            f"values={'OK' if ok_vals else 'MISMATCH'}"
        )
        if not ok_vals and ok_cols and ok_rows:
            for a, b in zip(sv, ov):
                if a != b:
                    print(f"    first diff: spark={a} oracle={b}")
                    break
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
