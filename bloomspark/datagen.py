"""Deterministic synthetic source-code repository table (FIXTURES.md F1).

Matches the BASELINE.json input_hint shape:
``(repo:string, path:string, commit:string, lang:string, content:string)``
plus derived key columns ``sha`` (= sha2(content, 256), the per-row
invariant column) and ``rp`` (= repo:path).

Generated entirely with built-in Spark SQL expressions over
``spark.range`` — no Python in the loop, so bench-scale (millions of
rows) generation is whole-stage-codegen fast and identical across runs
and parallelism levels (content depends only on the row index).

Skew: ~20% of rows land in ``org0/repo0`` (Zipf-ish head) to exercise
the salted two-phase merge.  ~5% of rows duplicate the content of the
first row of their 20-row block (exact-duplicate population for
counting/dedup tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EXTS = ["py", "java", "rs", "go", "md"]
LANGS = {"py": "python", "java": "java", "rs": "rust", "go": "go", "md": "markdown"}


def source_code_table(
    spark: SparkSession, rows: int = 2000, *, partitions: int = None
) -> DataFrame:
    df = spark.range(0, rows, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")

    # Zipf-ish head: every 5th row -> org0/repo0 (20%); the rest spread
    repo = F.when(i % 5 == 0, F.lit("org0/repo0")).otherwise(
        F.concat(F.lit("org"), (i % 7).cast("string"), F.lit("/repo"), (i % 101).cast("string"))
    )

    ext = F.element_at(F.array(*[F.lit(e) for e in EXTS]), (i % 5 + 1).cast("int"))
    lang_map = F.create_map(
        *[x for e in EXTS for x in (F.lit(e), F.lit(LANGS[e]))]
    )
    path = F.concat(
        F.lit("src/mod"),
        (i % 13).cast("string"),
        F.lit("/pkg"),
        (i % 29).cast("string"),
        F.lit("/file"),
        (i % 977).cast("string"),
        F.lit("."),
        ext,
    )
    commit = F.substring(F.sha2(F.concat(F.lit("commit"), i.cast("string")), 256), 1, 40)

    # content derives from a canonical index: rows with id % 20 == 19 copy
    # the content of the first row in their 20-block (~5% exact dups)
    j = F.when(i % 20 == 19, i - (i % 20)).otherwise(i)
    seed_hex = F.sha2(F.concat(F.lit("content"), j.cast("string")), 256)
    # 200-4000 chars: repeat the 64-char hex chunk (j % 60 + 4) times
    content = F.concat(
        F.lit("// synthetic source \n"),
        F.repeat(F.concat(seed_hex, F.lit("\n")), ((j % 60) + 4).cast("int")),
    )

    return df.select(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        F.element_at(lang_map, ext).alias("lang"),
        content.alias("content"),
    )


def with_keys(df: DataFrame) -> DataFrame:
    """Derived key columns used by tests and benches (FIXTURES.md F1)."""
    return df.withColumn("sha", F.sha2(F.col("content"), 256)).withColumn(
        "rp", F.concat(F.col("repo"), F.lit(":"), F.col("path"))
    )


def probe_table(spark: SparkSession, rows: int = 2000, *, partitions: int = None) -> DataFrame:
    """A disjoint probe population (seed offset) for observed-FPP
    measurement — the insert-n / probe-unseen design of the reference FP
    harness (/root/reference/src/test/java/performance/BFHashFP.java:46-89)."""
    df = spark.range(0, rows, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    # different generator tag -> sha population disjoint from source_code_table
    content = F.sha2(F.concat(F.lit("probe-disjoint"), i.cast("string")), 256)
    return df.select(content.alias("sha"))
