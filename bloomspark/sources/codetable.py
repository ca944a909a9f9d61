"""Deterministic synthetic source-code repository table.

The north rule's input is an Iceberg table of source-code repos with
columns (repo, path, commit, lang, content) at 10^12-file scale.  This
generator synthesizes that exact shape at any small scale for tests and
benchmarks — no external data — using ONLY expressions that exist in
both Spark SQL and DuckDB (sha256/md5, concat, modulo, repeat), so the
driver's DuckDB oracle can regenerate the identical table from a
``range(n)`` source and every derived query is value-matched end to end
(including the per-row ``sha2(content, 256)`` invariant the input hint
requires).

Skew: repo ids follow id%97 except that ~1/4 of all files collapse into
repo-0 — the Zipf-heavy tenant the salted per-group builds are tested
against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LANGS = ["py", "java", "go", "rs"]


def source_code_table(
    spark: SparkSession, n_files: int, *, partitions: int = 32
) -> DataFrame:
    """(repo, path, commit, lang, content) for ids 0..n_files-1; pure
    codegen'd built-ins over ``spark.range`` — generation parallelizes
    and never touches the driver."""
    df = spark.range(0, n_files, 1, partitions)
    ids = F.col("id")
    # 1/4 of files land in the hot repo-0 (ids % 4 == 1 -> repo 0)
    repo_num = F.when(F.pmod(ids, F.lit(4)) == 1, F.lit(0)).otherwise(
        F.pmod(ids, F.lit(97))
    )
    lang = F.element_at(
        F.array(*[F.lit(x) for x in _LANGS]), (F.pmod(ids, F.lit(4)) + 1).cast("int")
    )
    content = F.concat(
        F.lit("def fn_"),
        ids.cast("string"),
        F.lit("():\n    return '"),
        F.repeat(
            F.substring(F.sha2(F.concat(F.lit("body:"), ids.cast("string")), 256), 1, 32),
            (F.pmod(ids, F.lit(8)) + 1).cast("int"),
        ),
        F.lit("'\n"),
    )
    return df.select(
        F.concat(F.lit("repo-"), repo_num.cast("string")).alias("repo"),
        F.concat(
            F.lit("src/"),
            F.pmod(ids, F.lit(13)).cast("string"),
            F.lit("/file_"),
            ids.cast("string"),
            F.lit("."),
            lang,
        ).alias("path"),
        F.substring(
            F.sha2(F.concat(F.lit("commit:"), ids.cast("string")), 256), 1, 40
        ).alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )


def CODE_TABLE_SQL(n_files: int) -> str:
    """The SAME table as DuckDB SQL (a CTE body) — the oracle twin of
    :func:`source_code_table`."""
    langs = ", ".join(f"'{x}'" for x in _LANGS)
    return f"""
        SELECT
            'repo-' || CAST(CASE WHEN id % 4 = 1 THEN 0 ELSE id % 97 END AS VARCHAR)
                AS repo,
            'src/' || CAST(id % 13 AS VARCHAR) || '/file_' || CAST(id AS VARCHAR)
                || '.' || ([{langs}])[(id % 4) + 1] AS path,
            substring(sha256('commit:' || CAST(id AS VARCHAR)), 1, 40) AS commit,
            ([{langs}])[(id % 4) + 1] AS lang,
            'def fn_' || CAST(id AS VARCHAR) || '():
    return ''' || repeat(substring(sha256('body:' || CAST(id AS VARCHAR)), 1, 32),
                         CAST(id % 8 + 1 AS INT)) || '''
' AS content
        FROM range(0, {n_files}) AS t(id)
    """
