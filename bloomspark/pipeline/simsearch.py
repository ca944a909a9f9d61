"""Similarity search over an embedding column (array<float>).

- ``brute_force_topk``: exact cosine top-k with built-in expressions
  only (zip_with dot product + aggregate norms) — whole-stage codegen,
  no Python; the baseline and the per-bucket kernel of the scale path.
- ``lsh_bucketed_topk``: random-hyperplane buckets; the query probes
  only its own bucket (optionally with multi-probe hamming-1
  neighbors).  At 100 TB the bucket column is a partition/cluster key,
  so a probe prunes to a handful of partitions instead of a full scan.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .dedup import _cosine_expr


def _query_array_lit(query_vec: Sequence[float]):
    return F.array(*[F.lit(float(x)) for x in query_vec])


def brute_force_topk(
    emb: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: one scan, JVM-side arithmetic, ties broken by
    id for determinism.  Returns (id, cosine) ordered best-first."""
    q = _query_array_lit(query_vec)
    scored = emb.select(
        F.col(id_col).alias("id"),
        _cosine_expr(F.col(vec_col).cast("array<double>"), q).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc("id")).limit(k)


def hyperplane_signs(query_vec: Sequence[float], planes: int, seed: int = 11) -> int:
    """Driver-side bucket id of a query vector (matches
    dedup._hyperplane_bucket_expr's hyperplanes)."""
    v = np.asarray(query_vec, dtype=np.float64)
    rng = np.random.RandomState(seed)
    h = rng.standard_normal((v.size, planes))
    signs = (v @ h) > 0
    out = 0
    for b in range(planes):
        out |= int(signs[b]) << b
    return out


def lsh_bucketed_topk(
    emb: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    seed: int = 11,
    multiprobe: bool = True,
    tables: int = 1,
) -> DataFrame:
    """Approximate cosine top-k: score only vectors in the query's
    random-hyperplane bucket (plus hamming-1 neighbor buckets when
    ``multiprobe``).  Recall grows with multiprobe radius and with
    ``tables`` (OR-amplification: a vector is a candidate if it matches
    in ANY of the ``tables`` independent hyperplane sets — each extra
    table multiplies miss probability by the single-table miss rate);
    cost shrinks by ~2^planes/tables.

    All ``tables`` bucket columns are computed in ONE scan (one select
    with T vectorized UDF columns), so OR-amplification adds matmul
    FLOPs, not extra passes over the table.  At 100 TB the bucket
    columns are precomputed partition/cluster keys and the probe prunes
    to a handful of partitions."""
    from .dedup import _hyperplane_bucket_expr

    if tables < 1:
        raise ValueError("tables must be >= 1")
    bucket_cols = [
        _hyperplane_bucket_expr(vec_col, planes, seed + t, emb).alias(f"b{t}")
        for t in range(tables)
    ]
    bucketed = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        *bucket_cols,
    )
    cond = None
    for t in range(tables):
        qb = hyperplane_signs(query_vec, planes, seed + t)
        targets: List[int] = [qb]
        if multiprobe:
            targets += [qb ^ (1 << b) for b in range(planes)]
        this = F.col(f"b{t}").isin(targets)
        cond = this if cond is None else (cond | this)
    q = _query_array_lit(query_vec)
    cand = bucketed.where(cond)
    scored = cand.select("id", _cosine_expr(F.col("v"), q).alias("cosine"))
    return scored.orderBy(F.desc("cosine"), F.asc("id")).limit(k)


def knn_join_bruteforce(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    *,
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """For every left vector, its k nearest right vectors (exact).

    Cross join + window rank — the exact kernel; at scale, bucket both
    sides first (lsh) and run this within buckets.
    Returns (left_id, right_id, cosine, rank).
    """
    from pyspark.sql.window import Window

    l = left.select(F.col(left_id).alias("lid"), F.col(vec_col).cast("array<double>").alias("lv"))
    r = right.select(F.col(right_id).alias("rid"), F.col(vec_col).cast("array<double>").alias("rv"))
    scored = l.crossJoin(r).select(
        "lid",
        "rid",
        _cosine_expr(F.col("lv"), F.col("rv")).alias("cosine"),
    )
    w = Window.partitionBy("lid").orderBy(F.desc("cosine"), F.asc("rid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("lid"), F.col("rid"), "cosine", "rank")
    )
