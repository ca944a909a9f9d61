"""Write-layout operators: deterministic balanced range bucketing.

``repartitionByRange`` decides its range boundaries from a driver-side
reservoir SAMPLE — nondeterministic across runs and retries, so two
writes of the same data can produce different file boundaries (bad for
reproducible lakes, diffable outputs, and incremental file indexes).
This module derives the boundaries from the KLL sketch instead: one
mapInArrow pass (no shuffle, deterministic merge order independence),
exact order-statistic cut points while the sketch is uncompacted and
within the published KLL rank bound beyond, identical run to run.

At 100 TB this is the "balanced output files" primitive: bucket by the
cut points, then ``.repartition(B, col)``/``partitionBy`` so every
output file covers an equal share of the value range's MASS (not its
span), which is what keeps downstream scans and the file-skipping
index (sources/skipping.py) effective on skewed columns.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_cutpoints(
    df: DataFrame,
    col: str,
    num_buckets: int,
    *,
    sketch=None,
) -> List[float]:
    """The ``num_buckets - 1`` bucket boundaries: KLL quantiles at
    ``q = i / num_buckets`` (each the value at cumulative rank
    ``ceil(q * n)`` in the uncompacted regime)."""
    if num_buckets < 2:
        raise ValueError("num_buckets must be >= 2")
    if sketch is None:
        from ..sketches import KLLSketch

        sketch = KLLSketch(k=4096)
    from ..sketches import build_sketch

    state = build_sketch(df, col, sketch).state
    return [
        float(sketch.quantile(state, i / num_buckets))
        for i in range(1, num_buckets)
    ]


def with_range_bucket(
    df: DataFrame,
    col: str,
    num_buckets: int,
    *,
    cutpoints: Optional[Sequence[float]] = None,
    out_col: str = "range_bucket",
    sketch=None,
) -> DataFrame:
    """Append the bucket id (0..num_buckets-1): the count of cut points
    strictly below the value — a pure codegen sum of comparisons, no
    shuffle.  Pass ``cutpoints`` (e.g. from a previous run) to keep a
    lake's layout stable as data grows; otherwise they are derived from
    ``df`` via :func:`range_cutpoints`.  NULLs land in bucket 0."""
    if cutpoints is None:
        cutpoints = range_cutpoints(df, col, num_buckets, sketch=sketch)
    bucket = F.lit(0)
    for c in cutpoints:
        bucket = bucket + F.when(F.col(col) > F.lit(c), 1).otherwise(0)
    return df.withColumn(out_col, bucket.cast("int"))


def repartition_balanced(
    df: DataFrame,
    col: str,
    num_buckets: int,
    *,
    cutpoints: Optional[Sequence[float]] = None,
    out_col: str = "range_bucket",
    sketch=None,
) -> DataFrame:
    """:func:`with_range_bucket` + one repartition on the bucket id:
    every partition holds ~1/num_buckets of the ROWS regardless of the
    column's skew, and partition membership is deterministic across
    runs (unlike ``repartitionByRange``'s sampled boundaries).  Write
    with ``partitionBy(out_col)`` for a reproducible range-clustered
    lake."""
    bucketed = with_range_bucket(
        df, col, num_buckets, cutpoints=cutpoints, out_col=out_col, sketch=sketch
    )
    return bucketed.repartition(num_buckets, F.col(out_col))
