"""Deterministic document packing: assign documents to fixed-token-
budget packs (context windows) — the concat-then-chunk recipe LM
pretraining pipelines run over their whole corpus.

Semantics: documents are laid out on a virtual concatenated token
stream in a deterministic pseudo-random order (the sampling module's
md5 uniform — retry-safe, partition-independent), and a document's
pack is the chunk its FIRST token lands in: ``pack_id = floor(
start_offset / budget)``.  A document longer than the budget simply
spans into the next chunk(s), exactly like the standard concat+chunk
loader; packs are ~budget tokens with at most one boundary-crossing
document each.

Scale shape: a global concatenation would be a single total order (one
partition — a non-starter at 100 TB), so the stream is split into
``num_buckets`` independent streams by key hash first.  Each bucket
packs independently (pack identity = (bucket, pack_id)), the layout is
one hash-partitioned shuffle + a per-bucket running sum (window
function, no driver involvement), and parallelism = num_buckets.
Everything is built-in expressions — codegen'd, and replayable in ANSI
SQL window functions, which is how the DuckDB oracle checks it
row-for-row.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import sample_uniform_expr


def pack_documents(
    df: DataFrame,
    cols: Sequence[str],
    token_col: str,
    budget: int,
    *,
    num_buckets: int = 64,
    salt: str = "",
    bucket_col: str = "pack_bucket",
    pack_col: str = "pack_id",
    offset_col: str = "pack_offset",
) -> DataFrame:
    """Assign every row a ``(pack_bucket, pack_id, pack_offset)``:

    - ``pack_bucket``: which of the ``num_buckets`` independent token
      streams the document belongs to (key-hash mod buckets);
    - ``pack_offset``: the document's start offset on its bucket's
      concatenated token stream (exclusive running sum of ``token_col``
      in the deterministic hash order);
    - ``pack_id``: ``floor(pack_offset / budget)`` — the context-window
      chunk the document starts in.

    Deterministic for a fixed salt: re-runs, retries, and different
    input partitionings produce the identical layout, so downstream
    shards can be rebuilt reproducibly.  Rows with NULL or negative
    token counts are rejected up front (a silent 0 would merge packs).
    """
    if budget < 1:
        raise ValueError("budget must be >= 1 token")
    if num_buckets < 1:
        raise ValueError("num_buckets must be >= 1")
    u = sample_uniform_expr(cols, salt)
    toks = F.col(token_col).cast("long")
    # executor-side validation (no driver action): assert_true yields
    # NULL when the predicate holds and raises on the first violation
    guard = F.assert_true(
        toks.isNotNull() & (toks >= 0),
        F.lit(f"pack_documents: {token_col} must be non-null and >= 0"),
    )
    toks = F.when(guard.isNull(), toks)
    with_keys = df.withColumn(bucket_col, (u % num_buckets).cast("int")).withColumn(
        "__pack_order", u
    )
    w = (
        Window.partitionBy(bucket_col)
        .orderBy(F.col("__pack_order"), *[F.col(c) for c in cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(toks).over(w) - toks).alias(offset_col)
    return (
        with_keys.withColumn(offset_col, start)
        .withColumn(pack_col, F.floor(F.col(offset_col) / budget))
        .drop("__pack_order")
    )


def pack_stats(
    packed: DataFrame,
    token_col: str,
    *,
    bucket_col: str = "pack_bucket",
    pack_col: str = "pack_id",
) -> DataFrame:
    """Per-pack fill statistics: document count and token sum keyed by
    (bucket, pack) — the fill-rate audit a packing job reports.  Note a
    pack's token sum may exceed the budget by its last document's
    spill (concat+chunk semantics)."""
    return packed.groupBy(bucket_col, pack_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_col).cast("long")).alias("n_tokens"),
    )
