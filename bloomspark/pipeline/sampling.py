"""Deterministic hash-based sampling: uniform samples, train/val/test
splits, fixed-size pseudo-random samples, and weighted sampling — the
sampling layer a 100 TB training-data pipeline needs.

Random sampling at cluster scale must NOT use RNG state: `rand()` is
per-task and changes under retries/repartitioning, so a retried stage
samples different rows (non-deterministic lineage) and two tables can
never be sampled *consistently*.  Every operator here instead derives
its randomness from a hash of the row's KEY columns:

- **Deterministic & retry-safe**: the decision is a pure function of
  the key (+ an optional salt), independent of partitioning, task
  retries, cluster size, or execution order.
- **Consistent across tables**: sampling two tables by the same join
  key at the same rate keeps exactly the matching rows on both sides,
  so joins over the samples are unbiased (the classic "consistent
  hash sampling" property).
- **Refreshable**: changing ``salt`` draws an independent sample
  without touching the data.
- **Nested**: thresholds are monotone in the fraction, so
  ``kept(f1) ⊆ kept(f2)`` whenever ``f1 <= f2`` — a pipeline can grow
  its sample rate without invalidating artifacts built on the smaller
  sample.

The uniform is the first 60 bits of ``md5(key)`` (15 hex digits —
exact in both int64 and float64, and replayable bit-for-bit by any
engine with an MD5 function, which is how the DuckDB oracles verify
these operators row-for-row).  MD5 here is Spark's JVM-side codegen
``md5()`` — no Python in the plan; the sampling predicate is a plain
scan+filter that whole-stage-codegens and combines with partition
pruning.  This is a *sampling* hash, not the bit-parity filter suite
(hashing.py) — it needs portability and uniformity, not Java parity.

Reference: Orestes-Bloomfilter has no sampling layer; this module is
part of the beyond-reference training-pipeline surface (task brief),
alongside pipeline/dedup.py and pipeline/text.py.
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 15 hex digits = 60 bits: exact in int64 AND float64 (so thresholds
#: computed driver-side in Python match executor-side comparisons),
#: and small enough for DuckDB's ``('0x' || …)::BIGINT`` replay.
SAMPLE_HEX_DIGITS = 15

#: The size of the uniform space: hashes are uniform on [0, 2^60).
SAMPLE_SPACE = 16**SAMPLE_HEX_DIGITS

#: Key-column separator for multi-column keys (ASCII unit separator —
#: never appears in the testdata keys; callers with adversarial keys
#: should pre-concat their own canonical key column).
_SEP = "\x1f"


def sample_key_expr(cols: Sequence[str], salt: str = "") -> Column:
    """The canonical string key: ``salt SEP col1 SEP col2 …`` via
    ``concat_ws`` (NULL columns are skipped by concat_ws in both Spark
    and DuckDB — key columns should be non-null)."""
    parts = [F.col(c).cast("string") for c in cols]
    if salt:
        parts = [F.lit(salt)] + parts
    return F.concat_ws(_SEP, *parts)


def sample_uniform_expr(
    cols: Sequence[str], salt: str = "", method: str = "md5"
) -> Column:
    """60-bit integer uniform on [0, SAMPLE_SPACE) from a hash of the
    key — the randomness source for every operator in this module.

    ``method="md5"`` (default) is the PORTABLE uniform: any engine with
    an MD5 function replays it bit-for-bit (SQL:
    ``('0x' || substr(md5(key), 1, 15))::BIGINT``), which is how the
    DuckDB oracles verify these operators row-for-row.
    ``method="xxh64"`` is the FAST tier: Spark's native ``xxhash64``
    masked to 60 bits — same determinism/consistency guarantees,
    several times the throughput of md5 in whole-stage codegen (the
    right choice on a 100 TB hot path when no cross-engine replay is
    needed; replayable by anything with a seed-42 XXH64, including
    this repo's ``hashing.xxh64`` numpy replica)."""
    if method == "md5":
        return F.conv(
            F.substring(F.md5(sample_key_expr(cols, salt)), 1, SAMPLE_HEX_DIGITS),
            16,
            10,
        ).cast("long")
    if method == "xxh64":
        return F.xxhash64(sample_key_expr(cols, salt)).bitwiseAND(
            F.lit(SAMPLE_SPACE - 1)
        )
    raise ValueError(f"unknown sampling hash method {method!r}")


def hash_sample(
    df: DataFrame,
    cols: Sequence[str],
    fraction: float,
    salt: str = "",
    method: str = "md5",
) -> DataFrame:
    """Deterministic uniform sample: keep a row iff its 60-bit key
    uniform < ``fraction * 2^60`` (integer compare — no float in the
    decision).  Same key ⇒ same decision, across tables, retries and
    cluster sizes; E[kept] = fraction within the hash uniformity bound.
    ``method="xxh64"`` switches to the fast JVM hash (see
    :func:`sample_uniform_expr`).

    The plan is scan → codegen filter: no shuffle, no Python, and the
    predicate sits where Catalyst can combine it with other pushed
    filters."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(fraction * SAMPLE_SPACE)
    return df.where(sample_uniform_expr(cols, salt, method) < F.lit(threshold))


def with_split(
    df: DataFrame,
    cols: Sequence[str],
    weights: Dict[str, float] = None,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic dataset split (train/val/test by default): the
    key uniform is bucketed by cumulative integer thresholds, so every
    row lands in exactly one split, assignments are reproducible, and
    re-running over grown data never moves an old row between splits
    (the property that keeps eval sets leak-free as the corpus grows).

    ``weights`` map split name → fraction; they must sum to 1 (±1e-9).
    Order of dict insertion fixes the bucket order (deterministic)."""
    if weights is None:
        weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    if len(weights) < 2:
        raise ValueError("need at least 2 splits")
    if any(w < 0 for w in weights.values()):
        raise ValueError("split weights must be non-negative")
    u = sample_uniform_expr(cols, salt)
    names = list(weights)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += weights[name]
        t = int(cum * SAMPLE_SPACE)
        clause = (u < F.lit(t), F.lit(name))
        expr = F.when(*clause) if expr is None else expr.when(*clause)
    expr = expr.otherwise(F.lit(names[-1]))
    return df.withColumn(out_col, expr)


def bottom_k_sample(df: DataFrame, cols: Sequence[str], k: int, salt: str = "") -> DataFrame:
    """Fixed-size pseudo-random sample: the k rows whose full md5 hex
    (128 bits — collision-free in practice, so the order is total and
    the result set is unique) sorts lowest.  Spark executes this as
    TakeOrderedAndProject: per-partition top-k then a k-row merge at
    the driver — no full sort, no shuffle of the data, scale-safe.

    This is the KMV/bottom-k construction (same family as the Theta
    sketch's retention set): a uniform sample of EXACTLY k rows that is
    also mergeable — bottom-k of a union is the bottom-k of the parts'
    bottom-ks."""
    if k < 1:
        raise ValueError("k must be >= 1")
    hcol = F.md5(sample_key_expr(cols, salt))
    return df.orderBy(hcol.asc()).limit(k)


def weighted_sample(
    df: DataFrame,
    cols: Sequence[str],
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-ES): each row draws rank-key ``u^(1/w)`` from its deterministic
    uniform u ∈ (0, 1] and weight w > 0; the k largest rank-keys are
    the sample, giving inclusion probability proportional to weight
    (exact for the first draw, the standard A-ES guarantee for the
    rest).  Deterministic for a fixed salt, executed as
    TakeOrderedAndProject like :func:`bottom_k_sample`.

    Rows with weight <= 0 or NULL are never sampled.  Note the rank
    key is a float64 ``pow``; two rows tie only if their pow values
    collide to the last ulp (~2^-52 odds per pair) — the oracle replay
    is float-identical in practice but, unlike the integer-threshold
    operators above, not *provably* engine-exact."""
    if k < 1:
        raise ValueError("k must be >= 1")
    # u in (0, 1]: (h + 1) / 2^60 — never 0, so pow is well-defined
    u = (sample_uniform_expr(cols, salt) + F.lit(1)).cast("double") / F.lit(
        float(SAMPLE_SPACE)
    )
    w = F.col(weight_col).cast("double")
    rank_key = F.pow(u, F.lit(1.0) / w)
    return (
        df.where(w > 0)
        .orderBy(rank_key.desc())
        .limit(k)
    )


def mixture_plan(
    sizes: Dict[str, int],
    weights: Dict[str, float],
    total_rows: float = None,
) -> Dict[str, tuple]:
    """Per-corpus replication plan for :func:`mix_corpora`: for each
    corpus the sampling RATE is ``weight * total / size`` — how many
    times each of its rows appears in expectation — decomposed into
    ``(full_epochs, fractional_rate)``: ``int(rate)`` whole copies plus
    one copy sampled at ``rate - int(rate)``.

    ``total_rows`` defaults to the largest total achievable without
    upsampling any corpus (``min(size/weight)``), i.e. every rate <= 1
    and the scarcest corpus is used exactly once."""
    if set(sizes) != set(weights):
        raise ValueError("sizes and weights must cover the same corpora")
    total_w = sum(weights.values())
    if abs(total_w - 1.0) > 1e-9:
        raise ValueError(f"mixture weights must sum to 1, got {total_w}")
    if any(n <= 0 for n in sizes.values()):
        raise ValueError("corpus sizes must be positive")
    if any(w < 0 for w in weights.values()):
        raise ValueError("mixture weights must be non-negative")
    if total_rows is None:
        total_rows = min(
            sizes[s] / w for s, w in weights.items() if w > 0
        )
    plan = {}
    for name, w in weights.items():
        rate = w * total_rows / sizes[name]
        k = int(rate)
        plan[name] = (k, rate - k)
    return plan


def mix_corpora(
    sources: Dict[str, DataFrame],
    cols: Sequence[str],
    weights: Dict[str, float],
    *,
    total_rows: float = None,
    sizes: Dict[str, int] = None,
    salt: str = "mix",
    corpus_col: str = "corpus",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Deterministic corpus mixing: combine named corpora into one
    training stream with target proportions ``weights``, downsampling
    abundant sources and UPSAMPLING scarce ones by whole epochs + one
    hash-sampled partial epoch (the standard data-mixture recipe —
    each row of an upsampled corpus appears ``int(rate)`` or
    ``int(rate)+1`` times, tagged by ``epoch_col`` so loaders can
    interleave or shuffle-buffer them apart).

    Expected output size is ``total_rows`` (Bernoulli per row, not an
    exact count); every decision is the key-hash integer compare from
    :func:`hash_sample` with an epoch-scoped salt, so the mixture is
    reproducible, retry-safe, and replayable as a UNION ALL of sampled
    selects (the DuckDB oracle).  ``sizes`` may be passed to avoid the
    one ``count()`` driver action per source.

    The plan is a union of codegen'd scan+filters — no shuffle; Spark
    scans an upsampled corpus once per epoch (k+1 scans ~ k+1 output
    copies, I/O proportional to output, and the scans share the
    parquet cache at 100 TB they'd share cluster cache locality)."""
    if not sources:
        raise ValueError("need at least one corpus")
    if set(sources) != set(weights):
        raise ValueError(
            f"sources and weights must cover the same corpora "
            f"(sources={sorted(sources)}, weights={sorted(weights)})"
        )
    sizes = sizes or {name: df.count() for name, df in sources.items()}
    plan = mixture_plan(sizes, weights, total_rows)
    parts = []
    for name, df in sources.items():
        k, frac = plan[name]
        tagged = df.withColumn(corpus_col, F.lit(name))
        for e in range(k):
            parts.append(tagged.withColumn(epoch_col, F.lit(e)))
        if frac > 0:
            parts.append(
                hash_sample(
                    tagged, cols, frac, salt=f"{salt}:{name}:e{k}"
                ).withColumn(epoch_col, F.lit(k))
            )
    if not parts:
        raise ValueError("mixture plan produced no output (all rates 0)")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def stratified_sample(
    df: DataFrame,
    cols: Sequence[str],
    strata_col: str,
    fractions: Dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum keeps rows at
    its own rate (strata absent from ``fractions`` are dropped, the
    ``sampleBy`` convention) — but unlike ``DataFrame.sampleBy`` the
    decision is the key hash, so it is exact-per-key, retry-safe, and
    consistent across tables like :func:`hash_sample`.

    One codegen CASE over the stratum column picks the threshold; the
    plan stays a single scan+filter (no shuffle, no per-stratum jobs).
    """
    thresholds = {}
    for stratum, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {stratum!r} must be in [0, 1]")
        thresholds[stratum] = int(frac * SAMPLE_SPACE)
    if not thresholds:
        raise ValueError("need at least one stratum fraction")
    u = sample_uniform_expr(cols, salt)
    t = None
    for stratum, thr in thresholds.items():
        clause = (F.col(strata_col) == stratum, F.lit(thr))
        t = F.when(*clause) if t is None else t.when(*clause)
    t = t.otherwise(F.lit(0))  # unlisted strata: keep nothing
    return df.where(u < t)
