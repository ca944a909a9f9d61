"""Bloom-pruned joins: exact joins accelerated by a fast-tier semi-join
reduction of the big side.

This is the canonical 100-TB use of a Bloom filter inside a query
engine (the pattern Spark itself applies as "runtime bloom filter
join", SPARK-32268): before shuffling a huge fact table into a join,
test every fact key against a Bloom filter of the dimension side's join
keys and drop the rows that cannot match.  The filter is conservative
(no false negatives), so following the prune with the ORDINARY exact
join returns exactly the same rows as the unpruned join — false
positives only cost a little wasted shuffle, never a wrong answer.
That guarantee is what makes this operator oracle-checkable at a
realistic ``p`` (0.01), unlike the membership oracles which need
p=1e-9 to be exact.

Why it matters at scale: an inner/semi join shuffles BOTH sides on the
key.  When the big side is 100 TB and only a few percent of its rows
match the small side, the shuffle is ~100 TB of mostly-dead rows.  The
prune happens in the scan stage — positions as native ``xxhash64``
expressions, membership via the blocked broadcast join (fast.py), all
inside whole-stage codegen — so the shuffle input shrinks by the
non-matching fraction before a single byte moves.

The reference has no join operator (it is a filter library, not an
engine); this composes its BloomFilter semantics (`BloomFilter.java`
contains/addAll contract) with Spark's join machinery the way the
reference's own "what are Bloom filters good for" docs describe
(README.md "use cases": avoiding expensive lookups for keys that
cannot be present).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .fast import (
    BLOCK_WORDS,
    FAST_HASH_METHOD,
    build_fast_bloom,
    fast_bloom_words,
    with_fast_membership,
)
from .params import FilterConfig

#: Filters at or below this size are collected once to the driver and
#: broadcast in blocked form (one Arrow collect of <= m/8 bytes);
#: bigger filters stay a distributed (word, bits) table that is blocked
#: natively and broadcast straight from the executors — the driver
#: never holds the bitset.
DRIVER_FILTER_MAX_BYTES = 64 << 20

#: Filter sizing used by :func:`bloom_prune_join` when the caller gives
#: no ``n_build``: the same fixed-default-expected-n trade Spark's own
#: runtime bloom filter join makes (spark.sql.optimizer.runtime
#: .bloomFilter.expectedNumItems, default 1M) — over/under-shooting
#: only moves the prune's FPP (performance), never the exact join's
#: answer, and skips the driver count() job entirely.
DEFAULT_EXPECTED_N = 1_000_000

#: Effective-FPP floor above which the driver-mode build warns that the
#: prune is saturated (it will pass most non-matching rows); the warning
#: also requires effective FPP > 10x the requested ``p`` so a filter
#: merely running a little hot stays quiet.
SATURATION_FPP_WARN = 0.25

_PRUNABLE = {"inner", "left_semi", "leftsemi", "semi"}


def _resolve_keys(
    on: Union[str, Tuple[str, str], Sequence[str]],
) -> Tuple[str, str, bool]:
    """-> (big_key, small_key, same_name)."""
    if isinstance(on, str):
        return on, on, True
    keys = tuple(on)
    if len(keys) == 1:
        return keys[0], keys[0], True
    if len(keys) == 2:
        return keys[0], keys[1], keys[0] == keys[1]
    raise ValueError(
        "composite join keys are not supported by bloom_prune_join; "
        "pre-concatenate them into one column (e.g. concat_ws) on both "
        "sides, or join without pruning"
    )


def bloom_semi_filter(
    big: DataFrame,
    big_key: str,
    small: DataFrame,
    small_key: Optional[str] = None,
    *,
    p: float = 0.01,
    n_build: Optional[int] = None,
    filter_mode: str = "auto",
    block_words: int = BLOCK_WORDS,
) -> DataFrame:
    """Approximate semi-join: the rows of ``big`` whose ``big_key``
    *may* appear in ``small[small_key]``, pruned by a fast-tier Bloom
    filter — zero Python in the probe plan, no shuffle of ``big``.

    Guaranteed superset of the exact semi-join (no false negatives);
    overshoots by at most a ``p`` fraction of the non-matching rows.
    Use :func:`bloom_prune_join` when the final answer must be exact.

    ``n_build`` pre-sizes the filter and skips the ``small.count()``
    job (pass it when the caller already knows the cardinality).
    Without it the count is REQUIRED here because this function's
    contract is the FPP bound itself (at most a ``p`` fraction of
    non-matching rows pass), which only holds when the filter is sized
    for the true n; the count reads no columns and runs once.
    :func:`bloom_prune_join` — whose answer is exact regardless of
    FPP — sizes with :data:`DEFAULT_EXPECTED_N` instead and launches
    no count job.
    ``filter_mode``: ``"driver"`` collects the built filter once to the
    driver (<= m/8 bytes, the fast default), ``"distributed"`` keeps it
    as a (word, bits) table end to end (the never-collected shape),
    ``"auto"`` picks by :data:`DRIVER_FILTER_MAX_BYTES`.

    Dimensions past the Java-int sizing cap (optimal m > 2^31 at this
    ``n``/``p``) complete as extended-m configs automatically: the
    filter stays a distributed words table and the probe switches to
    the exploded single-join strategy — slower per row than the blocked
    k-join (BASELINE.md round-4 measurement) but the only shape that
    exists once the blocked broadcast stops fitting; past ~10^10 build
    keys prefer the sharded tier outright.
    """
    from .params import optimal_m

    small_key = small_key if small_key is not None else big_key
    n = n_build if n_build is not None else small.count()
    extended = optimal_m(max(int(n), 1), p) > 2**31 - 1
    config = FilterConfig.complete(
        n=max(int(n), 1), p=p, hash_method=FAST_HASH_METHOD, extended=extended
    )
    if extended:
        filter_mode = "distributed"
    if filter_mode == "auto":
        filter_mode = (
            "driver" if config.num_bytes <= DRIVER_FILTER_MAX_BYTES else "distributed"
        )
    if filter_mode == "driver":
        src: Union[DataFrame, object] = build_fast_bloom(small, small_key, config)
        # saturation signal (round-5 advice): with n_build omitted and a
        # build side far above the sized n, the filter fills up, the
        # effective FPP ~ fill^k approaches 1 and the prune silently
        # becomes pure overhead.  The bitset is already on the driver
        # here, so the check is one popcount — warn so callers learn to
        # pass n_build (the answer stays exact either way).
        fill = src.cardinality() / config.m
        est_fpp = fill ** config.k
        if est_fpp > max(10.0 * p, SATURATION_FPP_WARN):
            import warnings

            warnings.warn(
                f"bloom_semi_filter: filter sized for n={config.n} is "
                f"{fill:.0%} full (effective FPP ~{est_fpp:.2f}, target "
                f"p={p}); the prune will pass most non-matching rows. "
                "Pass n_build with the build side's true cardinality.",
                RuntimeWarning,
                stacklevel=2,
            )
    elif filter_mode == "distributed":
        src = fast_bloom_words(small, small_key, config)
    else:
        raise ValueError(f"unknown filter_mode {filter_mode!r}")
    out_col = "__bloom_prune_member"
    pruned = with_fast_membership(
        big, big_key, src, config, out_col=out_col, block_words=block_words,
        strategy="exploded" if extended else "kjoin",
    )
    return pruned.where(F.col(out_col)).drop(out_col)


def bloom_prune_join(
    big: DataFrame,
    small: DataFrame,
    on: Union[str, Tuple[str, str], Sequence[str]],
    *,
    how: str = "inner",
    p: float = 0.01,
    n_build: Optional[int] = None,
    filter_mode: str = "auto",
    block_words: int = BLOCK_WORDS,
) -> DataFrame:
    """Exact ``big.join(small, on, how)`` with the big side Bloom-pruned
    first.

    ``on`` is a single column name present in both frames (merged in
    the output, standard Spark semantics) or a ``(big_col, small_col)``
    pair.  ``how`` must be ``"inner"`` or ``"left_semi"`` — the joins
    for which dropping provably-non-matching big rows is semantics-
    preserving.  Outer/anti joins must keep (or route differently) the
    non-matching rows, so pruning would change the answer; they raise.

    Null join keys: the probe hashes null as "" and may pass it, but
    the exact join discards null-key matches as always — the result is
    identical to the unpruned join in all cases (this is the oracle
    contract the driver gate checks).

    The returned plan is: scan(big) -> k codegen'd broadcast block
    joins + bit tests -> filter -> the ordinary exact join, to which
    Catalyst/AQE still apply their own strategy (broadcast the small
    side when it fits, sort-merge otherwise) — pruning composes with,
    never replaces, the optimizer's join choice.

    Sizing: with no ``n_build`` the filter is sized for
    :data:`DEFAULT_EXPECTED_N` keys — Spark's own runtime-bloom-filter
    default — so constructing the plan launches NO driver count() job
    (round-4 verdict item 4).  Mis-sizing only changes how much dead
    shuffle the prune removes (undersized -> higher FPP -> weaker
    prune; oversized -> bigger broadcast), never the join's answer;
    pass ``n_build`` when the dim cardinality is known and far from
    the default.
    """
    if how not in _PRUNABLE:
        raise ValueError(
            f"how={how!r} cannot be bloom-pruned: only inner/left_semi "
            "joins may drop non-matching big-side rows before joining"
        )
    big_key, small_key, same_name = _resolve_keys(on)
    pruned = bloom_semi_filter(
        big,
        big_key,
        small,
        small_key,
        p=p,
        n_build=n_build if n_build is not None else DEFAULT_EXPECTED_N,
        filter_mode=filter_mode,
        block_words=block_words,
    )
    how = "left_semi" if how in {"leftsemi", "semi"} else how
    if same_name:
        return pruned.join(small, on=big_key, how=how)
    return pruned.join(small, on=pruned[big_key] == small[small_key], how=how)


def sharded_semi_filter(
    big: DataFrame,
    big_key: str,
    small: DataFrame,
    small_key: Optional[str] = None,
    *,
    p: float = 0.01,
    n_build: Optional[int] = None,
    num_shards: int = 64,
    shard_config: Optional[FilterConfig] = None,
    salt_partitions: int = 8,
) -> DataFrame:
    """Approximate semi-join through the SHARDED filter tier: the rows
    of ``big`` whose ``big_key`` *may* appear in ``small[small_key]``,
    with the filter living as a distributed (shard, bitset) DataFrame
    that is never collected or broadcast.

    This is the prune for the regime where :func:`bloom_semi_filter`
    stops working: past ~10^10 build keys the optimal bitset is tens of
    GB — too big to collect to the driver, too big to broadcast, and
    past 2^46 bits beyond extended-m entirely.  The sharded form sizes
    ``num_shards`` independent bitsets for n/``num_shards`` keys each
    and probes by co-partitioning (sharded.py): both sides shuffle once
    on the shard id, each bitset crosses the wire once per job.  The
    trade vs the fast tier is one shuffle of ``big`` (by shard id) —
    at 100 TB that is still far cheaper than shuffling ``big`` into an
    unpruned join, because the probe output (the only thing the join
    then shuffles BY KEY) shrinks by the non-matching fraction.

    Same conservative contract as the fast tier: a guaranteed superset
    of the exact semi-join, overshooting by at most a ``p`` fraction of
    non-matching rows when the filter is sized for the true build
    cardinality.  As in :func:`bloom_semi_filter`, ``n_build`` (or an
    explicit per-shard ``shard_config``) skips the ``small.count()``
    job; without either the count runs once because the FPP bound IS
    this function's contract.
    """
    from .sharded import build_sharded_bloom, with_sharded_membership

    small_key = small_key if small_key is not None else big_key
    if shard_config is None:
        n = n_build if n_build is not None else small.count()
        shard_config = FilterConfig.complete(
            n=max(int(n) // num_shards, 1), p=p, hash_method=FAST_HASH_METHOD
        )
    shards = build_sharded_bloom(
        small.select(small_key),
        small_key,
        shard_config,
        num_shards=num_shards,
        salt_partitions=salt_partitions,
    )
    out_col = "__sharded_prune_member"
    # Probe a KEY-ONLY projection through the cogroup, then semi-join
    # the surviving keys back onto ``big`` (round-7, guide §4: pass only
    # the columns the function needs).  The previous shape co-partitioned
    # the FULL big rows with the shards, so every payload column crossed
    # the shard exchange AND the Python worker round-trip; now only the
    # key column does, and the big side's payload moves (or not) by
    # whatever strategy Catalyst picks for the semi join — broadcast of
    # the p-bounded hit set when it fits, sort-merge (one shuffle of
    # big, on the SAME key the exact join will reuse) past that.  A
    # null big_key row can no longer survive the prune (null matches
    # nothing in a semi join) — it never matched the exact semi-join
    # either, so the superset contract is unchanged.
    hits = (
        with_sharded_membership(
            big.select(big_key),
            big_key,
            shards,
            shard_config,
            num_shards=num_shards,
            out_col=out_col,
        )
        .where(F.col(out_col))
        .select(big_key)
    )
    return big.join(hits, big_key, "left_semi")


def sharded_prune_join(
    big: DataFrame,
    small: DataFrame,
    on: Union[str, Tuple[str, str], Sequence[str]],
    *,
    how: str = "inner",
    p: float = 0.01,
    n_build: Optional[int] = None,
    num_shards: int = 64,
    shard_config: Optional[FilterConfig] = None,
    salt_partitions: int = 8,
) -> DataFrame:
    """Exact ``big.join(small, on, how)`` with the big side pruned by a
    SHARDED (never-collected) Bloom filter of the build side's keys —
    the :func:`bloom_prune_join` for joins where BOTH sides are huge.

    When the build side has ~10^10+ distinct keys its filter is tens of
    GB and the fast tier's broadcast probe stops existing; here the
    filter stays a (shard, bitset) DataFrame and the probe co-partitions
    ``big`` with it on the shard id (one shuffle of ``big``, each
    bitset moving once per job — sharded.py).  The prune remains
    conservative, so following it with the ordinary exact join returns
    exactly the unpruned join's rows; false positives only cost wasted
    shuffle in the final join, never a wrong answer — the same
    oracle-checkable contract as :func:`bloom_prune_join`.

    Sizing mirrors :func:`bloom_prune_join`: with neither ``n_build``
    nor ``shard_config`` the per-shard filters are sized for
    :data:`DEFAULT_EXPECTED_N` total keys, so plan construction
    launches NO driver job; mis-sizing moves the prune's FPP
    (performance), never the answer.  ``how`` must be inner/left_semi,
    as in :func:`bloom_prune_join` (pruning would change any other
    join's answer).
    """
    if how not in _PRUNABLE:
        raise ValueError(
            f"how={how!r} cannot be bloom-pruned: only inner/left_semi "
            "joins may drop non-matching big-side rows before joining"
        )
    big_key, small_key, same_name = _resolve_keys(on)
    pruned = sharded_semi_filter(
        big,
        big_key,
        small,
        small_key,
        p=p,
        n_build=n_build if n_build is not None else DEFAULT_EXPECTED_N,
        num_shards=num_shards,
        shard_config=shard_config,
        salt_partitions=salt_partitions,
    )
    how = "left_semi" if how in {"leftsemi", "semi"} else how
    if same_name:
        return pruned.join(small, on=big_key, how=how)
    return pruned.join(small, on=pruned[big_key] == small[small_key], how=how)


def estimate_join_size(
    left: DataFrame,
    left_col: str,
    right: DataFrame,
    right_col: str,
    *,
    width: int = 1 << 16,
    depth: int = 5,
    seed: int = 7919,
) -> Tuple[int, float]:
    """Plan-time join-cardinality estimate WITHOUT running the join:
    build a count-min sketch of each side's key frequencies (one
    mapInArrow pass per side, no shuffle) and take the CMS inner
    product — ``sum_k f_L(k) * f_R(k)``, the exact row count of
    ``L JOIN R`` on the key, estimated within ``eps * N_L * N_R``
    (eps = e/width) and never UNDER-estimated.

    Returns ``(estimate, additive_bound)``.  The use case at 100 TB is
    deciding a join strategy before paying for it: whether the output
    explodes (skewed hot keys multiply), whether a prune join is worth
    building, or which side to broadcast — at the cost of two linear
    scans that Catalyst cannot give you from table stats alone (it
    estimates from row counts + NDV, blind to matched-key frequency
    correlation, which is exactly what the inner product captures).
    """
    from .sketches import CountMinSketch, build_sketch

    cms = CountMinSketch(width=width, depth=depth, seed=seed)
    a = build_sketch(left, left_col, cms).state
    b = build_sketch(right, right_col, cms).state
    return cms.inner_product(a, b), cms.inner_product_bound(a, b)
