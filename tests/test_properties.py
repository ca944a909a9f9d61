"""Property-based tests (hypothesis) for the driver-side filter algebra
and the hash suite — laws that must hold for ARBITRARY inputs, not just
the fixtures: no false negatives, union/intersect monotonicity, counting
add/remove inversion, serde identity, position ranges for every method.
All pure driver-side (no Spark session), so the whole module runs in
seconds."""

import numpy as np
from hypothesis import given, settings, strategies as st

from bloomspark import BloomFilter, CountingBloomFilter, FilterConfig
from bloomspark.hashing import _REGISTRY, hash_positions

#: text keys incl. unicode, the 127/255 perturbation edges, empties
KEYS = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FFF),
        max_size=24,
    ),
    min_size=1,
    max_size=40,
)

CFG = FilterConfig.complete(n=500, p=0.01)
CCFG = FilterConfig.complete(n=500, p=0.01, counting_bits=16)


@settings(max_examples=30, deadline=None)
@given(KEYS)
def test_no_false_negatives(keys):
    bf = BloomFilter(CFG)
    bf.add_all(keys)
    assert bool(bf.contains_all(keys).all())


@settings(max_examples=25, deadline=None)
@given(KEYS, KEYS)
def test_union_intersect_monotonicity(a, b):
    fa, fb = BloomFilter(CFG), BloomFilter(CFG)
    fa.add_all(a)
    fb.add_all(b)
    u = fa.union(fb)
    # union contains everything either side contains (bitwise superset)
    assert bool(u.contains_all(a).all()) and bool(u.contains_all(b).all())
    assert not np.any(np.frombuffer(fa.to_bytes(), np.uint8) & ~np.frombuffer(u.to_bytes(), np.uint8))
    # intersect is a bitwise subset of both
    i = fa.intersect(fb)
    ib = np.frombuffer(i.to_bytes(), np.uint8)
    assert not np.any(ib & ~np.frombuffer(fa.to_bytes(), np.uint8))
    assert not np.any(ib & ~np.frombuffer(fb.to_bytes(), np.uint8))
    # true intersection keys are contained (no false negatives survive AND)
    both = [k for k in a if k in set(b)]
    if both:
        assert bool(i.contains_all(both).all())


@settings(max_examples=25, deadline=None)
@given(KEYS)
def test_counting_add_remove_inverts(keys):
    cbf = CountingBloomFilter(CCFG)
    for key in keys:
        cbf.add(key)
    for key in keys:
        assert cbf.get_estimated_count(key) >= sum(1 for x in keys if x == key)
    for key in keys:
        cbf.remove(key)
    assert int(cbf.counters.sum()) == 0


@settings(max_examples=20, deadline=None)
@given(KEYS)
def test_json_and_bytes_roundtrip_identity(keys):
    bf = BloomFilter(CFG)
    bf.add_all(keys)
    assert BloomFilter.from_json(bf.to_json()) == bf
    assert BloomFilter.from_bytes(CFG, bf.to_bytes()) == bf


@settings(max_examples=20, deadline=None)
@given(KEYS, st.integers(0, 100))
def test_fast_hash_take_and_batch_invariance(keys, seed):
    """Fast-tier laws for arbitrary unicode keys: Keys.take is exact,
    hashing a row subset equals subsetting the hashes (no cross-row
    state), and xxh64 of a singleton equals its value inside any batch
    (length-group independence across the 4/8/32-byte boundaries)."""
    from bloomspark.hashing import Keys, positions_xxh64km, xxh64

    kb = Keys.from_objects(keys)
    rng = np.random.RandomState(seed)
    idx = rng.permutation(len(keys))[: max(1, len(keys) // 2)]
    sub = kb.take(idx)
    assert [sub.get(i) for i in range(len(idx))] == [kb.get(int(j)) for j in idx]
    full = positions_xxh64km(kb, 8143, 5)
    assert np.array_equal(positions_xxh64km(sub, 8143, 5), full[idx])
    h = xxh64(kb)
    for j in range(min(len(keys), 5)):
        assert xxh64(Keys.from_objects([keys[j]]))[0] == h[j]


@settings(max_examples=10, deadline=None)
@given(KEYS)
def test_all_methods_positions_in_range(keys):
    m, k = 8143, 4
    for method in sorted(_REGISTRY):
        if method == "MD2" and len(keys) > 5:
            keys = keys[:5]  # pure-Python parity tier, keep it quick
        pos = hash_positions(keys, m, k, method)
        assert pos.shape == (len(keys), k), method
        assert (np.asarray(pos, dtype=np.int64) >= 0).all(), method
        assert (np.asarray(pos, dtype=np.int64) < m).all(), method
        # determinism
        pos2 = hash_positions(keys, m, k, method)
        assert np.array_equal(np.asarray(pos), np.asarray(pos2)), method


@given(
    st.lists(
        st.tuples(st.integers(0, 8142), st.integers(1, 40)),
        min_size=0, max_size=300,
    ),
    st.sampled_from([0, 1, 10**9]),
)
@settings(max_examples=60, deadline=None)
def test_counter_accumulator_matches_naive(pairs, dense_limit):
    """_CounterAccumulator (hybrid csparse/cdense wire) must agree with
    a naive dense saturating accumulation for ANY (pos, cnt) sequence
    and ANY densification policy — sparse-vs-dense is a wire choice,
    never a semantics choice."""
    from bloomspark.build import (
        _CounterAccumulator,
        add_counting_payload,
        _COUNTING_COMPACT_ENTRIES,
    )
    from bloomspark.counting import counter_dtype, counter_max

    cfg = FilterConfig.complete(n=1000, p=0.02, counting_bits=8)
    dt, mx = counter_dtype(8), counter_max(8)

    naive = np.zeros(cfg.m, dtype=np.uint64)
    acc = _CounterAccumulator(cfg, dense_limit)
    for pos, cnt in pairs:
        acc.add_pairs(
            np.array([pos], dtype=np.int64), np.array([cnt], dtype=np.int64)
        )
        naive[pos] = min(int(naive[pos]) + cnt, mx)
    kind, nonzero, _, payload = acc.finish()
    merged = np.zeros(cfg.m, dtype=dt)
    add_counting_payload(merged, kind, payload, cfg, lambda n: None)
    assert (merged.astype(np.uint64) == naive).all()
    assert nonzero == int(np.count_nonzero(naive))
    expected_kind = (
        "cdense"
        if acc.dense is not None
        else "csparse"
    )
    assert kind == expected_kind


@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(min_value=1, max_value=10**9),
        min_size=2,
        max_size=4,
    ),
    st.floats(min_value=1.0, max_value=1e7),
)
def test_mixture_plan_decomposition_invariants(sizes, total):
    """mixture_plan: rate decomposes exactly into k + frac with
    0 <= frac < 1; expected output rows sum to the requested total;
    the default total never produces k > 0 or frac beyond the
    scarcest corpus's full use."""
    from bloomspark.pipeline import mixture_plan

    names = sorted(sizes)
    w = 1.0 / len(names)
    weights = {n: w for n in names}
    weights[names[0]] += 1.0 - sum(weights.values())  # exact sum 1.0

    plan = mixture_plan(sizes, weights, total)
    expected = 0.0
    for n in names:
        k, frac = plan[n]
        assert k >= 0 and 0.0 <= frac < 1.0
        rate = weights[n] * total / sizes[n]
        assert abs((k + frac) - rate) < 1e-9 * max(rate, 1.0)
        expected += (k + frac) * sizes[n]
    assert abs(expected - total) < 1e-6 * max(total, 1.0)

    default_plan = mixture_plan(sizes, weights)
    rates = [k + f for k, f in default_plan.values()]
    assert max(rates) <= 1.0 + 1e-12  # never upsamples


@given(st.floats(min_value=0.0, max_value=1.0), st.floats(min_value=0.0, max_value=1.0))
def test_hash_sample_threshold_monotone(f1, f2):
    """Threshold construction is monotone in the fraction — the basis
    of the sample-nesting guarantee."""
    from bloomspark.pipeline.sampling import SAMPLE_SPACE

    lo, hi = sorted((f1, f2))
    assert int(lo * SAMPLE_SPACE) <= int(hi * SAMPLE_SPACE)
