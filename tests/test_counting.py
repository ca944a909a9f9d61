"""Counting Bloom filter semantics vs exact oracles.

Mirrors the reference's CountingBFTest (random multiset vs dict oracle,
java:72-107), counter-width sweep (java:45-70), and the overflow-clamp
tests (CountingBloomFilterMemoryTest.java:214-238).
"""

import numpy as np
import pytest

from bloomspark import CountingBloomFilter, FilterConfig, merge_all_counting
from bloomspark.counting import counter_dtype, counter_max


def make(n=1000, p=0.01, c=16, **kw):
    return CountingBloomFilter(FilterConfig.complete(n=n, p=p, counting_bits=c, **kw))


def test_counting_multiset_oracle():
    # CountingBFTest.java:72-107: 100 draws of str(v % 20), exact dict oracle
    rng = np.random.RandomState(42)
    cbf = make()
    oracle = {}
    for v in rng.randint(0, 10**6, size=100):
        key = str(v % 20)
        oracle[key] = oracle.get(key, 0) + 1
        got = cbf.add_and_estimate_count(key)
        assert got == oracle[key]
    for key, cnt in oracle.items():
        assert cbf.get_estimated_count(key) == cnt
    # remove everything -> empty
    for key, cnt in oracle.items():
        for i in range(cnt):
            removed_to_absence = cbf.remove(key)
            assert removed_to_absence == (i == cnt - 1)
    assert cbf.is_empty()
    assert cbf.get_estimated_count("0") == 0


@pytest.mark.parametrize("c", [4, 8, 16, 32, 55, 64])
def test_counter_width_sweep(c):
    # CountingBFTest.java:45-70
    cbf = make(c=c)
    for i in range(min(counter_max(c), 200)):
        assert cbf.add_and_estimate_count("k") == i + 1
    assert cbf.contains("k")
    assert not cbf.contains("absent-key")


@pytest.mark.parametrize("c", [3, 7, 8, 16])
def test_overflow_clamp_and_handler(c):
    # CountingBloomFilterMemoryTest.java:214-238: clamp at 2^c - 1 + callback
    cbf = make(n=10, p=0.1, c=c)
    fired = []
    cbf.overflow_handler = lambda: fired.append(1)
    mx = counter_max(c)
    for _ in range(mx):
        cbf.add_and_estimate_count("x")
    assert cbf.get_estimated_count("x") == mx
    assert not fired
    cbf.add_and_estimate_count("x")  # overflows every one of the k counters
    assert cbf.get_estimated_count("x") == mx  # clamped, not wrapped
    assert len(fired) == cbf.config.k
    assert cbf.overflow_count == cbf.config.k


def test_remove_absent_is_noop():
    cbf = make()
    cbf.add("present")
    assert cbf.remove_and_estimate_count("missing") == 0
    assert cbf.get_estimated_count("present") == 1


def test_dtype_selection():
    assert counter_dtype(3) == np.uint8
    assert counter_dtype(8) == np.uint8
    assert counter_dtype(9) == np.uint16
    assert counter_dtype(16) == np.uint16
    assert counter_dtype(32) == np.uint32
    assert counter_dtype(64) == np.uint64
    with pytest.raises(ValueError):
        counter_dtype(65)


def test_flat_bit_view_matches_plain_filter():
    """counters > 0 packed little-endian == a plain filter with same adds."""
    from bloomspark import BloomFilter

    cfg = FilterConfig.complete(n=500, p=0.01)
    cbf = CountingBloomFilter(cfg)
    bf = BloomFilter(cfg)
    keys = [f"k{i}" for i in range(300)]
    cbf.add_batch(keys)
    bf.add_all(keys)
    assert cbf.to_bloom_filter() == bf


def test_add_batch_equals_sequential():
    keys = [f"k{i % 37}" for i in range(500)]
    a = make()
    for k in keys:
        a.add_and_estimate_count(k)
    b = make()
    b.add_batch(keys)
    assert a == b


def test_merge_is_addition():
    keys1 = [f"a{i}" for i in range(200)]
    keys2 = [f"b{i}" for i in range(200)] + keys1[:50]
    f1, f2, direct = make(), make(), make()
    f1.add_batch(keys1)
    f2.add_batch(keys2)
    direct.add_batch(keys1 + keys2)
    merged = f1.merge(f2)
    assert merged == direct
    # commutative
    assert f2.merge(f1) == merged
    # associative over three parts
    f3 = make()
    f3.add_batch(["c1", "c2"])
    assert f1.merge(f2).merge(f3) == f1.merge(f2.merge(f3))
    assert merge_all_counting([f1, f2, f3]) == f1.merge(f2).merge(f3)


def test_merge_saturates():
    a, b = make(n=10, p=0.1, c=8), make(n=10, p=0.1, c=8)
    for _ in range(200):
        a.add_and_estimate_count("x")
        b.add_and_estimate_count("x")
    merged = a.merge(b)
    assert merged.get_estimated_count("x") == 255


def test_subtract_is_distributed_remove():
    adds = [f"k{i % 10}" for i in range(100)]
    removes = [f"k{i % 10}" for i in range(50)]
    full, rem = make(), make()
    full.add_batch(adds)
    rem.add_batch(removes)
    result = full.subtract(rem)
    # exact per-key: 10 adds, 5 removes each
    for i in range(10):
        assert result.get_estimated_count(f"k{i}") == 5
    # removing everything empties the filter
    rem_all = make()
    rem_all.add_batch(adds)
    assert full.subtract(rem_all).is_empty()


def test_subtract_floors_at_zero():
    a, b = make(), make()
    a.add("x")
    b.add_batch(["x", "x", "x"])
    assert a.subtract(b).is_empty()


def test_count_map_sparse():
    cbf = make()
    cbf.add_batch(["a", "a", "b"])
    cm = cbf.get_count_map()
    assert all(v > 0 for v in cm.values())
    assert sum(cm.values()) >= 2 * cbf.config.k  # a:2 + b:1 across k positions each


def test_serde_roundtrip():
    cbf = make(c=8)
    cbf.add_batch([str(i) for i in range(100)])
    back = CountingBloomFilter.from_bytes(cbf.config, cbf.to_bytes())
    assert back == cbf
    # migrate (MigratableBloomFilter analog)
    fresh = make(c=8)
    fresh.migrate_from(cbf)
    assert fresh == cbf


def test_incompatible_merge_raises():
    a = make(c=8)
    b = make(c=16)
    with pytest.raises(ValueError):
        a.merge(b)
