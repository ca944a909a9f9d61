"""Sizing-math goldens from the reference test suite.

Reference anchors:
- n=1000, p=0.02 -> m=8143, k=6
  (test/memory/CountingBloomFilterMemoryTest.java:60-67)
- optimalK(6666, 10000) = 2 and the README FPP walk-through
  (/root/reference/README.md:184-224)
"""

import math

import pytest

from bloomspark.params import (
    FilterConfig,
    optimal_k,
    optimal_m,
    optimal_n,
    optimal_p,
)


def test_golden_m_k():
    assert optimal_m(1000, 0.02) == 8143
    assert optimal_k(1000, 8143) == 6


def test_optimal_k_readme_golden():
    # README.md:213-224: expectedElements=6666, size=10000 -> hashes=2
    assert optimal_k(6666, 10000) == 2


def test_optimal_n_roundtrip():
    m = optimal_m(1000, 0.02)
    k = optimal_k(1000, m)
    n = optimal_n(k, m)
    # n for which (m,k) is optimal should be close to the original n
    assert abs(n - 1000) / 1000 < 0.10


def test_optimal_p_formula():
    # p = (1 - e^(-k*n/m))^k
    p = optimal_p(6, 8143, 1000)
    assert p == pytest.approx(math.pow(1 - math.exp(-6 * 1000 / 8143.0), 6))
    assert p < 0.02 * 1.3  # completed config respects requested bound loosely


def test_readme_fpp_walkthrough():
    # README.md:184-189: (n=1000, p=0.1), after 303 inserts
    cfg = FilterConfig.complete(n=1000, p=0.1)
    assert cfg.false_positive_probability(303) * 700 == pytest.approx(1.74, abs=0.05)


def test_complete_infers_all():
    cfg = FilterConfig.complete(n=1000, p=0.02)
    assert (cfg.m, cfg.k, cfg.n) == (8143, 6, 1000)
    assert cfg.p == 0.02

    cfg2 = FilterConfig.complete(m=8143, k=6)
    assert cfg2.n == optimal_n(6, 8143)
    assert cfg2.p == pytest.approx(optimal_p(6, 8143, cfg2.n))


def test_complete_underspecified_raises():
    with pytest.raises(ValueError):
        FilterConfig.complete(n=1000)
    with pytest.raises(ValueError):
        FilterConfig.complete(p=0.01)


def test_compatibility():
    a = FilterConfig.complete(n=1000, p=0.02)
    b = FilterConfig.complete(n=1000, p=0.02)
    c = FilterConfig.complete(n=1000, p=0.02, hash_method="MD5")
    d = FilterConfig.complete(n=2000, p=0.02)
    assert a.is_compatible_to(b)
    assert not a.is_compatible_to(c)
    assert not a.is_compatible_to(d)


def test_dict_roundtrip():
    cfg = FilterConfig.complete(n=500, p=0.05, counting_bits=8, hash_method="MD5", name="x")
    assert FilterConfig.from_dict(cfg.to_dict()) == cfg


def test_unknown_hash_method_rejected():
    with pytest.raises(ValueError):
        FilterConfig.complete(n=10, p=0.1, hash_method="NotAHash")


def test_prime_m_sizing():
    """complete(prime_m=True) rounds m up to the next prime (killing
    Kirsch-Mitzenmacher position cycles, see the complete() docstring)
    without weakening the FPP bound; explicit m also rounds."""
    from bloomspark.params import FilterConfig, next_prime, optimal_m, optimal_p

    assert next_prime(2) == 2 and next_prime(8) == 11
    assert next_prime(12940) == 12941  # the composite m the r5 test hit

    cfg = FilterConfig.complete(n=300, p=1e-9, prime_m=True)
    m0 = optimal_m(300, 1e-9)
    assert cfg.m >= m0 and next_prime(cfg.m) == cfg.m
    assert optimal_p(cfg.k, cfg.m, 300) <= 1e-9 * 1.01  # bound not weakened
    plain = FilterConfig.complete(n=300, p=1e-9)
    assert plain.m == m0  # default path unchanged (bit parity)

    cfg2 = FilterConfig.complete(m=1000, k=5, prime_m=True)
    assert cfg2.m == 1009
