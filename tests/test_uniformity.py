"""Hash uniformity: chi-squared goodness-of-fit over the position
distribution — the reference's BFHashUniformity harness re-expressed
(/root/reference/src/test/java/performance/BFHashUniformity.java:29-133,
config: m=1000, k=10, alpha=0.05).

No scipy in the container, so the chi-squared critical value for
df=999 at alpha=0.001 is precomputed (Wilson-Hilferty approximation
cross-checked against published tables).  We use alpha=0.001 and three
independent-ish input families to keep the test stable while still
catching degenerate hashes (the reference observed Adler32 failing
uniformity badly — FPP 22.5% vs 1%, README.md:486).
"""

import numpy as np
import pytest

from bloomspark.hashing import hash_positions

M, K = 1000, 10
N_KEYS = 10_000
# chi2.ppf(0.999, 999) ≈ 1143.9
CHI2_CRIT_DF999_P999 = 1143.92


def chi_squared_stat(positions: np.ndarray, m: int) -> float:
    counts = np.bincount(positions.ravel(), minlength=m)
    expected = positions.size / m
    return float(((counts - expected) ** 2 / expected).sum())


def keys_random_words(seed=5):
    rng = np.random.RandomState(seed)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    return [
        "".join(letters[rng.randint(0, 26, size=rng.randint(4, 16))])
        for _ in range(N_KEYS)
    ]


@pytest.mark.parametrize(
    "method",
    ["Murmur3KirschMitzenmacher", "Murmur3", "FNVWithLCG", "MD5", "SHA256", "CRC32"],
)
def test_uniformity_random_words(method):
    pos = hash_positions(keys_random_words(), M, K, method)
    stat = chi_squared_stat(pos, M)
    assert stat < CHI2_CRIT_DF999_P999, f"{method} chi2={stat:.1f}"


@pytest.mark.parametrize("method", ["Murmur3KirschMitzenmacher", "FNVWithLCG"])
def test_uniformity_sequential_ints(method):
    """Increasing integers-as-strings — the adversarial input family the
    reference calls out for Murmur2's flaw (HashProvider.java:436-440)."""
    keys = [str(i) for i in range(N_KEYS)]
    stat = chi_squared_stat(hash_positions(keys, M, K, method), M)
    assert stat < CHI2_CRIT_DF999_P999, f"{method} chi2={stat:.1f}"


def test_observed_fpp_tracks_configured():
    """BFHashFP harness shape (insert n, probe 3n unseen): observed FPP
    within [0.5x, 2x] of configured 1% for the default hash."""
    from bloomspark import BloomFilter, FilterConfig
    from bloomspark.filter import set_positions

    cfg = FilterConfig.complete(n=30_000, p=0.01)
    bf = BloomFilter(cfg)
    set_positions(
        bf.bits,
        hash_positions([f"in{i}" for i in range(30_000)], cfg.m, cfg.k, cfg.hash_method),
    )
    probes = [f"out{i}" for i in range(90_000)]
    fp = int(bf.contains_all(probes).sum())
    observed = fp / 90_000
    assert 0.005 <= observed <= 0.02, f"observed FPP {observed:.4%}"
