"""Optimal Bloom filter sizing math and filter configuration.

Re-expresses the reference's ``FilterBuilder`` parameter model
(/root/reference/src/main/java/orestes/bloomfilter/FilterBuilder.java:435-449,596-634)
as a frozen dataclass + pure functions.  All formulas are kept
bit-for-bit identical to the Java code (same ``ceil``, same float
arithmetic) so the golden vectors from the reference test-suite hold:
``n=1000, p=0.02 -> m=8143, k=6``
(reference test CountingBloomFilterMemoryTest.java:60-67).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace
from typing import Optional

#: Hash method registry keys (see bloomspark.hashing).  Names mirror the
#: reference's HashProvider.HashMethod enum (HashProvider.java:411-504).
HASH_METHODS = (
    "RNG",
    "CarterWegman",
    "CRC32",
    "Adler32",
    "Murmur2",
    "Murmur3",
    "Murmur3KirschMitzenmacher",
    "FNVWithLCG",
    "MD2",
    "MD5",
    "SHA1",
    "SHA256",
    "SHA384",
    "SHA512",
    # Spark-native fast tier (no reference analog): positions computable
    # as JVM expressions — see bloomspark/fast.py and hashing.xxh64.
    "XXHash64KM",
)

#: Methods with a 64-bit position path (extended-m mode support).
_EXTENDED_METHODS = ("Murmur3KirschMitzenmacher", "XXHash64KM")

DEFAULT_HASH_METHOD = "Murmur3KirschMitzenmacher"  # FilterBuilder.java:40-41
DEFAULT_COUNTING_BITS = 16  # FilterBuilder.java:33


def optimal_m(n: int, p: float) -> int:
    """Optimal number of bits m given expected elements n and FPP p.

    m = ceil(-n * ln(p) / (ln 2)^2)   (FilterBuilder.java:596-598)
    """
    return int(math.ceil(-1 * (n * math.log(p)) / math.pow(math.log(2), 2)))


def optimal_k(n: int, m: int) -> int:
    """Optimal number of hash functions k given n and m.

    k = ceil(ln(2) * m / n)   (FilterBuilder.java:608-610)
    """
    return int(math.ceil((math.log(2) * m) / n))


def optimal_n(k: int, m: int) -> int:
    """Number of elements for which (m, k) is optimal.

    n = ceil(ln(2) * m / k)   (FilterBuilder.java:620-622)
    """
    return int(math.ceil((math.log(2) * m) / k))


def optimal_p(k: int, m: int, inserted_elements: float) -> float:
    """Best-case false positive probability after inserting x elements.

    p = (1 - e^(-k*x/m))^k   (FilterBuilder.java:632-634)
    """
    return math.pow(1 - math.exp(-k * inserted_elements / float(m)), k)


def next_prime(x: int) -> int:
    """Smallest prime >= x (deterministic Miller-Rabin over the first
    12 prime bases — exact for all 64-bit inputs).  Used by
    ``FilterConfig.complete(prime_m=True)`` to avoid Kirsch-
    Mitzenmacher position cycles (see that docstring)."""

    def _is_prime(n: int) -> bool:
        if n < 2:
            return False
        for q in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
            if n % q == 0:
                return n == q
        d, s = n - 1, 0
        while d % 2 == 0:
            d //= 2
            s += 1
        for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
            v = pow(a, d, n)
            if v in (1, n - 1):
                continue
            for _ in range(s - 1):
                v = v * v % n
                if v == n - 1:
                    break
            else:
                return False
        return True

    while not _is_prime(x):
        x += 1
    return x


@dataclass(frozen=True)
class FilterConfig:
    """Completed, immutable filter configuration.

    The Spark analog of the reference's completed ``FilterBuilder``
    (FilterBuilder.java:27-49).  Use :meth:`FilterConfig.complete`
    to infer missing parameters exactly like ``FilterBuilder.complete()``
    (FilterBuilder.java:435-449).
    """

    m: int
    k: int
    n: int
    p: float
    counting_bits: int = DEFAULT_COUNTING_BITS
    hash_method: str = DEFAULT_HASH_METHOD
    name: str = ""
    #: 64-bit mode: lifts the Java-int parity cap on m (2^31-1,
    #: FilterBuilder.java:31) for filters sized beyond what the
    #: reference can represent (10^12 keys at p=0.01 need ~10^13 bits).
    #: Positions travel as uint64 ('sparse64' partials); only the
    #: Murmur3KirschMitzenmacher method has a 64-bit position path.
    extended: bool = False

    @classmethod
    def complete(
        cls,
        n: Optional[int] = None,
        p: Optional[float] = None,
        m: Optional[int] = None,
        k: Optional[int] = None,
        counting_bits: int = DEFAULT_COUNTING_BITS,
        hash_method: str = DEFAULT_HASH_METHOD,
        name: str = "",
        extended: bool = False,
        prime_m: bool = False,
    ) -> "FilterConfig":
        """Infer missing parameters (FilterBuilder.complete, FilterBuilder.java:435-449).

        ``prime_m=True`` rounds the sized m up to the next prime.  Why:
        Kirsch-Mitzenmacher positions ``(a + i*b) mod m`` repeat with
        period ``m / gcd(b, m)``, so a composite m lets some keys fold
        their k positions onto a short cycle — membership is unaffected
        (the folded positions are still set/tested consistently), but a
        COUNTING filter's min-selection estimate then reads
        cycle-multiplicity x the true count for those keys.  The
        reference inherits the same quirk (HashProvider.java's KM loop);
        a prime m confines it to ``b % m == 0`` (probability ~1/m per
        key).  Rounding up only lowers the realized FPP.  Off by
        default for reference bit-parity; turn it on for counting
        filters whose estimates feed thresholds."""
        if m is None and n is not None and p is not None:
            m = optimal_m(n, p)
            if prime_m:
                m = next_prime(m)
        elif prime_m and m is not None:
            m = next_prime(m)
        if k is None and n is not None and m is not None:
            k = optimal_k(n, m)
        if m is None or k is None:
            raise ValueError(
                "Neither (n, p) nor (m, k) were specified."
            )
        if n is None:
            n = optimal_n(k, m)
        if p is None:
            p = optimal_p(k, m, n)
        if hash_method not in HASH_METHODS:
            raise ValueError(f"Unknown hash method {hash_method!r}; one of {HASH_METHODS}")
        if m <= 0 or k <= 0:
            raise ValueError(f"m and k must be positive (got m={m}, k={k})")
        if m > 2**31 - 1 and not extended:
            # reference parity: FilterBuilder caps m at Java int
            # (FilterBuilder.java:31); uint32 position arrays.  The
            # extended=True escape hatch lifts the cap (uint64 path).
            raise ValueError(
                f"m={m} exceeds 2^31-1 (Java int parity cap); "
                "pass extended=True for the 64-bit mode, or shard"
            )
        if extended:
            if hash_method not in _EXTENDED_METHODS:
                raise ValueError(
                    "extended (64-bit m) mode supports only the "
                    f"{_EXTENDED_METHODS} hash methods"
                )
            if m > 2**46:
                raise ValueError(f"m={m} exceeds the extended-mode cap 2^46")
        return cls(
            m=m,
            k=k,
            n=n,
            p=p,
            counting_bits=counting_bits,
            hash_method=hash_method,
            name=name,
            extended=extended,
        )

    def is_compatible_to(self, other: "FilterConfig") -> bool:
        """Mergeability check: same m, k, hash method (FilterBuilder.java:584-586)."""
        return (
            self.m == other.m
            and self.k == other.k
            and self.hash_method == other.hash_method
        )

    def false_positive_probability(self, inserted_elements: float) -> float:
        """FPP after x insertions (BloomFilter.java:244-246)."""
        return optimal_p(self.k, self.m, inserted_elements)

    def bits_per_element(self, n: Optional[int] = None) -> float:
        """m / n (BloomFilter.java:265-267)."""
        n = self.n if n is None else n
        return self.m / float(n)

    def bit_zero_probability(self, n: Optional[int] = None) -> float:
        """(1 - 1/m)^(k*n) (BloomFilter.java:273-277)."""
        n = self.n if n is None else n
        return math.pow(1 - 1.0 / self.m, self.k * n)

    @property
    def num_bytes(self) -> int:
        """Bytes needed to hold m bits."""
        return (self.m + 7) // 8

    def with_name(self, name: str) -> "FilterConfig":
        return replace(self, name=name)

    def to_dict(self) -> dict:
        return {
            "m": self.m,
            "k": self.k,
            "n": self.n,
            "p": self.p,
            "counting_bits": self.counting_bits,
            "hash_method": self.hash_method,
            "name": self.name,
            "extended": self.extended,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "FilterConfig":
        return cls(
            m=int(d["m"]),
            k=int(d["k"]),
            n=int(d["n"]),
            p=float(d["p"]),
            counting_bits=int(d.get("counting_bits", DEFAULT_COUNTING_BITS)),
            hash_method=str(d.get("hash_method", DEFAULT_HASH_METHOD)),
            name=str(d.get("name", "")),
            extended=bool(d.get("extended", False)),
        )
