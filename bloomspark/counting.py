"""Counting Bloom filter over numpy unsigned counter arrays.

Re-expresses the reference's counting family
(/root/reference/src/main/java/orestes/bloomfilter/CountingBloomFilter.java,
 .../memory/CountingBloomFilterMemory.java and the typed
 CountingBloomFilter{8,16,32,64}.java variants) as one numpy-backed class:
the counter vector is a uint{8,16,32,64} array of length m, chosen as the
narrowest dtype that holds ``counting_bits`` bits (the analog of the
factory dispatch at FilterBuilder.java:410-427).

Semantics follow the typed variants (CountingBloomFilter16.java:22-46):
increment saturates at 2^c - 1 (invoking the overflow handler,
CountingBloomFilterMemory.setOverflowHandler java:287-289), decrement
floors at 0; frequency estimate is the minimum over the k counters
(Minimum Selection / spectral Bloom filters,
CountingBloomFilter.getEstimatedCount java:63-73).

Deliberate extension beyond the reference: ``merge`` (element-wise
saturating add) and ``subtract`` — the reference leaves counting
union/intersect unimplemented (CountingBloomFilterMemory.java:207-217),
but the distributed build depends on counter mergeability, and
element-wise add is the standard mergeable-CBF construction.  This is
also what makes *distributed remove* possible: deletions aggregate into
a second counter sketch merged with negative weight.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from .filter import BloomFilter
from .hashing import hash_positions
from .params import FilterConfig


def counter_dtype(counting_bits: int) -> np.dtype:
    """Narrowest unsigned dtype holding ``counting_bits`` bits
    (FilterBuilder.java:415-425 dispatch analog)."""
    if counting_bits <= 0 or counting_bits > 64:
        raise ValueError(f"counting_bits must be in [1, 64], got {counting_bits}")
    for bits, dt in ((8, np.uint8), (16, np.uint16), (32, np.uint32), (64, np.uint64)):
        if counting_bits <= bits:
            return np.dtype(dt)
    raise AssertionError


def counter_max(counting_bits: int) -> int:
    """Saturation ceiling 2^c - 1 (e.g. CountingBloomFilter16.java:12)."""
    return (1 << counting_bits) - 1


class CountingBloomFilter:
    """Counting Bloom filter: uint counters + derived flat bit view."""

    __slots__ = ("config", "counters", "overflow_handler", "_overflows")

    def __init__(self, config: FilterConfig, counters: Optional[np.ndarray] = None):
        self.config = config
        dt = counter_dtype(config.counting_bits)
        if counters is None:
            counters = np.zeros(config.m, dtype=dt)
        else:
            counters = np.asarray(counters, dtype=dt).copy()
            if counters.size != config.m:
                raise ValueError(f"counter array must have length m={config.m}")
        self.counters = counters
        self.overflow_handler = None
        self._overflows = 0

    # -- hashing ------------------------------------------------------------

    def hash_positions(self, key) -> List[int]:
        return [int(x) for x in
                hash_positions([key], self.config.m, self.config.k, self.config.hash_method)[0]]

    def _positions(self, keys: Sequence) -> np.ndarray:
        return hash_positions(keys, self.config.m, self.config.k, self.config.hash_method)

    @property
    def max_count(self) -> int:
        return counter_max(self.config.counting_bits)

    def _on_overflow(self, n: int = 1) -> None:
        self._overflows += n
        if self.overflow_handler is not None:
            for _ in range(n):
                self.overflow_handler()

    @property
    def overflow_count(self) -> int:
        """Number of saturating increments observed (per-partition metric)."""
        return self._overflows

    # -- element ops ---------------------------------------------------------

    def add_and_estimate_count(self, key) -> int:
        """Increment the k counters, return min post-increment value
        (CountingBloomFilterMemory.addAndEstimateCountRaw java:60-72).
        Duplicate positions within one key's hash set are incremented once
        per occurrence, and the running min sees each intermediate value,
        matching the reference's sequential IntStream semantics."""
        pos = self._positions([key])[0]
        mx = self.max_count
        best = None
        for p in pos:
            c = int(self.counters[p])
            if c >= mx:
                self._on_overflow()
                val = mx
            else:
                self.counters[p] = c + 1
                val = c + 1
            best = val if best is None else min(best, val)
        return int(best)

    def add(self, key) -> bool:
        """True iff the element was (probably) newly added
        (CountingBloomFilter.addRaw java:28-31: estimate == 1)."""
        return self.add_and_estimate_count(key) == 1

    def add_all(self, keys: Sequence) -> List[bool]:
        return [self.add(k) for k in keys]

    def remove_and_estimate_count(self, key) -> int:
        """Decrement (floored at 0) iff contained; return min post-decrement
        (CountingBloomFilterMemory.removeAndEstimateCountRaw java:76-92,
        typed decrement CountingBloomFilter16.java:31-35)."""
        if not self.contains(key):
            return 0
        pos = self._positions([key])[0]
        best = None
        for p in pos:
            c = int(self.counters[p])
            val = c - 1 if c > 0 else 0
            self.counters[p] = val
            best = val if best is None else min(best, val)
        return int(best)

    def remove(self, key) -> bool:
        """True iff the element is absent after removal
        (CountingBloomFilter.removeRaw java:39-41)."""
        return self.remove_and_estimate_count(key) <= 0

    def remove_all(self, keys: Sequence) -> List[bool]:
        return [self.remove(k) for k in keys]

    def get_estimated_count(self, key) -> int:
        """Minimum-Selection frequency estimate (java:203-205)."""
        pos = self._positions([key])[0]
        return int(self.counters[pos].min())

    def get_estimated_counts(self, keys: Sequence) -> np.ndarray:
        """Vectorized bulk frequency estimates -> int64 ndarray (the
        pipelined bulk analog of redis/CountingBloomFilterRedis.java:159-165)."""
        pos = self._positions(keys)
        return self.counters[pos].min(axis=1).astype(np.int64)

    # -- bulk vectorized mutation (the distributed-build primitive) ----------

    def add_batch(self, keys: Sequence) -> None:
        """Saturating bulk add: one scatter-add over all k*N positions."""
        pos = self._positions(keys)
        self.increment_positions(pos.ravel())

    def increment_positions(self, flat_positions: np.ndarray, weight: int = 1) -> None:
        """Add ``weight`` per occurrence of each position, saturating."""
        counts = np.bincount(flat_positions, minlength=self.config.m)
        if weight != 1:
            counts = counts * weight
        add_saturating(self.counters, counts, self.max_count, self._on_overflow)

    # -- membership ----------------------------------------------------------

    def contains(self, key) -> bool:
        return bool(self.contains_all([key])[0])

    def contains_all(self, keys: Sequence) -> np.ndarray:
        pos = self._positions(keys)
        return (self.counters[pos] > 0).all(axis=1)

    def is_empty(self) -> bool:
        return not self.counters.any()

    def clear(self) -> None:
        self.counters[:] = 0

    # -- views / estimates -----------------------------------------------------

    def to_bloom_filter(self) -> BloomFilter:
        """Flat bit view: bit i set iff counter i > 0 — the reference keeps
        this materialized beside the counters
        (CountingBloomFilterMemory.java:19-20,64-66); we derive on demand."""
        bits = np.packbits(self.counters > 0, bitorder="little")
        return BloomFilter.from_bytes(self.config, bits.tobytes())

    def get_count_map(self) -> Dict[int, int]:
        """Sparse {position: count>0} (getCountMap java:40-57)."""
        nz = np.nonzero(self.counters)[0]
        return {int(i): int(self.counters[i]) for i in nz}

    def cardinality(self) -> int:
        return int(np.count_nonzero(self.counters))

    def get_estimated_population(self) -> float:
        from .filter import population_estimate

        return population_estimate(self.cardinality(), self.config.m, self.config.k)

    # -- merge algebra (extension; see module docstring) -----------------------

    def _check_compatible(self, other: "CountingBloomFilter") -> None:
        if not self.config.is_compatible_to(other.config) or (
            self.config.counting_bits != other.config.counting_bits
        ):
            raise ValueError(f"Incompatible counting filters: {self.config} vs {other.config}")

    def merge(self, other: "CountingBloomFilter") -> "CountingBloomFilter":
        """Element-wise saturating add — associative & commutative up to
        saturation; the final-agg step of the distributed counting build."""
        self._check_compatible(other)
        out = CountingBloomFilter(self.config, self.counters)
        add_saturating(out.counters, other.counters, out.max_count, out._on_overflow)
        return out

    def subtract(self, other: "CountingBloomFilter") -> "CountingBloomFilter":
        """Element-wise subtract floored at 0 — distributed remove merges a
        'removals' sketch with negative weight (the Spark replacement for
        the reference's Redis WATCH/MULTI retry loop,
        redis/CountingBloomFilterRedis.java:114-156)."""
        self._check_compatible(other)
        out = CountingBloomFilter(self.config, self.counters)
        np.subtract(
            out.counters,
            np.minimum(out.counters, other.counters.astype(out.counters.dtype)),
            out=out.counters,
        )
        return out

    # -- serde ------------------------------------------------------------------

    def to_bytes(self) -> bytes:
        return self.counters.tobytes()

    @classmethod
    def from_bytes(cls, config: FilterConfig, data: bytes) -> "CountingBloomFilter":
        dt = counter_dtype(config.counting_bits)
        return cls(config, np.frombuffer(data, dtype=dt))

    def clone(self) -> "CountingBloomFilter":
        return CountingBloomFilter(self.config, self.counters)

    def migrate_from(self, other: "CountingBloomFilter") -> "CountingBloomFilter":
        """Copy counts into a (compatible) fresh instance
        (MigratableBloomFilter.java:9-17)."""
        self._check_compatible(other)
        self.counters[:] = other.counters
        return self

    def __eq__(self, other) -> bool:
        if not isinstance(other, CountingBloomFilter):
            return NotImplemented
        return (
            self.config.is_compatible_to(other.config)
            and self.config.counting_bits == other.config.counting_bits
            and np.array_equal(self.counters, other.counters)
        )

    def __hash__(self):
        return hash((self.config.m, self.config.k, self.counters.tobytes()))

    def __repr__(self) -> str:
        return (
            f"CountingBloomFilter(m={self.config.m}, k={self.config.k}, "
            f"c={self.config.counting_bits}, nonzero={self.cardinality()})"
        )


def add_saturating(dest: np.ndarray, delta: np.ndarray, max_count: int, on_overflow=None) -> None:
    """dest = min(dest + delta, max_count), element-wise, overflow-counted.

    Works in uint64 to avoid intermediate wraparound for any counter dtype.
    """
    wide = dest.astype(np.uint64) + delta.astype(np.uint64)
    over = wide > np.uint64(max_count)
    n_over = int(np.count_nonzero(over))
    if n_over and on_overflow is not None:
        on_overflow(n_over)
    np.minimum(wide, np.uint64(max_count), out=wide)
    dest[:] = wide.astype(dest.dtype)


def merge_all_counting(filters) -> CountingBloomFilter:
    it = iter(filters)
    try:
        acc = next(it).clone()
    except StopIteration:
        raise ValueError("merge_all_counting needs at least one filter") from None
    for f in it:
        acc._check_compatible(f)
        add_saturating(acc.counters, f.counters, acc.max_count, acc._on_overflow)
    return acc
