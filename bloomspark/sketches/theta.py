"""Theta (KMV bottom-k) distinct-count sketch with SET OPERATIONS.

The one capability HLL fundamentally lacks: besides union, a Theta
sketch supports *intersection* and *A-not-B* cardinality estimates,
because its state is a uniform random sample of the distinct hashes
below a threshold theta (Beyer et al. 2007 "On synopses for distinct-
value estimation under multiset operations"; the Apache DataSketches
"theta" family follows the same construction).  Any set expression
evaluated over the retained samples below min(theta) is itself an
unbiased estimate of the same expression over the full sets.

Construction ("QuickSelect" flavor): hash every key to a uniform
uint64; keep the distinct hashes below theta, which starts at 2^64
(keep everything).  When more than ``k`` survive, theta drops to the
(k+1)-th smallest retained hash and everything at or above it is
discarded.  Estimate = retained / (theta / 2^64).  While theta is
still 2^64 the sketch holds EVERY distinct hash, so the estimate (and
every set-op estimate) is exact — that property is what lets the
driver oracle compare against exact SQL when ``k`` exceeds the true
cardinality, with estimation-mode error bounds covered by tests.

Relative standard error in estimation mode: ~1/sqrt(k-2)
(k=4096 -> ~1.6%).

State = (theta, sorted unique uint64 array), merge = union of the
entries below min(theta) re-trimmed to k — associative, idempotent,
and byte-deterministic across partitionings (the entries are sorted,
so serialize() is order-independent).  The 64-bit item hash reuses the
repo's Guava-parity murmur3_32 two-pass construction (hll.py), fully
vectorized over Arrow key buffers — no per-row Python.

Reference parity note: the reference (Orestes-Bloomfilter) has no
theta sketch; this extends the same mergeable-partial engine
(engine.py) the north-rule family runs on.
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import Keys, murmur3_32

_TWO64 = 1 << 64


class _ThetaState:
    """Mutable sketch state: ``entries`` is a SORTED, UNIQUE uint64
    array, every value strictly below ``theta`` (a Python int in
    [1, 2^64]; 2^64 = exact mode, nothing discarded yet)."""

    __slots__ = ("theta", "entries")

    def __init__(self, theta: int, entries: np.ndarray):
        self.theta = theta
        self.entries = entries


class ThetaSketch:
    """Sketch spec for the engine (see engine.py contract)."""

    numeric = False

    def __init__(self, k: int = 4096, seed: int = 104729):
        if k < 16:
            raise ValueError("k must be >= 16")
        self.k = k
        self.seed = seed

    # -- engine contract ----------------------------------------------------

    def describe(self) -> str:
        return f"theta(k={self.k}, seed={self.seed})"

    def payload_bytes(self) -> int:
        return 16 + 8 * self.k

    def new_state(self) -> _ThetaState:
        return _ThetaState(_TWO64, np.empty(0, dtype=np.uint64))

    def _trim(self, entries: np.ndarray, theta: int) -> _ThetaState:
        """entries sorted unique; drop to <= k, lowering theta."""
        if len(entries) > self.k:
            theta = int(entries[self.k])
            entries = entries[: self.k]
        return _ThetaState(theta, entries)

    def update(self, state: _ThetaState, keys: Keys) -> None:
        h = self._hash64(keys)
        if state.theta < _TWO64:
            h = h[h < np.uint64(state.theta)]
        merged = np.unique(np.concatenate([state.entries, h]))
        new = self._trim(merged, state.theta)
        state.theta, state.entries = new.theta, new.entries

    def merge_states(self, a: _ThetaState, b: _ThetaState) -> _ThetaState:
        theta = min(a.theta, b.theta)
        ea, eb = a.entries, b.entries
        if theta < _TWO64:
            t = np.uint64(theta)
            ea, eb = ea[ea < t], eb[eb < t]
        return self._trim(np.unique(np.concatenate([ea, eb])), theta)

    def serialize(self, state: _ThetaState) -> bytes:
        # theta-1 fits uint64 (theta is in [1, 2^64])
        return (
            struct.pack("<IIQ", self.k, self.seed & 0xFFFFFFFF, state.theta - 1)
            + state.entries.tobytes()
        )

    def deserialize(self, payload: bytes) -> _ThetaState:
        k, seed, theta_m1 = struct.unpack_from("<IIQ", payload)
        if k != self.k or seed != (self.seed & 0xFFFFFFFF):
            raise ValueError(
                f"payload (k={k}, seed={seed}) does not match sketch "
                f"(k={self.k}, seed={self.seed & 0xFFFFFFFF})"
            )
        entries = np.frombuffer(payload, dtype=np.uint64, offset=16).copy()
        return _ThetaState(theta_m1 + 1, entries)

    # -- result API (via SketchHandle delegation) ---------------------------

    def estimate(self, state: _ThetaState) -> float:
        """Distinct-count estimate; exact while theta is still 2^64."""
        if state.theta >= _TWO64:
            return float(len(state.entries))
        return len(state.entries) * float(_TWO64) / float(state.theta)

    def is_exact(self, state: _ThetaState) -> bool:
        return state.theta >= _TWO64

    def retained(self, state: _ThetaState) -> int:
        return int(len(state.entries))

    def standard_error(self, state=None) -> float:
        return 1.0 / np.sqrt(max(self.k - 2, 1))

    def intersect(self, a: _ThetaState, b: _ThetaState) -> _ThetaState:
        """Sketch of A AND B — estimate() on the result is the
        intersection-cardinality estimate.  Exact in exact mode."""
        theta = min(a.theta, b.theta)
        entries = np.intersect1d(a.entries, b.entries)
        if theta < _TWO64:
            entries = entries[entries < np.uint64(theta)]
        return _ThetaState(theta, entries)

    def a_not_b(self, a: _ThetaState, b: _ThetaState) -> _ThetaState:
        """Sketch of A AND NOT B.  Exact in exact mode."""
        theta = min(a.theta, b.theta)
        ea = a.entries
        if theta < _TWO64:
            ea = ea[ea < np.uint64(theta)]
        entries = np.setdiff1d(ea, b.entries)
        return _ThetaState(theta, entries)

    # -- internals ----------------------------------------------------------

    def _hash64(self, keys: Keys) -> np.ndarray:
        lo = murmur3_32(keys, self.seed).astype(np.uint64)
        hi = murmur3_32(keys, self.seed + 1).astype(np.uint64)
        return (hi << np.uint64(32)) | lo
