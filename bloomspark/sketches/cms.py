"""Count-min sketch (mergeable, vectorized).

Cormode & Muthukrishnan 2005: a depth x width counter matrix; each item
increments one counter per row (row-seeded hash mod width); the point
estimate is the minimum over rows.  Guarantees, for N total updates:

- estimate >= true count, always (counters only over-count);
- estimate <= true + eps*N with probability >= 1 - delta, where
  eps = e/width, delta = e^-depth.

Merge = elementwise add (associative + commutative, NOT idempotent —
which is why the engine's checkpoint scheme builds each content-
addressed bucket exactly once instead of re-applying partials).

Updates are one ``np.bincount`` per (batch, row) — no per-row Python.
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import Keys, murmur3_32


class CountMinSketch:
    numeric = False

    def __init__(self, width: int = 1 << 16, depth: int = 5, seed: int = 7919):
        if width < 2 or depth < 1:
            raise ValueError("width must be >= 2, depth >= 1")
        self.width = width
        self.depth = depth
        self.seed = seed

    # -- engine contract ----------------------------------------------------

    def describe(self) -> str:
        return f"cms(width={self.width}, depth={self.depth}, seed={self.seed})"

    def payload_bytes(self) -> int:
        return self.width * self.depth * 8 + 16

    def new_state(self) -> np.ndarray:
        return np.zeros((self.depth, self.width), dtype=np.uint64)

    def _row_index(self, keys: Keys, row: int) -> np.ndarray:
        lo = murmur3_32(keys, self.seed + 2 * row).astype(np.uint64)
        hi = murmur3_32(keys, self.seed + 2 * row + 1).astype(np.uint64)
        return (((hi << np.uint64(32)) | lo) % np.uint64(self.width)).astype(np.int64)

    def update(self, state: np.ndarray, keys: Keys) -> None:
        for row in range(self.depth):
            idx = self._row_index(keys, row)
            state[row] += np.bincount(idx, minlength=self.width).astype(np.uint64)

    def merge_states(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return a + b

    def serialize(self, state: np.ndarray) -> bytes:
        return struct.pack("<II", self.depth, self.width) + state.tobytes()

    def deserialize(self, payload: bytes) -> np.ndarray:
        depth, width = struct.unpack_from("<II", payload)
        if (depth, width) != (self.depth, self.width):
            raise ValueError("payload shape mismatch")
        return (
            np.frombuffer(payload, dtype=np.uint64, offset=8)
            .reshape(self.depth, self.width)
            .copy()
        )

    # -- result API ---------------------------------------------------------

    def estimate(self, state: np.ndarray, keys) -> np.ndarray:
        """Point estimates (min over rows) for a batch of keys —
        vectorized bulk query, int64 array."""
        from ..hashing import as_keys

        kb = as_keys(keys)
        est = None
        for row in range(self.depth):
            idx = self._row_index(kb, row)
            vals = state[row][idx]
            est = vals if est is None else np.minimum(est, vals)
        return est.astype(np.int64)

    def estimate_one(self, state: np.ndarray, key) -> int:
        return int(self.estimate(state, [key])[0])

    def total(self, state: np.ndarray) -> int:
        """N = total updates (row sums are all N)."""
        return int(state[0].sum())

    def error_bound(self, state: np.ndarray) -> float:
        """eps*N additive bound (holds per query w.p. 1 - e^-depth)."""
        return float(np.e / self.width) * self.total(state)

    def inner_product(self, a: np.ndarray, b: np.ndarray) -> int:
        """Join-size / inner-product estimate (Cormode & Muthukrishnan
        §4.2): min over rows of the row dot product estimates
        ``sum_k f_A(k) * f_B(k)`` — the row count of ``A JOIN B`` on
        the sketched key.  Always an over-estimate; within
        ``eps * N_A * N_B`` w.p. ``1 - e^-depth``.  Both sketches must
        share (width, depth, seed) so row hashes align."""
        if a.shape != b.shape:
            raise ValueError("inner_product requires same-shape sketches")
        # per-row dot in object-free uint64 -> python int (no overflow)
        dots = [int(np.dot(a[row].astype(object), b[row].astype(object)))
                for row in range(self.depth)]
        return min(dots)

    def inner_product_bound(self, a: np.ndarray, b: np.ndarray) -> float:
        """The additive error bound for :meth:`inner_product`:
        eps * N_A * N_B with eps = e/width."""
        return float(np.e / self.width) * int(a[0].sum()) * int(b[0].sum())
