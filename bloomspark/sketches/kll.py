"""KLL quantile sketch (mergeable, vectorized).

Karnin, Lang, Liberty 2016 ("Optimal quantile approximation in
streams"): a hierarchy of compactors; level h holds items of weight
2^h; a full level sorts its buffer and promotes every other item to the
level above.  Capacities shrink geometrically with distance from the
top level (c = 2/3), giving uniform rank error ~O(1/k) with O(k log n)
space.

The compaction coin is derived deterministically from the level's
content (murmur of the byte buffer), so the same input multiset always
produces the same sketch — required for the repo's reproducible driver
oracle (merge order may still vary across cluster layouts; the rank
bound, which is what the oracle asserts, holds regardless).

State: list of float64 arrays, one per level (index = level = log2
weight).  Merge: level-wise concat, then compact back under budget.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_C = 2.0 / 3.0


class KLLSketch:
    numeric = True

    def __init__(self, k: int = 200):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = k

    # -- engine contract ----------------------------------------------------

    def describe(self) -> str:
        return f"kll(k={self.k})"

    def payload_bytes(self) -> int:
        return int(3 * self.k * 8)

    def new_state(self) -> list:
        return [np.zeros(0, dtype=np.float64)]

    def _cap(self, level: int, num_levels: int) -> int:
        return max(2, int(np.ceil(self.k * _C ** (num_levels - 1 - level))))

    def _coin(self, arr: np.ndarray) -> int:
        # deterministic coin: parity of a checksum of the level's bytes
        return zlib.adler32(arr.tobytes()) & 1

    def _compact(self, state: list) -> None:
        while True:
            H = len(state)
            budget = sum(self._cap(h, H) for h in range(H))
            if sum(len(a) for a in state) <= budget:
                return
            for h in range(H):
                if len(state[h]) >= self._cap(h, H):
                    buf = np.sort(state[h], kind="stable")
                    start = self._coin(buf)
                    promoted = buf[start::2]
                    state[h] = np.zeros(0, dtype=np.float64)
                    if h + 1 == len(state):
                        state.append(promoted.copy())
                    else:
                        state[h + 1] = np.concatenate([state[h + 1], promoted])
                    break
            else:
                return  # nothing compactable (all below cap)

    def update(self, state: list, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        state[0] = np.concatenate([state[0], values.astype(np.float64)])
        self._compact(state)

    def merge_states(self, a: list, b: list) -> list:
        H = max(len(a), len(b))
        out = []
        for h in range(H):
            xs = a[h] if h < len(a) else np.zeros(0, dtype=np.float64)
            ys = b[h] if h < len(b) else np.zeros(0, dtype=np.float64)
            out.append(np.concatenate([xs, ys]))
        self._compact(out)
        return out

    def serialize(self, state: list) -> bytes:
        header = struct.pack("<I", len(state)) + b"".join(
            struct.pack("<I", len(a)) for a in state
        )
        return header + b"".join(a.tobytes() for a in state)

    def deserialize(self, payload: bytes) -> list:
        (H,) = struct.unpack_from("<I", payload)
        sizes = struct.unpack_from(f"<{H}I", payload, 4)
        off = 4 + 4 * H
        out = []
        for n in sizes:
            out.append(
                np.frombuffer(payload, dtype=np.float64, offset=off, count=n).copy()
            )
            off += 8 * n
        return out

    # -- result API ---------------------------------------------------------

    def _weighted_items(self, state: list):
        items = []
        weights = []
        for h, arr in enumerate(state):
            if len(arr):
                items.append(arr)
                weights.append(np.full(len(arr), 2.0**h))
        if not items:
            return np.zeros(0), np.zeros(0)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def quantile(self, state: list, q: float) -> float:
        it, wt = self._weighted_items(state)
        if len(it) == 0:
            return float("nan")
        cum = np.cumsum(wt)
        target = q * cum[-1]
        i = int(np.searchsorted(cum, target))
        return float(it[min(i, len(it) - 1)])

    def quantiles(self, state: list, qs) -> list:
        return [self.quantile(state, q) for q in qs]

    def rank(self, state: list, x: float) -> float:
        """Estimated number of points <= x."""
        it, wt = self._weighted_items(state)
        if len(it) == 0:
            return 0.0
        i = int(np.searchsorted(it, x, side="right"))
        return float(wt[:i].sum())

    def total_weight(self, state: list) -> float:
        return float(sum((2.0**h) * len(a) for h, a in enumerate(state)))
