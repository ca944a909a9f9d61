"""t-digest quantile sketch (mergeable, vectorized).

Dunning & Ertl's merging t-digest: centroids sized by the k1 scale
function k(q) = (delta/2pi) * (asin(2q-1) + pi/2), which allows large
clusters near the median and forces tiny clusters at the tails — the
property that makes extreme quantiles accurate.

This implementation uses the fully-vectorized k-index assignment form
of the merge: sort incoming (mean, weight) points, compute each point's
mid-rank quantile, map through k(.), and aggregate points sharing a
k-cell with one ``np.add.reduceat`` — no Python loop over points.
Compression produces <= delta centroids; merging two digests is
concat + recompress (associative up to the documented rank-error
bound, asserted against exact quantiles in tests).

State: (means float64[C], weights float64[C], min, max).
"""

from __future__ import annotations

import struct

import numpy as np


def _k_index(q: np.ndarray, delta: int) -> np.ndarray:
    return (delta / (2 * np.pi)) * (np.arcsin(2.0 * q - 1.0) + np.pi / 2)


class TDigest:
    numeric = True

    def __init__(self, delta: int = 200, buffer_factor: int = 10):
        if delta < 10:
            raise ValueError("delta must be >= 10")
        self.delta = delta
        # incoming points buffer up to buffer_factor*delta before a
        # recompress — amortizes the sort
        self.buffer_limit = buffer_factor * delta

    # -- engine contract ----------------------------------------------------

    def describe(self) -> str:
        return f"tdigest(delta={self.delta})"

    def payload_bytes(self) -> int:
        return self.delta * 16 + 32

    def new_state(self) -> dict:
        return {
            "means": np.zeros(0, dtype=np.float64),
            "weights": np.zeros(0, dtype=np.float64),
            "min": np.inf,
            "max": -np.inf,
        }

    def _compress(self, means: np.ndarray, weights: np.ndarray):
        order = np.argsort(means, kind="stable")
        m = means[order]
        w = weights[order]
        total = w.sum()
        if total <= 0:
            return m[:0], w[:0]
        q_mid = (np.cumsum(w) - 0.5 * w) / total
        cell = np.floor(_k_index(q_mid, self.delta)).astype(np.int64)
        np.clip(cell, 0, self.delta - 1, out=cell)
        starts = np.nonzero(np.diff(cell, prepend=np.int64(-1)))[0]
        new_w = np.add.reduceat(w, starts)
        new_m = np.add.reduceat(m * w, starts) / new_w
        return new_m, new_w

    def update(self, state: dict, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        state["min"] = min(state["min"], float(values.min()))
        state["max"] = max(state["max"], float(values.max()))
        means = np.concatenate([state["means"], values.astype(np.float64)])
        weights = np.concatenate(
            [state["weights"], np.ones(len(values), dtype=np.float64)]
        )
        # always compress after a batch append: batches are large (Arrow
        # default ~10k rows), so the sort is already amortized
        state["means"], state["weights"] = self._compress(means, weights)

    def merge_states(self, a: dict, b: dict) -> dict:
        means = np.concatenate([a["means"], b["means"]])
        weights = np.concatenate([a["weights"], b["weights"]])
        m, w = self._compress(means, weights)
        return {
            "means": m,
            "weights": w,
            "min": min(a["min"], b["min"]),
            "max": max(a["max"], b["max"]),
        }

    def serialize(self, state: dict) -> bytes:
        n = len(state["means"])
        return (
            struct.pack("<Idd", n, state["min"], state["max"])
            + state["means"].tobytes()
            + state["weights"].tobytes()
        )

    def deserialize(self, payload: bytes) -> dict:
        n, mn, mx = struct.unpack_from("<Idd", payload)
        off = struct.calcsize("<Idd")
        means = np.frombuffer(payload, dtype=np.float64, offset=off, count=n).copy()
        weights = np.frombuffer(
            payload, dtype=np.float64, offset=off + 8 * n, count=n
        ).copy()
        return {"means": means, "weights": weights, "min": mn, "max": mx}

    # -- result API ---------------------------------------------------------

    def quantile(self, state: dict, q: float) -> float:
        """Interpolated quantile estimate (standard t-digest query:
        centroids carry half their weight on each side)."""
        m, w = state["means"], state["weights"]
        if len(m) == 0:
            return float("nan")
        total = w.sum()
        r = q * total
        mid = np.cumsum(w) - 0.5 * w
        if r <= mid[0]:
            # interpolate min .. first centroid
            span = mid[0]
            t = 0.0 if span <= 0 else r / span
            return state["min"] + t * (m[0] - state["min"])
        if r >= mid[-1]:
            span = total - mid[-1]
            t = 0.0 if span <= 0 else (r - mid[-1]) / span
            return m[-1] + t * (state["max"] - m[-1])
        i = int(np.searchsorted(mid, r))
        t = (r - mid[i - 1]) / (mid[i] - mid[i - 1])
        return float(m[i - 1] + t * (m[i] - m[i - 1]))

    def quantiles(self, state: dict, qs) -> list:
        return [self.quantile(state, q) for q in qs]

    def total_weight(self, state: dict) -> float:
        return float(state["weights"].sum())

    def rank(self, state: dict, x: float) -> float:
        """Approximate rank (number of points <= x)."""
        m, w = state["means"], state["weights"]
        if len(m) == 0:
            return 0.0
        mid = np.cumsum(w) - 0.5 * w
        if x <= state["min"]:
            return 0.0
        if x >= state["max"]:
            return float(w.sum())
        i = int(np.searchsorted(m, x))
        if i == 0:
            t = (x - state["min"]) / (m[0] - state["min"])
            return t * mid[0]
        if i == len(m):
            t = (x - m[-1]) / (state["max"] - m[-1])
            return mid[-1] + t * (w.sum() - mid[-1])
        t = (x - m[i - 1]) / (m[i] - m[i - 1])
        return float(mid[i - 1] + t * (mid[i] - mid[i - 1]))
