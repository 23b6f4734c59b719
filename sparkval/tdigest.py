"""A compact merging t-digest for distributed quantile sketching.

Public-knowledge algorithm (Dunning & Ertl, "Computing Extremely
Accurate Quantiles Using t-Digests", arXiv:1902.04023): centroids
sized by the scale function k1(q) = delta/(2*pi) * asin(2q-1); merge
is concatenate -> sort -> greedy re-cluster, which makes partial
digests from map tasks mergeable on the reduce side — the same
partial+final shape as the reference's StripReducer (strip.rs:126-209).

Digests serialize to a flat float64 array [mean0, weight0, mean1, ...]
so they travel through Spark as ArrayType(DoubleType) columns and
merge inside vectorized UDFs. Deterministic: no RNG anywhere.
"""

from __future__ import annotations

import numpy as np

DELTA = 200.0  # compression; ~100-200 centroids, <1% rank error mid-range


def _k1(q: np.ndarray | float, delta: float = DELTA) -> np.ndarray | float:
    return delta / (2 * np.pi) * np.arcsin(2 * np.clip(q, 0.0, 1.0) - 1)


def digest_from_values(values: np.ndarray, delta: float = DELTA) -> np.ndarray:
    """Build a digest from raw values (one map-task batch)."""
    v = np.asarray(values, dtype=np.float64)
    v = v[np.isfinite(v)]
    if v.size == 0:
        return np.empty(0, dtype=np.float64)
    v.sort()
    w = np.ones_like(v)
    return _compress(v, w, delta)


def merge_digests(digests: list[np.ndarray], delta: float = DELTA) -> np.ndarray:
    """Merge serialized digests (reduce side)."""
    parts = [np.asarray(d, dtype=np.float64).reshape(-1, 2) for d in digests if len(d)]
    if not parts:
        return np.empty(0, dtype=np.float64)
    allc = np.concatenate(parts, axis=0)
    order = np.argsort(allc[:, 0], kind="stable")
    means, weights = allc[order, 0], allc[order, 1]
    return _compress(means, weights, delta)


def _compress(means: np.ndarray, weights: np.ndarray, delta: float) -> np.ndarray:
    """Greedy left-to-right re-clustering under the k1 size bound."""
    total = weights.sum()
    out_m, out_w = [], []
    cur_m, cur_w = means[0], weights[0]
    q_left = 0.0
    k_left = _k1(0.0, delta)
    for m, w in zip(means[1:], weights[1:]):
        q_right = q_left + (cur_w + w) / total
        if _k1(q_right, delta) - k_left <= 1.0:
            # merge into current centroid (weighted mean)
            cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            q_left += cur_w / total
            k_left = _k1(q_left, delta)
            cur_m, cur_w = m, w
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.column_stack([out_m, out_w]).ravel()


def quantile(digest: np.ndarray, q: float | np.ndarray) -> np.ndarray | float:
    """Estimate quantile(s) by linear interpolation between centroids."""
    d = np.asarray(digest, dtype=np.float64).reshape(-1, 2)
    if d.size == 0:
        return np.nan if np.isscalar(q) else np.full(np.shape(q), np.nan)
    means, weights = d[:, 0], d[:, 1]
    total = weights.sum()
    # cumulative weight at centroid centers
    cum = np.cumsum(weights) - weights / 2.0
    qs = np.atleast_1d(np.asarray(q, dtype=np.float64)) * total
    res = np.interp(qs, cum, means, left=means[0], right=means[-1])
    return float(res[0]) if np.isscalar(q) else res
