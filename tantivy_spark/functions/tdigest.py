"""Mergeable t-digest quantile sketch (numpy, merging variant).

Reference parity target: the aggregation tree merges per-segment
partial percentile sketches upward (IntermediateAggregationResults,
/root/reference/src/aggregation/mod.rs:119-128; the reference uses a
sketch family for percentiles the same way it uses DataSketches HLL for
cardinality).  Spark's built-in ``percentile_approx`` is KLL-family but
does not expose its serialized state, so THIS digest is the repo's
cross-batch mergeable form: build partials per partition/batch, persist
the few-hundred-byte sketches, merge them later without rescanning.

Algorithm: the t-digest merging variant (Dunning & Ertl, "Computing
extremely accurate quantiles using t-digests", arXiv:1902.04023) — a
published algorithm, implemented here from the paper's description:
sorted centroids are greedily coalesced while the potential (k1) scale
function allows, giving small centroids near the tails and coarse ones
in the middle; merging two digests is concatenate + re-compress, which
is associative up to the usual t-digest accuracy bounds.

Serialized form: little-endian header (magic ``TDG1``, float64 delta,
int64 n) + n float64 means + n float64 weights.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"TDG1"


def _k1(q: np.ndarray, delta: float) -> np.ndarray:
    """The paper's k1 scale function: delta/(2*pi) * asin(2q-1)."""
    return (delta / (2.0 * np.pi)) * np.arcsin(2.0 * np.clip(q, 0.0, 1.0) - 1.0)


def _compress(means: np.ndarray, weights: np.ndarray,
              delta: float) -> tuple[np.ndarray, np.ndarray]:
    """Greedy left-to-right merge pass over weight-sorted centroids."""
    if means.size == 0:
        return means, weights
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list[float] = [float(means[0])]
    out_w: list[float] = [float(weights[0])]
    w_so_far = 0.0
    for m, w in zip(means[1:], weights[1:]):
        q0 = w_so_far / total
        q2 = (w_so_far + out_w[-1] + w) / total
        if _k1(np.array([q2]), delta)[0] - _k1(np.array([q0]), delta)[0] <= 1.0:
            # coalesce into the open centroid (weighted mean)
            nw = out_w[-1] + w
            out_m[-1] += (m - out_m[-1]) * (w / nw)
            out_w[-1] = nw
        else:
            w_so_far += out_w[-1]
            out_m.append(float(m))
            out_w.append(float(w))
    return np.asarray(out_m), np.asarray(out_w)


def build(values, delta: float = 200.0) -> bytes:
    """Serialize a t-digest of ``values`` (any 1-d numeric array)."""
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    m, w = _compress(v, np.ones_like(v), delta)
    return serialize(m, w, delta)


def serialize(means: np.ndarray, weights: np.ndarray, delta: float) -> bytes:
    head = _MAGIC + struct.pack("<dq", float(delta), int(means.size))
    return head + means.astype("<f8").tobytes() + \
        weights.astype("<f8").tobytes()


def deserialize(blob: bytes) -> tuple[np.ndarray, np.ndarray, float]:
    if blob[:4] != _MAGIC:
        raise ValueError("not a TDG1 t-digest blob")
    delta, n = struct.unpack_from("<dq", blob, 4)
    off = 4 + 16
    means = np.frombuffer(blob, dtype="<f8", count=n, offset=off)
    weights = np.frombuffer(blob, dtype="<f8", count=n, offset=off + 8 * n)
    return means.copy(), weights.copy(), float(delta)


def merge(blobs) -> bytes:
    """Merge serialized digests: concatenate centroids, re-compress."""
    ms, ws, delta = [], [], 200.0
    for b in blobs:
        if b is None:
            continue
        m, w, delta = deserialize(bytes(b))
        ms.append(m)
        ws.append(w)
    if not ms:
        return serialize(np.empty(0), np.empty(0), delta)
    m, w = _compress(np.concatenate(ms), np.concatenate(ws), delta)
    return serialize(m, w, delta)


def quantile(blob: bytes, qs) -> np.ndarray:
    """Estimate quantiles from a serialized digest by interpolating the
    centroid cumulative-weight curve (paper section 2.9)."""
    means, weights, _ = deserialize(bytes(blob))
    qs = np.atleast_1d(np.asarray(qs, dtype=np.float64))
    if means.size == 0:
        return np.full(qs.shape, np.nan)
    if means.size == 1:
        return np.full(qs.shape, means[0])
    total = weights.sum()
    # centroid midpoints in cumulative-weight space
    cum = np.cumsum(weights) - weights / 2.0
    pos = np.clip(qs, 0.0, 1.0) * total
    return np.interp(pos, cum, means)
