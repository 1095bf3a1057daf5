"""Descriptor matching: brute-force kNN on the MXU + ratio test + cross-check.

TPU-native replacement for cv2.BFMatcher / FLANN
(reference: feature_matchers.py:25-252). Design notes:

- The distance matrix IS a matmul: ``||a-b||^2 = |a|^2 + |b|^2 - 2 a.b``, so
  the O(N*M*D) work lands on the MXU. At the reference's operating point
  (2-4k descriptors) exact kNN on TPU beats any approximate KD-tree/LSH
  structure, so the FLANN matcher is exact here by design (SURVEY §2.6).
- Binary descriptors are stored as +-1 floats; Hamming distance is recovered
  from the dot product as ``(D - a.b) / 2`` — also a single MXU matmul,
  replacing XOR+popcount.
- Top-2 (for Lowe's ratio test, feature_matchers.py:129-148) is two masked
  min-reductions over the distance matrix — no sort.
- Everything is static-shape: invalid (padded) rows/columns are forced to
  +inf distance and masked out of the result.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tpu3drec.core.types import Features, Matches, ScoreType, DescriptorKind

_INF = np.float32(3.4e38)


def distance_matrix(desc1: jnp.ndarray, desc2: jnp.ndarray,
                    metric: str = "l2") -> jnp.ndarray:
    """(N, D), (M, D) -> (N, M) distances.

    metric='l2': Euclidean (not squared — matches cv2.BFMatcher NORM_L2).
    metric='l2_int8': Euclidean over 8-bit-scale descriptors (SIFT-family,
    values 0..255 like cv2's uint8 storage): descriptors are rounded,
    shifted by -128 (distance-invariant) and multiplied as int8 on the
    MXU with EXACT int32 accumulation — both faster than a
    Precision.HIGHEST f32 matmul (which runs 6 bf16 passes) and free of
    its rounding, at cv2's own quantization.
    metric='hamming_pm1': descriptors are +-1 encodings of bits; returns
    bit-flip counts.
    """
    d = desc1.shape[1]
    if metric == "l2_int8":
        q1 = (jnp.round(jnp.clip(desc1, 0.0, 255.0)) - 128.0) \
            .astype(jnp.int8)
        q2 = (jnp.round(jnp.clip(desc2, 0.0, 255.0)) - 128.0) \
            .astype(jnp.int8)
        dot = jax.lax.dot_general(
            q1, q2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        n1 = jnp.sum(jnp.square(q1.astype(jnp.int32)), axis=1,
                     keepdims=True)
        n2 = jnp.sum(jnp.square(q2.astype(jnp.int32)), axis=1,
                     keepdims=True)
        d2 = n1 + n2.T - 2 * dot
        return jnp.sqrt(jnp.maximum(d2, 0).astype(jnp.float32))
    if metric == "hamming_pm1":
        # +-1 bit encodings are exact in int8; int32-accumulated MXU
        # matmul gives exact bit-flip counts at int8 speed
        q1 = desc1.astype(jnp.int8)
        q2 = desc2.astype(jnp.int8)
        dot = jax.lax.dot_general(
            q1, q2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (d - dot).astype(jnp.float32) * 0.5
    # HIGHEST precision: TPU matmuls default to bfloat16, which flips
    # near-tie nearest neighbours and breaks ratio-test parity with cv2.
    dot = jnp.dot(desc1, desc2.T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    if metric == "l2":
        sq1 = jnp.sum(desc1 * desc1, axis=1, keepdims=True)
        sq2 = jnp.sum(desc2 * desc2, axis=1, keepdims=True)
        d2 = sq1 + sq2.T - 2.0 * dot
        return jnp.sqrt(jnp.maximum(d2, 0.0))
    raise ValueError(f"unknown metric {metric!r}")


def _top2_min(dist: jnp.ndarray, big=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Row-wise two smallest entries: returns idx (N, 2), val (N, 2).

    The winner is masked out with an iota compare (fuses into the second
    reduction pass) rather than a scatter — `.at[rows, i1].set(inf)`
    rewrites the whole (N, M) matrix through TPU scatter lowering.
    `big` is the +inf stand-in for dist's dtype (defaults to f32 _INF)."""
    big = _INF if big is None else big
    i1 = jnp.argmin(dist, axis=1)
    v1 = jnp.min(dist, axis=1)
    cols = lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    masked = jnp.where(cols == i1[:, None], big, dist)
    i2 = jnp.argmin(masked, axis=1)
    v2 = jnp.min(masked, axis=1)
    return jnp.stack([i1, i2], axis=1), jnp.stack([v1, v2], axis=1)


def _raw_comparable(desc1: jnp.ndarray, desc2: jnp.ndarray, metric: str):
    """(raw (N, M) matrix, big pad value, post(val) -> true distance).

    `raw` preserves the distance ORDER but skips the monotonic tail
    transforms (sqrt / int->float casts), so the top-2 reductions run on
    the cheapest exact representation and `post` touches only the two
    winner columns — two fewer full passes over the N x M matrix
    (sqrt + convert were ~400M-element passes each at bench scale).
    int32 squared distances also break near-ties exactly where an f32
    sqrt could round two distinct d^2 to the same float.
    """
    d = desc1.shape[1]
    if metric == "l2_int8":
        q1 = (jnp.round(jnp.clip(desc1, 0.0, 255.0)) - 128.0) \
            .astype(jnp.int8)
        q2 = (jnp.round(jnp.clip(desc2, 0.0, 255.0)) - 128.0) \
            .astype(jnp.int8)
        dot = jax.lax.dot_general(
            q1, q2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        n1 = jnp.sum(jnp.square(q1.astype(jnp.int32)), axis=1,
                     keepdims=True)
        n2 = jnp.sum(jnp.square(q2.astype(jnp.int32)), axis=1,
                     keepdims=True)
        raw = n1 + n2.T - 2 * dot                  # exact squared L2
        return raw, jnp.int32(jnp.iinfo(jnp.int32).max), \
            lambda v: jnp.sqrt(jnp.maximum(v, 0).astype(jnp.float32))
    if metric == "hamming_pm1":
        q1 = desc1.astype(jnp.int8)
        q2 = desc2.astype(jnp.int8)
        dot = jax.lax.dot_general(
            q1, q2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        # -dot orders identically to the bit-flip count (d - dot) / 2.
        # post converts to f32 BEFORE the +d (the int32max pad value of
        # fully-masked columns must stay huge, not overflow)
        return -dot, jnp.int32(jnp.iinfo(jnp.int32).max), \
            lambda v: (v.astype(jnp.float32) + d) * 0.5
    if metric == "l2":
        dot = jnp.dot(desc1, desc2.T, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        sq1 = jnp.sum(desc1 * desc1, axis=1, keepdims=True)
        sq2 = jnp.sum(desc2 * desc2, axis=1, keepdims=True)
        raw = sq1 + sq2.T - 2.0 * dot              # squared L2
        return raw, _INF, lambda v: jnp.sqrt(jnp.maximum(
            jnp.minimum(v, _INF), 0.0))
    raise ValueError(f"unknown metric {metric!r}")


@functools.partial(jax.jit, static_argnames=("metric",))
def knn2(desc1: jnp.ndarray, desc2: jnp.ndarray,
         mask1: jnp.ndarray, mask2: jnp.ndarray,
         metric: str = "l2") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked 2-NN: (N,2) neighbour indices into desc2 and (N,2) distances.

    Padded rows of desc2 never win (distance forced to +inf); padded rows of
    desc1 get garbage that callers must mask with mask1.
    """
    raw, big, post = _raw_comparable(desc1, desc2, metric)
    raw = jnp.where(mask2[None, :], raw, big)
    idx, val = _top2_min(raw, big)
    return idx, post(val)


@functools.partial(jax.jit, static_argnames=("metric", "block"))
def knn2_blockwise(desc1: jnp.ndarray, desc2: jnp.ndarray,
                   mask1: jnp.ndarray, mask2: jnp.ndarray,
                   metric: str = "l2",
                   block: int = 4096) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Blockwise 2-NN: identical result to knn2, but the (N, M) distance
    matrix is never materialized — a lax.scan over M/block column tiles
    keeps a running top-2, bounding memory at O(N * block). This is the
    SURVEY §5 long-context analogue for the descriptor distance matrix
    (N >= ~8k is where the full matrix stops fitting comfortably:
    16k x 16k f32 = 1 GB).
    """
    n, d = desc1.shape
    m = desc2.shape[0]
    nb = -(-m // block)
    mp = nb * block
    if mp != m:
        desc2 = jnp.pad(desc2, ((0, mp - m), (0, 0)))
        mask2 = jnp.pad(mask2, (0, mp - m))
    blocks_d = desc2.reshape(nb, block, d)
    blocks_m = mask2.reshape(nb, block)

    # probe raw dtype/pad/post once (the scan carry lives in raw domain;
    # post applies to the two final winners only)
    _, big, post = _raw_comparable(desc1[:1], desc2[:1], metric)

    def step(carry, blk):
        bi, bv = carry                     # running (N,2) idx / raw val
        db, mb, off = blk
        raw, _, _ = _raw_comparable(desc1, db, metric)
        raw = jnp.where(mb[None, :], raw, big)
        li, lv = _top2_min(raw, big)
        li = li + off
        # merge 4 candidates -> top 2
        cand_v = jnp.concatenate([bv, lv], axis=1)       # (N, 4)
        cand_i = jnp.concatenate([bi, li], axis=1)
        j1 = jnp.argmin(cand_v, axis=1)
        v1 = jnp.take_along_axis(cand_v, j1[:, None], axis=1)[:, 0]
        i1 = jnp.take_along_axis(cand_i, j1[:, None], axis=1)[:, 0]
        cols4 = jax.lax.broadcasted_iota(jnp.int32, cand_v.shape, 1)
        masked = jnp.where(cols4 == j1[:, None], big, cand_v)
        j2 = jnp.argmin(masked, axis=1)
        v2 = jnp.take_along_axis(masked, j2[:, None], axis=1)[:, 0]
        i2 = jnp.take_along_axis(cand_i, j2[:, None], axis=1)[:, 0]
        return (jnp.stack([i1, i2], 1), jnp.stack([v1, v2], 1)), None

    init = (jnp.zeros((n, 2), jnp.int32),
            jnp.full((n, 2), big, jnp.asarray(big).dtype))
    offs = jnp.arange(nb, dtype=jnp.int32) * block
    (idx, val), _ = jax.lax.scan(step, init, (blocks_d, blocks_m, offs))
    return idx, post(val)


# full-matrix kNN is faster below this many descriptors; above it the
# (N, M) matrix costs real HBM and the scan tiles win
BLOCKWISE_THRESHOLD = 8192


# detectors whose descriptors live on the SIFT 0..255 8-bit scale
# (traditional_detectors.py: SIFT + the Harris/GFTT corner detectors use
# SIFT descriptors); deep-net float descriptors stay in f32 matching
_SIFT_SCALE_METHODS = frozenset(
    {"SIFT", "Harris", "GFTT", "HarrisSIFT", "GoodFeaturesToTrack"})


def _metric_for(feats: Features) -> str:
    if feats.desc_kind == DescriptorKind.BINARY.value:
        return "hamming_pm1"
    if (feats.method or "").split("(")[0] in _SIFT_SCALE_METHODS:
        return "l2_int8"
    return "l2"


@functools.partial(jax.jit, static_argnames=("ratio", "cross_check", "metric"))
def _match_impl(desc1, desc2, mask1, mask2, ratio: float,
                cross_check: bool, metric: str):
    # large-N regime: tiled top-2 instead of the full distance matrix
    big = max(desc1.shape[0], desc2.shape[0]) >= BLOCKWISE_THRESHOLD
    knn = knn2_blockwise if big else knn2
    nn_idx, nn_dist = knn(desc1, desc2, mask1, mask2, metric)
    best = nn_idx[:, 0]
    d1, d2 = nn_dist[:, 0], nn_dist[:, 1]
    # Lowe ratio test (feature_matchers.py:129-148). Guard the d2==0 case.
    ok = d1 < ratio * jnp.maximum(d2, 1e-12)
    ok = ok & mask1 & (d1 < _INF)
    if cross_check:
        # mutual nearest: 1-NN of desc2 rows must point back
        rev_idx, _ = knn(desc2, desc1, mask2, mask1, metric)
        ok = ok & (rev_idx[best, 0] == jnp.arange(desc1.shape[0]))
    return best, d1, ok


def match_features(feats1: Features, feats2: Features,
                   ratio: float = 0.75, cross_check: bool = False,
                   method: Optional[str] = None) -> Matches:
    """BF/FLANN-equivalent matcher: kNN(k=2) + Lowe ratio [+ mutual check].

    Returns a Matches with capacity = feats1.capacity and DISTANCE scores —
    the same contract as the reference's EnhancedBFMatcher.match
    (feature_matchers.py:201-252).
    """
    metric = _metric_for(feats1)
    best, d1, ok = _match_impl(feats1.desc, feats2.desc,
                               feats1.mask, feats2.mask,
                               float(ratio), bool(cross_check), metric)
    n = feats1.capacity
    return Matches(
        idx1=jnp.arange(n, dtype=jnp.int32),
        idx2=best.astype(jnp.int32),
        score=jnp.where(ok, d1, 0.0),
        mask=ok,
        score_type=ScoreType.DISTANCE.value,
        method=method or feats1.method,
    )


def match_descriptors(desc1, desc2, mask1=None, mask2=None,
                      ratio: float = 0.75, cross_check: bool = False,
                      metric: str = "l2") -> Matches:
    """Raw-array entry point (used by benchmarks and the deep stack)."""
    n, m = desc1.shape[0], desc2.shape[0]
    mask1 = jnp.ones((n,), bool) if mask1 is None else mask1
    mask2 = jnp.ones((m,), bool) if mask2 is None else mask2
    best, d1, ok = _match_impl(jnp.asarray(desc1), jnp.asarray(desc2),
                               mask1, mask2, float(ratio),
                               bool(cross_check), metric)
    return Matches(
        idx1=jnp.arange(n, dtype=jnp.int32),
        idx2=best.astype(jnp.int32),
        score=jnp.where(ok, d1, 0.0),
        mask=ok,
        score_type=ScoreType.DISTANCE.value,
    )


def auto_select_matcher(feats: Features) -> str:
    """Heuristic matcher choice from descriptor kind
    (reference: feature_matchers.py:608-680)."""
    if feats.desc_kind == DescriptorKind.BINARY.value:
        return "bf"     # Hamming BF
    return "flann"      # float -> (exact) FLANN-class kNN
