"""Batched-hypothesis RANSAC engine.

TPU-native replacement for cv2's iterative RANSAC loops
(cv2.findHomography at utils.py:144, cv2.findFundamentalMat at
pair_selector.py:120, cv2.findEssentialMat at essential_estimation.py:120).

Instead of a data-dependent loop with early exit, we draw a *fixed* batch of
K minimal samples, solve all K models with a vmapped minimal solver, score
all K x N residuals with one matmul-shaped reduction, and take the argmax —
fully static shapes, one kernel launch, embarrassingly parallel on the VPU/MXU.
K is chosen from the classical RANSAC iteration formula at the worst expected
inlier ratio, so the probabilistic guarantee matches the reference's
(conf=0.999, 5000 iters, essential_estimation.py:6-20).

Distinct valid-only minimal samples are drawn with Floyd's sampling
algorithm over valid *ranks* (exactly uniform, no rejection loop), then
ranks map to point indices through cumsum(mask) + searchsorted. This
replaces the earlier Gumbel top-k draw: identical distribution, but
(K, s) random draws instead of a (K, N) gumbel field and lax.top_k —
the top_k over (K, 2048) alone cost ~25 ms per 64-pair batch on v5e.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class RansacResult(NamedTuple):
    model: jnp.ndarray        # best model parameters
    inliers: jnp.ndarray      # (N,) bool inlier mask (includes input mask)
    num_inliers: jnp.ndarray  # () int32
    inlier_ratio: jnp.ndarray # () float32 — inliers / valid points
    success: jnp.ndarray      # () bool — found any valid model
    residuals: jnp.ndarray    # (N,) residuals of best model (squared, px^2)


def sample_minimal_sets(key: jax.Array, mask: jnp.ndarray,
                        num_hypotheses: int, sample_size: int) -> jnp.ndarray:
    """(K, s) distinct indices of valid points, exactly uniform.

    Floyd's algorithm draws s distinct ranks in [0, n_valid) with s
    i.i.d. integers per hypothesis (collision j is replaced by the
    never-yet-drawable rank n_valid - s + j); ranks then map to point
    indices through the mask cumsum with an all-compare searchsorted
    (binary-search 'scan' is a serial while-loop of gathers on TPU).
    If fewer than sample_size points are valid, out-of-range ranks land
    on masked points and the resulting degenerate models are rejected
    by the caller's scoring (same behaviour as the old gumbel draw).
    """
    s = sample_size
    nv = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), s)
    csum = jnp.cumsum(mask.astype(jnp.int32))
    u = jax.random.randint(key, (num_hypotheses, s), 0,
                           jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    ranks = []
    for j in range(s):
        t = u[:, j] % (nv - s + 1 + j)
        for r in ranks:
            t = jnp.where(t == r, nv - s + j, t)
        ranks.append(t)
    ranks = jnp.stack(ranks, axis=1)  # (K, s)
    idx = jnp.searchsorted(csum, ranks.reshape(-1) + 1, side="left",
                           method="compare_all")
    return jnp.minimum(idx, mask.shape[0] - 1).reshape(
        num_hypotheses, s).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("solver", "residual_fn", "sample_size",
                     "num_hypotheses", "models_per_sample"))
def ransac(pts1: jnp.ndarray, pts2: jnp.ndarray, mask: jnp.ndarray,
           key: jax.Array, *,
           solver: Callable,
           residual_fn: Callable,
           sample_size: int,
           num_hypotheses: int = 512,
           models_per_sample: int = 1,
           threshold: float = 4.0,
           min_inliers: int = 0) -> RansacResult:
    """Generic masked RANSAC over 2D-2D correspondences.

    solver(p1 (s,2), p2 (s,2)) -> (model, valid) where model has a leading
      models_per_sample axis if models_per_sample > 1 (e.g. 5-point E returns
      up to 10 roots).
    residual_fn(model, pts1 (N,2), pts2 (N,2)) -> (N,) squared residual (px^2).
    threshold: inlier gate in *pixels* (compared against sqrt(residual)).
    """
    n = pts1.shape[0]
    idx = sample_minimal_sets(key, mask, num_hypotheses, sample_size)
    s1 = pts1[idx]  # (K, s, 2)
    s2 = pts2[idx]

    models, valid = jax.vmap(solver)(s1, s2)
    if models_per_sample > 1:
        # flatten (K, R, ...) -> (K*R, ...)
        models = jax.tree.map(
            lambda a: a.reshape((num_hypotheses * models_per_sample,) + a.shape[2:]),
            models)
        valid = valid.reshape(-1)

    res = jax.vmap(residual_fn, in_axes=(0, None, None))(models, pts1, pts2)
    thr2 = jnp.float32(threshold) ** 2
    inl = (res <= thr2) & mask[None, :]
    # MSAC-style score: truncated quadratic loss gives better models than
    # pure inlier counting at equal cost.
    score = jnp.sum(jnp.where(inl, thr2 - res, 0.0), axis=1)
    score = jnp.where(valid, score, -1.0)

    best = jnp.argmax(score)
    best_model = jax.tree.map(lambda a: a[best], models)
    best_res = res[best]
    best_inl = inl[best]
    num_inl = jnp.sum(best_inl.astype(jnp.int32))
    n_valid = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
    success = (score[best] > 0) & (num_inl >= min_inliers)

    return RansacResult(
        model=best_model,
        inliers=best_inl & success,
        num_inliers=jnp.where(success, num_inl, 0),
        inlier_ratio=jnp.where(success, num_inl / n_valid, 0.0),
        success=success,
        residuals=best_res,
    )


def num_hypotheses_for(conf: float, inlier_ratio: float, sample_size: int,
                       cap: int = 8192) -> int:
    """Classical RANSAC iteration count N = log(1-p)/log(1-w^s), capped."""
    import math
    w = max(min(inlier_ratio, 0.999), 1e-3)
    denom = math.log(max(1.0 - w ** sample_size, 1e-12))
    if denom >= 0:
        return cap
    n = math.log(max(1.0 - conf, 1e-12)) / denom
    return int(min(max(math.ceil(n), 32), cap))
