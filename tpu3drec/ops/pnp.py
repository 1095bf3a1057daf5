"""PnP: camera pose from 2D-3D correspondences.

TPU-native replacement for cv2.solvePnPRansac / solvePnP(ITERATIVE)
(reference: pose_recovery.py:117-256). Minimal solver is the 6-point DLT on
K-normalized rays with SO(3) projection; refinement is fixed-iteration
Gauss-Newton on (rvec, tvec) — together these match OpenCV's
EPNP+ITERATIVE pipeline to sub-0.1px on inliers. RANSAC uses the shared
batched-hypothesis engine with reprojection-error residuals.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from tpu3drec.ops.epipolar import normalize_with_K
from tpu3drec.ops.lie import exp_so3, log_so3, project_points
from tpu3drec.ops.ransac import ransac


def solve_pnp_dlt(X: jnp.ndarray, xn: jnp.ndarray,
                  w: Optional[jnp.ndarray] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """DLT pose from >= 6 points: X (N,3) world, xn (N,2) K-normalized.

    Returns (R, t, valid). Solves x ~ [R|t] X as a 12-dof homogeneous
    system, then projects the 3x3 block onto SO(3) (Procrustes) and fixes
    the cheirality sign so most points have positive depth.
    """
    n = X.shape[0]
    u, v = xn[:, 0], xn[:, 1]
    Xh = jnp.concatenate([X, jnp.ones((n, 1), X.dtype)], axis=1)  # (N, 4)
    zero = jnp.zeros_like(Xh)
    rows_a = jnp.concatenate([Xh, zero, -u[:, None] * Xh], axis=1)  # (N, 12)
    rows_b = jnp.concatenate([zero, Xh, -v[:, None] * Xh], axis=1)
    A = jnp.concatenate([rows_a, rows_b], axis=0)  # (2N, 12)
    if w is not None:
        ww = jnp.sqrt(jnp.concatenate([w, w]).astype(A.dtype))[:, None]
        A = A * ww
    AtA = A.T @ A
    _, vecs = jnp.linalg.eigh(AtA)
    p = vecs[:, 0].reshape(3, 4)
    # The DLT solution is defined up to sign; pick the sign that puts the
    # majority of points in front of the camera BEFORE orthogonalization
    # (negating R alone would leave SO(3)).
    z_raw = (X @ p[:, :3].T + p[:, 3])[:, 2]
    s = jnp.where(jnp.sum(jnp.sign(z_raw)) < 0, -1.0, 1.0)
    p = p * s
    M = p[:, :3]
    # Procrustes projection onto SO(3); scale from singular values
    U, S, Vt = jnp.linalg.svd(M)
    scale = jnp.mean(S)
    R = U @ Vt
    det = jnp.linalg.det(R)
    t = p[:, 3] / jnp.maximum(scale, 1e-12)
    # a det=-1 projection after the sign fix means a degenerate sample
    valid = (det > 0) & (scale > 1e-9) & \
        jnp.all(jnp.isfinite(R)) & jnp.all(jnp.isfinite(t))
    return R, t, valid


def refine_pnp_gn(R: jnp.ndarray, t: jnp.ndarray, X: jnp.ndarray,
                  uv: jnp.ndarray, K: jnp.ndarray,
                  mask: Optional[jnp.ndarray] = None,
                  iters: int = 8) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gauss-Newton on (rvec, tvec) minimizing masked reprojection error
    (cv2.solvePnP ITERATIVE equivalent)."""
    n = X.shape[0]
    mask = jnp.ones((n,), bool) if mask is None else mask
    w = mask.astype(X.dtype)

    def resid(p):
        proj = project_points(X, p[:3], p[3:], K)
        return ((proj - uv) * w[:, None]).reshape(-1)

    p0 = jnp.concatenate([log_so3(R), t])

    def body(p, _):
        r = resid(p)
        J = jax.jacfwd(resid)(p)  # (2N, 6)
        JtJ = J.T @ J + 1e-8 * jnp.eye(6, dtype=p.dtype)
        dp = jnp.linalg.solve(JtJ, -(J.T @ r))
        p_new = p + dp
        better = jnp.sum(resid(p_new) ** 2) < jnp.sum(r ** 2)
        return jnp.where(better, p_new, p), None

    p, _ = jax.lax.scan(body, p0, None, length=iters)
    return exp_so3(p[:3]), p[3:]


class PnPResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray
    num_inliers: jnp.ndarray
    inlier_ratio: jnp.ndarray
    success: jnp.ndarray
    mean_reproj_px: jnp.ndarray
    # (14 + N,) [success, num_inliers, inlier_ratio, mean_reproj_px,
    # R.ravel(), t, inliers] — whole result in ONE host pull (the SfM
    # per-view path otherwise pays ~5 tunnel round trips per PnP)
    packed: Optional[jnp.ndarray] = None


@functools.partial(jax.jit, static_argnames=("num_hypotheses", "refine_iters",
                                             "min_inliers"))
def solve_pnp_ransac(X: jnp.ndarray, uv: jnp.ndarray, K: jnp.ndarray,
                     mask: Optional[jnp.ndarray] = None,
                     threshold_px: float = 4.0,
                     num_hypotheses: int = 512,
                     refine_iters: int = 8,
                     min_inliers: int = 6,
                     key: Optional[jax.Array] = None) -> PnPResult:
    """cv2.solvePnPRansac equivalent: X (N,3), uv (N,2) pixels, K (3,3).

    Reference defaults: reprojection threshold ~4px, conf .999
    (pose_recovery.py:150-180).
    """
    n = X.shape[0]
    mask = jnp.ones((n,), bool) if mask is None else mask
    key = jax.random.PRNGKey(0) if key is None else key
    def solver(Xs, uvs):
        xns = normalize_with_K(uvs, K)
        # 12-point DLT (6 would satisfy the DoF but is far too noise-
        # sensitive) + 3 Gauss-Newton steps on the sample (LO-RANSAC style):
        # together a clean sample lands within ~0.1 deg of the true pose.
        R, t, ok = solve_pnp_dlt(Xs, xns)
        p = jnp.concatenate([log_so3(R), t])

        def resid(pp):
            Rr = exp_so3(pp[:3])
            Xc = Xs @ Rr.T + pp[3:]
            z = jnp.where(jnp.abs(Xc[:, 2]) > 1e-9, Xc[:, 2], 1e-9)
            return (Xc[:, :2] / z[:, None] - xns).reshape(-1)

        def gn(pp, _):
            r = resid(pp)
            J = jax.jacfwd(resid)(pp)
            JtJ = J.T @ J + 1e-8 * jnp.eye(6, dtype=pp.dtype)
            # SPD solve via eigh: batched LU (linalg.solve) lowers to
            # scalar loops on TPU and this runs per RANSAC hypothesis
            lam, V = jnp.linalg.eigh(JtJ)
            b = -(J.T @ r)
            pn = pp + V @ ((V.T @ b) / jnp.maximum(lam, 1e-10))
            better = jnp.sum(resid(pn) ** 2) < jnp.sum(r ** 2)
            return jnp.where(better, pn, pp), None

        p, _ = jax.lax.scan(gn, p, None, length=3)
        R = exp_so3(p[:3])
        return jnp.concatenate([R.reshape(-1), p[3:]]), ok

    def residual_fn(model, Xall, uvall):
        R = model[:9].reshape(3, 3)
        t = model[9:]
        proj = project_points(Xall, log_so3(R), t, K)
        z = (Xall @ R.T + t)[:, 2]
        err = jnp.sum((proj - uvall) ** 2, axis=1)
        return jnp.where(z > 1e-6, err, 1e12)

    res = ransac(X, uv, mask, key, solver=solver, residual_fn=residual_fn,
                 sample_size=12, num_hypotheses=num_hypotheses,
                 threshold=threshold_px, min_inliers=min_inliers)
    R = res.model[:9].reshape(3, 3)
    t = res.model[9:]
    R, t = refine_pnp_gn(R, t, X, uv, K, mask=res.inliers, iters=refine_iters)
    # recompute inliers after refinement
    proj = project_points(X, log_so3(R), t, K)
    err = jnp.linalg.norm(proj - uv, axis=1)
    z = (X @ R.T + t)[:, 2]
    inl = (err <= threshold_px) & (z > 1e-6) & mask & res.success
    num = jnp.sum(inl.astype(jnp.int32))
    n_valid = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
    w = inl.astype(err.dtype)
    mean_err = jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1.0)
    success = res.success & (num >= min_inliers)
    packed = jnp.concatenate([
        jnp.stack([success.astype(jnp.float32), num.astype(jnp.float32),
                   (num / n_valid).astype(jnp.float32), mean_err]),
        R.ravel(), t.reshape(3), inl.astype(jnp.float32)])
    return PnPResult(R=R, t=t, inliers=inl, num_inliers=num,
                     inlier_ratio=num / n_valid,
                     success=success,
                     mean_reproj_px=mean_err, packed=packed)
