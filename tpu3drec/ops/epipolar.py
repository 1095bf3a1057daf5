"""Essential-matrix estimation and pose recovery.

TPU-native replacements for cv2.findEssentialMat / cv2.recoverPose
(reference: essential_estimation.py:100-170, pose_recovery.py:16-115).

Pipeline: pixel points are normalized by K (undistortPoints equivalent for
the zero-distortion case the reference uses), the 8-point solver + essential
manifold projection runs inside the batched RANSAC engine with Sampson
residuals scaled back to pixels, and the best E is decomposed into the four
(R, t) candidates with the cheirality (positive-depth) vote deciding the
winner — exactly recoverPose's disambiguation, but vectorized over all
correspondences at once.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from tpu3drec.ops.geometry import (
    normalize_points, sampson_error, to_homogeneous, _smallest_singular_vector,
)
from tpu3drec.ops.ransac import ransac, RansacResult


def normalize_with_K(pts: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pixel -> normalized camera coords (cv2.undistortPoints, zero distortion)."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    x = (pts[..., 0] - cx) / fx
    y = (pts[..., 1] - cy) / fy
    return jnp.stack([x, y], axis=-1)


def denormalize_with_K(pts: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    return jnp.stack([pts[..., 0] * fx + cx, pts[..., 1] * fy + cy], axis=-1)


def project_to_essential(E: jnp.ndarray) -> jnp.ndarray:
    """Nearest essential matrix: singular values -> (1, 1, 0)."""
    U, S, Vt = jnp.linalg.svd(E)
    return (U * jnp.array([1.0, 1.0, 0.0])) @ Vt


def solve_essential_8pt(p1n: jnp.ndarray, p2n: jnp.ndarray,
                        w: Optional[jnp.ndarray] = None
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """8-point essential from normalized coords (x2^T E x1 = 0)."""
    p1h, T1 = normalize_points(p1n, w)
    p2h, T2 = normalize_points(p2n, w)
    x, y = p1h[:, 0], p1h[:, 1]
    u, v = p2h[:, 0], p2h[:, 1]
    one = jnp.ones_like(x)
    A = jnp.stack([u * x, u * y, u, v * x, v * y, v, x, y, one], axis=1)
    if w is not None:
        A = A * jnp.sqrt(w.astype(A.dtype))[:, None]
    e = _smallest_singular_vector(A)
    En = e.reshape(3, 3)
    E = T2.T @ En @ T1
    E = project_to_essential(E)
    norm = jnp.linalg.norm(E)
    valid = (norm > 1e-12) & jnp.all(jnp.isfinite(E))
    return E / jnp.where(valid, norm, 1.0), valid


class EssentialResult(NamedTuple):
    E: jnp.ndarray
    inliers: jnp.ndarray
    num_inliers: jnp.ndarray
    inlier_ratio: jnp.ndarray
    success: jnp.ndarray
    residuals: jnp.ndarray  # squared, in normalized coords


@functools.partial(
    jax.jit,
    static_argnames=("threshold_px", "num_hypotheses", "refit", "method"))
def find_essential(pts1: jnp.ndarray, pts2: jnp.ndarray,
                   K1: jnp.ndarray, K2: Optional[jnp.ndarray] = None,
                   mask: Optional[jnp.ndarray] = None,
                   threshold_px: float = 1.5,
                   num_hypotheses: int = 1024,
                   key: Optional[jax.Array] = None,
                   refit: bool = True,
                   method: str = "8point") -> EssentialResult:
    """RANSAC essential matrix from *pixel* correspondences.

    threshold_px is in pixels (reference MatrixEstimationConfig.ransac_threshold
    = 1.5, essential_estimation.py:6-20); internally scaled to normalized
    coords by the mean focal length — cv2.findEssentialMat's convention.

    method: '8point' (normalized 8-point + essential-manifold projection)
    or '5point' (Nister minimal solver, ops/five_point.py; up to 10 models
    per sample — the reference's FIVE_POINT option,
    essential_estimation.py:117-147). 8-point needs larger clean samples
    but is cheaper per hypothesis; 5-point tolerates lower inlier ratios.
    """
    K2 = K1 if K2 is None else K2
    n = pts1.shape[0]
    mask = jnp.ones((n,), bool) if mask is None else mask
    key = jax.random.PRNGKey(0) if key is None else key
    p1n = normalize_with_K(pts1, K1)
    p2n = normalize_with_K(pts2, K2)
    f_mean = 0.25 * (K1[0, 0] + K1[1, 1] + K2[0, 0] + K2[1, 1])
    thr_norm = threshold_px / f_mean

    # The RANSAC core always runs at one internal capacity: tracing +
    # remote-compiling the hypothesis solver (especially 5-point) costs
    # tens of seconds PER SHAPE, and RANSAC's inlier estimate converges
    # long before 512 correspondences anyway. The final model is scored
    # and refit on the FULL set below.
    SAMPLE_CAP = 512
    if n > SAMPLE_CAP:
        kg, key = jax.random.split(key)
        g = jax.random.gumbel(kg, (n,), jnp.float32) \
            + jnp.log(mask.astype(jnp.float32) + 1e-30)
        _, sub = jax.lax.top_k(g, SAMPLE_CAP)
        p1s, p2s = p1n[sub], p2n[sub]
        masks = mask[sub]
    else:
        p1s, p2s, masks = p1n, p2n, mask

    if method == "5point":
        from tpu3drec.ops.five_point import solve_essential_5pt
        res = ransac(p1s, p2s, masks, key,
                     solver=solve_essential_5pt,
                     residual_fn=sampson_error,
                     sample_size=5,
                     num_hypotheses=max(num_hypotheses // 10, 64),
                     models_per_sample=10,
                     threshold=thr_norm)
    else:
        def solver(a, b):
            return solve_essential_8pt(a, b)

        res = ransac(p1s, p2s, masks, key,
                     solver=solver, residual_fn=sampson_error,
                     sample_size=8, num_hypotheses=num_hypotheses,
                     threshold=thr_norm)
    E = res.model
    # score the winning model on the full set
    r_full = sampson_error(E, p1n, p2n)
    inl = (r_full <= thr_norm ** 2) & mask
    num0 = jnp.sum(inl.astype(jnp.int32))
    if refit:
        E2, ok = solve_essential_8pt(p1n, p2n, inl.astype(p1n.dtype))
        r2 = sampson_error(E2, p1n, p2n)
        inl2 = (r2 <= thr_norm ** 2) & mask
        better = ok & (jnp.sum(inl2) >= num0) & res.success
        E = jnp.where(better, E2, E)
        inl = jnp.where(better, inl2, inl)
        r_full = jnp.where(better, r2, r_full)
    n_valid = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
    num = jnp.sum(inl.astype(jnp.int32))
    return EssentialResult(E=E, inliers=inl, num_inliers=num,
                           inlier_ratio=num / n_valid,
                           success=res.success, residuals=r_full)


def essential_quality(E: jnp.ndarray) -> dict:
    """SVD-based E-quality diagnostics (reference essential_estimation.py:189-254):
    sigma1 ~= sigma2, sigma3 ~= 0, rank 2."""
    S = jnp.linalg.svd(E, compute_uv=False)
    ratio = S[1] / jnp.maximum(S[0], 1e-12)
    return {
        "singular_values": S,
        "sv_ratio": ratio,              # want ~1
        "sv3_over_sv1": S[2] / jnp.maximum(S[0], 1e-12),  # want ~0
        "is_valid": (ratio > 0.7) & (S[2] / jnp.maximum(S[0], 1e-12) < 0.1),
    }


def decompose_essential(E: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """E -> (R1, R2, t): the four candidate poses are (R1,t),(R1,-t),(R2,t),(R2,-t)."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    return R1, R2, t


def triangulate_linear(p1n: jnp.ndarray, p2n: jnp.ndarray,
                       R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Fast midpoint-free linear triangulation for cheirality voting.

    Camera 1 = [I | 0], camera 2 = [R | t]; p*n are normalized coords (N, 2).
    Uses the two-row DLT closed form (4x4 SVD is overkill for voting).
    """
    x1 = to_homogeneous(p1n)  # (N, 3) rays in cam1
    x2 = to_homogeneous(p2n)  # rays in cam2
    # depth of point along x1 solving lambda2 * x2 = R (lambda1 * x1) + t:
    # cross(x2) @ (R x1) * l1 = -cross(x2) @ t ; least-squares over 3 eqs
    Rx1 = x1 @ R.T  # (N, 3)
    c = jnp.cross(x2, Rx1)        # coefficients for l1
    d = jnp.cross(x2, jnp.broadcast_to(t, x2.shape))
    l1 = -jnp.sum(c * d, axis=1) / jnp.maximum(jnp.sum(c * c, axis=1), 1e-12)
    X = x1 * l1[:, None]          # (N, 3) in cam1 frame
    return X


@jax.jit
def recover_pose(E: jnp.ndarray, pts1: jnp.ndarray, pts2: jnp.ndarray,
                 K1: jnp.ndarray, K2: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """cv2.recoverPose equivalent: pick the (R, t) of 4 candidates with the
    most points in front of both cameras (pose_recovery.py:52-70).

    Returns (R, t, cheirality_mask) with t unit-norm, x2 ~ R x1 + t.
    """
    K2 = K1 if K2 is None else K2
    n = pts1.shape[0]
    mask = jnp.ones((n,), bool) if mask is None else mask
    p1n = normalize_with_K(pts1, K1)
    p2n = normalize_with_K(pts2, K2)
    R1, R2, t = decompose_essential(E)

    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    votes = []
    fronts = []
    for R, tt in cands:
        X = triangulate_linear(p1n, p2n, R, tt)
        z1 = X[:, 2]
        z2 = (X @ R.T + tt)[:, 2]
        front = (z1 > 1e-6) & (z2 > 1e-6) & mask
        fronts.append(front)
        votes.append(jnp.sum(front.astype(jnp.int32)))
    votes = jnp.stack(votes)
    best = jnp.argmax(votes)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    fr = jnp.stack(fronts)
    return Rs[best], ts[best], fr[best]


def rotation_angle_deg(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation magnitude in degrees (pose_recovery.py:103-115)."""
    tr = jnp.trace(R)
    c = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(c))
