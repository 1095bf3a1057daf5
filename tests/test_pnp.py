"""PnP tests vs ground truth and cv2.solvePnPRansac
(reference: pose_recovery.py:117-256)."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu3drec.ops.pnp import solve_pnp_dlt, refine_pnp_gn, solve_pnp_ransac
from tpu3drec.ops.epipolar import normalize_with_K


def make_pnp_scene(n=150, noise=0.5, n_out=30, seed=0):
    rng = np.random.default_rng(seed)
    K = np.array([[650, 0, 320], [0, 650, 240], [0, 0, 1]], np.float64)
    R = cv2.Rodrigues(np.array([0.1, -0.3, 0.05]))[0]
    t = np.array([0.4, -0.2, 0.6])
    X = rng.uniform(-3, 3, size=(n, 3)) + np.array([0, 0, 9.0])
    uv = (K @ (R @ X.T + t[:, None])).T
    uv = uv[:, :2] / uv[:, 2:3]
    uv += noise * rng.standard_normal((n, 2))
    outl = rng.permutation(n)[:n_out]
    uv[outl] += rng.uniform(40, 120, (n_out, 2)) * np.sign(rng.standard_normal((n_out, 2)))
    gt_inl = np.ones(n, bool)
    gt_inl[outl] = False
    return (X.astype(np.float32), uv.astype(np.float32),
            K.astype(np.float32), R, t, gt_inl)


def rot_err_deg(Ra, Rb):
    d = Ra @ Rb.T
    return np.degrees(np.arccos(np.clip((np.trace(d) - 1) / 2, -1, 1)))


def test_pnp_dlt_noise_free():
    X, uv, K, R_gt, t_gt, _ = make_pnp_scene(noise=0.0, n_out=0)
    xn = normalize_with_K(jnp.asarray(uv), jnp.asarray(K))
    R, t, ok = solve_pnp_dlt(jnp.asarray(X), xn)
    assert bool(ok)
    assert rot_err_deg(np.asarray(R, dtype=np.float64), R_gt) < 0.1
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=5e-3)


def test_pnp_gn_refinement():
    X, uv, K, R_gt, t_gt, _ = make_pnp_scene(noise=0.3, n_out=0)
    # start from a perturbed pose
    R0 = cv2.Rodrigues(np.array([0.13, -0.27, 0.08]))[0].astype(np.float32)
    t0 = (t_gt + 0.1).astype(np.float32)
    R, t = refine_pnp_gn(jnp.asarray(R0), jnp.asarray(t0),
                         jnp.asarray(X), jnp.asarray(uv), jnp.asarray(K))
    assert rot_err_deg(np.asarray(R, dtype=np.float64), R_gt) < 0.2
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=2e-2)


def test_pnp_ransac_with_outliers():
    X, uv, K, R_gt, t_gt, gt_inl = make_pnp_scene()
    res = solve_pnp_ransac(jnp.asarray(X), jnp.asarray(uv), jnp.asarray(K),
                           key=jax.random.PRNGKey(0))
    assert bool(res.success)
    inl = np.asarray(res.inliers)
    assert inl[gt_inl].mean() > 0.95
    assert inl[~gt_inl].mean() < 0.05
    assert rot_err_deg(np.asarray(res.R, dtype=np.float64), R_gt) < 0.3
    assert float(res.mean_reproj_px) < 1.0


def test_pnp_matches_cv2():
    X, uv, K, R_gt, t_gt, gt_inl = make_pnp_scene(seed=4)
    ok, rvec, tvec, inl_cv = cv2.solvePnPRansac(
        X.astype(np.float64), uv.astype(np.float64), K.astype(np.float64),
        None, reprojectionError=4.0, confidence=0.999)
    R_cv = cv2.Rodrigues(rvec)[0]
    res = solve_pnp_ransac(jnp.asarray(X), jnp.asarray(uv), jnp.asarray(K),
                           key=jax.random.PRNGKey(1))
    assert rot_err_deg(np.asarray(res.R, dtype=np.float64), R_cv) < 0.5
    np.testing.assert_allclose(np.asarray(res.t), tvec.ravel(), atol=5e-2)


def test_pnp_respects_mask():
    X, uv, K, R_gt, t_gt, gt_inl = make_pnp_scene(noise=0.3)
    # mask out everything but 40 clean points; corrupt the rest wildly
    mask = np.zeros(len(X), bool)
    clean = np.where(gt_inl)[0][:40]
    mask[clean] = True
    uv2 = uv.copy()
    uv2[~mask] = 1e5
    res = solve_pnp_ransac(jnp.asarray(X), jnp.asarray(uv2), jnp.asarray(K),
                           mask=jnp.asarray(mask), key=jax.random.PRNGKey(2))
    assert bool(res.success)
    assert rot_err_deg(np.asarray(res.R, dtype=np.float64), R_gt) < 0.5
    assert not np.any(np.asarray(res.inliers)[~mask])
