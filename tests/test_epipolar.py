"""Essential matrix + pose recovery tests vs ground truth and cv2
(reference: essential_estimation.py, pose_recovery.py)."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu3drec.ops.epipolar import (
    find_essential, recover_pose, decompose_essential, essential_quality,
    rotation_angle_deg, normalize_with_K,
)


def make_two_view(n=300, n_out=60, noise=0.5, seed=2):
    r = np.random.default_rng(seed)
    K = np.array([[700, 0, 320], [0, 700, 240], [0, 0, 1]], np.float64)
    R = cv2.Rodrigues(np.array([0.08, 0.25, -0.03]))[0]
    t = np.array([1.0, -0.15, 0.3])
    t = t / np.linalg.norm(t)
    X = r.uniform(-3, 3, size=(n, 3)) + np.array([0, 0, 8.0])
    x1 = (K @ X.T).T
    p1 = x1[:, :2] / x1[:, 2:3]
    x2 = (K @ (R @ X.T + t[:, None])).T
    p2 = x2[:, :2] / x2[:, 2:3]
    p1 += noise * r.standard_normal((n, 2))
    p2 += noise * r.standard_normal((n, 2))
    outl = r.permutation(n)[:n_out]
    p2[outl] += r.uniform(30, 100, size=(n_out, 2)) * np.sign(r.standard_normal((n_out, 2)))
    gt_inl = np.ones(n, bool)
    gt_inl[outl] = False
    return (p1.astype(np.float32), p2.astype(np.float32),
            K.astype(np.float32), R, t, gt_inl)


def test_find_essential_inliers():
    p1, p2, K, R, t, gt_inl = make_two_view()
    res = find_essential(jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(K),
                         threshold_px=1.5, key=jax.random.PRNGKey(0))
    assert bool(res.success)
    inl = np.asarray(res.inliers)
    assert inl[gt_inl].mean() > 0.9
    assert inl[~gt_inl].mean() < 0.05
    q = essential_quality(res.E)
    assert bool(q["is_valid"])


def test_recover_pose_matches_gt():
    p1, p2, K, R_gt, t_gt, gt_inl = make_two_view()
    res = find_essential(jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(K),
                         key=jax.random.PRNGKey(0))
    R, t, front = recover_pose(res.E, jnp.asarray(p1), jnp.asarray(p2),
                               jnp.asarray(K), mask=res.inliers)
    R, t = np.asarray(R, dtype=np.float64), np.asarray(t, dtype=np.float64)
    # rotation error < 0.5 deg
    dR = R @ R_gt.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.5, f"rotation error {ang:.3f} deg"
    # translation direction error < 1 deg (scale is unobservable)
    cos = abs(t @ t_gt) / (np.linalg.norm(t) * np.linalg.norm(t_gt))
    assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 1.0
    # cheirality: most inliers in front
    assert np.asarray(front)[gt_inl].mean() > 0.9


def test_recover_pose_matches_cv2():
    p1, p2, K, R_gt, t_gt, gt_inl = make_two_view(noise=0.3, seed=5)
    E_cv, mask_cv = cv2.findEssentialMat(p1, p2, K.astype(np.float64),
                                         method=cv2.RANSAC, prob=0.999,
                                         threshold=1.5)
    _, R_cv, t_cv, _ = cv2.recoverPose(E_cv, p1, p2, K.astype(np.float64),
                                       mask=mask_cv.copy())
    res = find_essential(jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(K),
                         key=jax.random.PRNGKey(1))
    R, t, _ = recover_pose(res.E, jnp.asarray(p1), jnp.asarray(p2),
                           jnp.asarray(K), mask=res.inliers)
    R = np.asarray(R, dtype=np.float64)
    dR = R @ R_cv.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 1.0, f"ours vs cv2 rotation diff {ang:.2f} deg"


def test_decompose_essential_properties():
    p1, p2, K, R_gt, t_gt, _ = make_two_view(noise=0.0, n_out=0)
    res = find_essential(jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(K),
                         key=jax.random.PRNGKey(0))
    R1, R2, t = decompose_essential(res.E)
    for R in (np.asarray(R1), np.asarray(R2)):
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(R) - 1) < 1e-5
    assert abs(np.linalg.norm(np.asarray(t)) - 1) < 1e-5


def test_rotation_angle():
    R = cv2.Rodrigues(np.array([0.0, 0.3, 0.0]))[0].astype(np.float32)
    ang = float(rotation_angle_deg(jnp.asarray(R)))
    assert abs(ang - np.degrees(0.3)) < 0.01
