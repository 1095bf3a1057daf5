"""Lie ops + triangulation tests vs cv2 (Rodrigues, projectPoints,
triangulatePoints oracles)."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu3drec.ops.lie import exp_so3, log_so3, project_points, camera_center
from tpu3drec.ops.triangulate import (
    triangulate_points, triangulate_two_view, triangulate_multiview,
    TriangulationConfig, refine_points_gn,
)
from tpu3drec.ops.lie import compose_projection


def test_exp_so3_matches_cv2():
    rng = np.random.default_rng(0)
    for _ in range(5):
        rvec = rng.normal(size=3).astype(np.float32)
        ours = np.asarray(exp_so3(jnp.asarray(rvec)))
        ref = cv2.Rodrigues(rvec.astype(np.float64))[0]
        np.testing.assert_allclose(ours, ref, atol=1e-5)
    # zero rotation
    np.testing.assert_allclose(np.asarray(exp_so3(jnp.zeros(3))), np.eye(3),
                               atol=1e-7)


def test_log_exp_roundtrip():
    rng = np.random.default_rng(1)
    rv = rng.normal(size=(10, 3)).astype(np.float32) * 0.8
    R = exp_so3(jnp.asarray(rv))
    back = np.asarray(log_so3(R))
    np.testing.assert_allclose(back, rv, atol=1e-4)


def test_project_points_matches_cv2():
    rng = np.random.default_rng(2)
    X = rng.uniform(-2, 2, size=(50, 3)) + np.array([0, 0, 6.0])
    rvec = np.array([0.1, -0.2, 0.05])
    tvec = np.array([0.3, 0.1, 0.5])
    K = np.array([[600, 0, 320], [0, 610, 240], [0, 0, 1]], np.float64)
    ref, _ = cv2.projectPoints(X, rvec, tvec, K, None)
    ours = np.asarray(project_points(jnp.asarray(X.astype(np.float32)),
                                     jnp.asarray(rvec.astype(np.float32)),
                                     jnp.asarray(tvec.astype(np.float32)),
                                     jnp.asarray(K.astype(np.float32))))
    np.testing.assert_allclose(ours, ref[:, 0], atol=2e-2)


def make_scene(n=100, noise=0.0, seed=3):
    rng = np.random.default_rng(seed)
    K = np.array([[600, 0, 320], [0, 600, 240], [0, 0, 1]], np.float64)
    R1, t1 = np.eye(3), np.zeros(3)
    R2 = cv2.Rodrigues(np.array([0.03, 0.3, 0.01]))[0]
    t2 = np.array([-1.2, 0.05, 0.1])
    X = rng.uniform(-3, 3, size=(n, 3)) + np.array([0, 0, 8.0])
    def proj(R, t):
        x = (K @ (R @ X.T + t[:, None])).T
        return x[:, :2] / x[:, 2:3]
    p1 = proj(R1, t1) + noise * rng.standard_normal((n, 2))
    p2 = proj(R2, t2) + noise * rng.standard_normal((n, 2))
    return (X, p1.astype(np.float32), p2.astype(np.float32),
            K.astype(np.float32), R1.astype(np.float32), t1.astype(np.float32),
            R2.astype(np.float32), t2.astype(np.float32))


def test_triangulate_points_noise_free():
    X, p1, p2, K, R1, t1, R2, t2 = make_scene()
    P1 = np.asarray(compose_projection(jnp.asarray(K), jnp.asarray(R1), jnp.asarray(t1)))
    P2 = np.asarray(compose_projection(jnp.asarray(K), jnp.asarray(R2), jnp.asarray(t2)))
    Xt = np.asarray(triangulate_points(jnp.asarray(p1), jnp.asarray(p2),
                                       jnp.asarray(P1), jnp.asarray(P2)))
    err = np.linalg.norm(Xt - X, axis=1)
    assert np.median(err) < 5e-3


def test_triangulate_matches_cv2():
    X, p1, p2, K, R1, t1, R2, t2 = make_scene(noise=0.3)
    P1 = K @ np.concatenate([R1, t1[:, None]], 1)
    P2 = K @ np.concatenate([R2, t2[:, None]], 1)
    ref_h = cv2.triangulatePoints(P1.astype(np.float64), P2.astype(np.float64),
                                  p1.T.astype(np.float64), p2.T.astype(np.float64))
    ref = (ref_h[:3] / ref_h[3]).T
    ours = np.asarray(triangulate_points(jnp.asarray(p1), jnp.asarray(p2),
                                         jnp.asarray(P1.astype(np.float32)),
                                         jnp.asarray(P2.astype(np.float32))))
    err = np.linalg.norm(ours - ref, axis=1)
    assert np.median(err) < 1e-2


def test_two_view_filters():
    X, p1, p2, K, R1, t1, R2, t2 = make_scene(noise=0.3)
    # corrupt some correspondences
    p2c = p2.copy()
    p2c[:10] += 50.0
    res = triangulate_two_view(jnp.asarray(p1), jnp.asarray(p2c),
                               jnp.asarray(K), jnp.asarray(K),
                               jnp.asarray(R1), jnp.asarray(t1),
                               jnp.asarray(R2), jnp.asarray(t2))
    m = np.asarray(res.mask)
    assert m[10:].mean() > 0.9       # good points survive
    assert m[:10].sum() == 0          # corrupted rejected by reproj filter
    X_ok = np.asarray(res.points)[m]
    gt_ok = X[np.where(m)[0]]
    assert np.median(np.linalg.norm(X_ok - gt_ok, axis=1)) < 0.05
    assert float(np.asarray(res.reproj_err)[m].mean()) < 0.5


def test_multiview_dlt():
    X, p1, p2, K, R1, t1, R2, t2 = make_scene(noise=0.0, n=20)
    # add a third view
    R3 = cv2.Rodrigues(np.array([0.0, -0.25, 0.02]))[0].astype(np.float32)
    t3 = np.array([1.0, -0.1, 0.05], np.float32)
    P1 = np.asarray(compose_projection(jnp.asarray(K), jnp.asarray(R1), jnp.asarray(t1)))
    P2 = np.asarray(compose_projection(jnp.asarray(K), jnp.asarray(R2), jnp.asarray(t2)))
    P3 = np.asarray(compose_projection(jnp.asarray(K), jnp.asarray(R3), jnp.asarray(t3)))
    x3 = np.concatenate([X, np.ones((20, 1))], 1) @ P3.T
    p3 = (x3[:, :2] / x3[:, 2:3]).astype(np.float32)
    Ps = jnp.asarray(np.stack([P1, P2, P3]))
    pts = jnp.asarray(np.stack([p1, p2, p3], axis=1))  # (N, V, 2)
    vmask = jnp.ones((20, 3), bool)
    Xt = np.asarray(jax.vmap(triangulate_multiview, in_axes=(0, None, 0))(
        pts, Ps, vmask))
    assert np.median(np.linalg.norm(Xt - X, axis=1)) < 5e-3
    # masked third view still works (falls back to 2-view)
    vmask2 = vmask.at[:, 2].set(False)
    Xt2 = np.asarray(jax.vmap(triangulate_multiview, in_axes=(0, None, 0))(
        pts, Ps, vmask2))
    assert np.median(np.linalg.norm(Xt2 - X, axis=1)) < 1e-2


def test_gn_refinement_reduces_error():
    X, p1, p2, K, R1, t1, R2, t2 = make_scene(noise=1.0)
    P1 = jnp.asarray(K @ np.concatenate([R1, t1[:, None]], 1))
    P2 = jnp.asarray(K @ np.concatenate([R2, t2[:, None]], 1))
    X0 = triangulate_points(jnp.asarray(p1), jnp.asarray(p2), P1, P2)
    # perturb and refine back
    Xp = X0 + 0.05
    Xr = refine_points_gn(Xp, jnp.asarray(p1), jnp.asarray(p2), P1, P2, iters=5)
    def cost(Xs):
        from tpu3drec.ops.geometry import to_homogeneous
        a = to_homogeneous(Xs) @ P1.T
        b = to_homogeneous(Xs) @ P2.T
        ea = a[:, :2] / a[:, 2:3] - p1
        eb = b[:, :2] / b[:, 2:3] - p2
        return float(jnp.sum(ea ** 2 + eb ** 2))
    assert cost(Xr) < cost(Xp) * 0.2


def _two_view_geom(seed=0, noise=1.0, n=200):
    rng = np.random.default_rng(seed)
    K = np.array([[600, 0, 320], [0, 600, 240], [0, 0, 1]], np.float64)
    R = cv2.Rodrigues(np.array([0.02, 0.3, 0.01]))[0]
    t = np.array([1.0, 0.1, 0.05])
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    F = np.linalg.inv(K).T @ tx @ R @ np.linalg.inv(K)
    X = rng.uniform(-3, 3, (n, 3)) + np.array([0, 0, 8.0])
    uv1, _ = cv2.projectPoints(X, np.zeros(3), np.zeros(3), K, None)
    uv2, _ = cv2.projectPoints(X, cv2.Rodrigues(R)[0], t, K, None)
    n1 = uv1[:, 0] + noise * rng.standard_normal((n, 2))
    n2 = uv2[:, 0] + noise * rng.standard_normal((n, 2))
    return K, R, t, F, X, n1, n2


def test_hartley_sturm_matches_cv2_correctmatches():
    """Exact optimal correction parity vs cv2.correctMatches
    (VERDICT r1 missing #5: only the first-order Sampson step existed)."""
    from tpu3drec.ops.triangulate import hartley_sturm_correct
    K, R, t, F, X, n1, n2 = _two_view_geom()
    c1cv, c2cv = cv2.correctMatches(F, n1[None], n2[None])
    c1, c2 = hartley_sturm_correct(
        jnp.asarray(n1, jnp.float32), jnp.asarray(n2, jnp.float32),
        jnp.asarray(F, jnp.float32))
    d1 = np.linalg.norm(np.asarray(c1) - c1cv[0], axis=1)
    d2 = np.linalg.norm(np.asarray(c2) - c2cv[0], axis=1)
    assert np.median(d1) < 1e-3 and np.median(d2) < 1e-3
    assert np.percentile(d1, 99) < 1e-2

    def resid(a, b):
        ah = np.concatenate([a, np.ones((len(a), 1))], 1)
        bh = np.concatenate([b, np.ones((len(b), 1))], 1)
        return np.abs(np.sum(bh * (ah @ F.T), axis=1))

    # correction lands on the epipolar constraint (f32 exactness)
    assert np.median(resid(np.asarray(c1), np.asarray(c2))) < 1e-6


def test_reprojection_parity_with_opencv_triangulation():
    """BASELINE.md gate: reprojection error within 1% of the OpenCV
    reference chain (correctMatches + triangulatePoints)."""
    from tpu3drec.ops.triangulate import (
        triangulate_two_view, TriangulationConfig,
    )
    K, R, t, F, X, n1, n2 = _two_view_geom(noise=0.8)
    P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = K @ np.hstack([R, t[:, None]])
    c1cv, c2cv = cv2.correctMatches(F, n1[None], n2[None])
    Xh = cv2.triangulatePoints(P1, P2, c1cv[0].T, c2cv[0].T)
    Xcv = (Xh[:3] / Xh[3]).T

    def mean_reproj(Xw):
        e = []
        for P, uv in ((P1, n1), (P2, n2)):
            pr = (np.concatenate([Xw, np.ones((len(Xw), 1))], 1) @ P.T)
            pr = pr[:, :2] / pr[:, 2:3]
            e.append(np.linalg.norm(pr - uv, axis=1))
        return float(np.mean(e))

    res = triangulate_two_view(
        jnp.asarray(n1, jnp.float32), jnp.asarray(n2, jnp.float32),
        jnp.asarray(K, jnp.float32), jnp.asarray(K, jnp.float32),
        jnp.eye(3), jnp.zeros(3),
        jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32),
        config=TriangulationConfig(correction="hartley_sturm"))
    ours = mean_reproj(np.asarray(res.points))
    cv = mean_reproj(Xcv)
    assert ours <= cv * 1.01, (ours, cv)
