"""Bundle adjustment tests: convergence to GT on synthetic scenes and
parity with scipy least_squares (the reference's solver,
bundle_adjusment.py:168-193)."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu3drec.ops.ba import (
    BAProblem, BAConfig, bundle_adjust, make_cam_params, unpack_cam_params,
    residuals, mean_reproj_error,
)


def make_ba_scene(n_cams=4, n_pts=120, noise_px=0.5, seed=0):
    rng = np.random.default_rng(seed)
    K = np.array([[600, 0, 320], [0, 600, 240], [0, 0, 1]], np.float64)
    X = rng.uniform(-3, 3, size=(n_pts, 3)) + np.array([0, 0, 10.0])
    cams = []
    for c in range(n_cams):
        rvec = np.array([0.02 * c, 0.15 * c - 0.2, 0.01 * c])
        tvec = np.array([0.8 * c - 1.2, 0.05 * c, 0.1 * rng.standard_normal()])
        cams.append((rvec, tvec))
    obs_cam, obs_pt, obs_uv = [], [], []
    for ci, (rvec, tvec) in enumerate(cams):
        uv, _ = cv2.projectPoints(X, rvec, tvec, K, None)
        uv = uv[:, 0]
        ok = (uv[:, 0] > 0) & (uv[:, 0] < 640) & (uv[:, 1] > 0) & (uv[:, 1] < 480)
        for pi in np.where(ok)[0]:
            obs_cam.append(ci)
            obs_pt.append(pi)
            obs_uv.append(uv[pi] + noise_px * rng.standard_normal(2))
    return (K, cams, X, np.array(obs_cam, np.int32),
            np.array(obs_pt, np.int32), np.array(obs_uv, np.float32))


def build_problem(K, cams, X, obs_cam, obs_pt, obs_uv,
                  cam_jitter=0.0, pt_jitter=0.0, seed=1,
                  fix_first=True, optimize_intrinsics=False):
    rng = np.random.default_rng(seed)
    cp = np.stack([
        np.asarray(make_cam_params(r + cam_jitter * rng.standard_normal(3) * 0.02,
                                   t + cam_jitter * rng.standard_normal(3) * 0.05,
                                   K))
        for r, t in cams])
    pts = X.astype(np.float32) + pt_jitter * rng.standard_normal(X.shape).astype(np.float32)
    pm = np.ones((len(cams), 10), np.float32)
    if fix_first:
        pm[0] = 0.0
        # also fix second camera's tx to pin scale gauge
        pm[1, 3] = 0.0
    if not optimize_intrinsics:
        pm[:, 6:] = 0.0
    return BAProblem(
        cam_params=jnp.asarray(cp),
        points=jnp.asarray(pts),
        obs_cam=jnp.asarray(obs_cam),
        obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(obs_uv),
        obs_mask=jnp.ones(len(obs_cam), bool),
        param_mask=jnp.asarray(pm),
        point_mask=jnp.ones(len(pts), bool),
    )


def test_residuals_zero_at_gt():
    K, cams, X, oc, op, uv = make_ba_scene(noise_px=0.0)
    prob = build_problem(K, cams, X, oc, op, uv)
    assert float(mean_reproj_error(prob)) < 0.01


def test_ba_recovers_from_perturbation():
    K, cams, X, oc, op, uv = make_ba_scene(noise_px=0.3)
    prob = build_problem(K, cams, X, oc, op, uv,
                         cam_jitter=1.0, pt_jitter=0.05)
    before = float(mean_reproj_error(prob))
    assert before > 2.0  # perturbation is visible
    res = bundle_adjust(prob, BAConfig(max_iters=30))
    after = float(res.mean_reproj_px)
    assert after < 0.6, f"BA did not converge: {before:.2f} -> {after:.2f}"
    assert float(res.cost_final) < float(res.cost_initial) * 0.1


def test_ba_fix_first_camera_gauge():
    K, cams, X, oc, op, uv = make_ba_scene()
    prob = build_problem(K, cams, X, oc, op, uv, cam_jitter=1.0)
    res = bundle_adjust(prob, BAConfig(max_iters=15))
    np.testing.assert_allclose(np.asarray(res.cam_params[0]),
                               np.asarray(prob.cam_params[0]), atol=1e-7)


def test_ba_huber_robust_to_outliers():
    K, cams, X, oc, op, uv = make_ba_scene(noise_px=0.3)
    rng = np.random.default_rng(3)
    bad = rng.permutation(len(uv))[:len(uv) // 10]
    uv = uv.copy()
    uv[bad] += 80.0
    prob = build_problem(K, cams, X, oc, op, uv, cam_jitter=0.5, pt_jitter=0.02)
    res = bundle_adjust(prob, BAConfig(max_iters=30))
    # median reprojection over inlier observations must stay low
    final = prob._replace(cam_params=res.cam_params, points=res.points)
    r = np.linalg.norm(np.asarray(residuals(final)), axis=1)
    good = np.ones(len(uv), bool)
    good[bad] = False
    # Huber's linear tail still gives 80px outliers some pull; the pipeline
    # additionally re-validates points after BA (reference CPE/pipeline.py:594)
    assert np.median(r[good]) < 1.0


def test_ba_parity_with_scipy():
    """Same problem solved by scipy least_squares (reference solver) —
    final mean reprojection errors must agree closely."""
    from scipy.optimize import least_squares
    K, cams, X, oc, op, uv = make_ba_scene(n_cams=3, n_pts=60, noise_px=0.5)
    prob = build_problem(K, cams, X, oc, op, uv,
                         cam_jitter=0.7, pt_jitter=0.03)

    n_cams, n_pts = len(cams), len(X)
    x0_cams = np.asarray(prob.cam_params)[:, :6]  # extrinsics only
    x0_pts = np.asarray(prob.points)
    x0 = np.concatenate([x0_cams[1:].ravel(), x0_pts.ravel()])  # cam0 fixed

    def fun(x):
        cams_x = np.vstack([x0_cams[:1],
                            x[:(n_cams - 1) * 6].reshape(-1, 6)])
        pts_x = x[(n_cams - 1) * 6:].reshape(-1, 3)
        res = []
        for ci, pi, ob in zip(oc, op, uv):
            proj, _ = cv2.projectPoints(pts_x[pi:pi + 1],
                                        cams_x[ci, :3], cams_x[ci, 3:6],
                                        K, None)
            res.append(proj[0, 0] - ob)
        return np.concatenate(res)

    sol = least_squares(fun, x0, method="trf", loss="huber", f_scale=2.0,
                        max_nfev=40)
    scipy_err = np.linalg.norm(sol.fun.reshape(-1, 2), axis=1).mean()

    res = bundle_adjust(prob, BAConfig(max_iters=30))
    ours_err = float(res.mean_reproj_px)
    assert ours_err < scipy_err * 1.1 + 0.05, \
        f"ours {ours_err:.3f} vs scipy {scipy_err:.3f}"


def test_ba_with_masked_observations():
    K, cams, X, oc, op, uv = make_ba_scene(noise_px=0.2)
    prob = build_problem(K, cams, X, oc, op, uv, cam_jitter=0.5)
    # pad with garbage observations that the mask must neutralize
    pad = 50
    prob = prob._replace(
        obs_cam=jnp.concatenate([prob.obs_cam, jnp.zeros(pad, jnp.int32)]),
        obs_pt=jnp.concatenate([prob.obs_pt, jnp.zeros(pad, jnp.int32)]),
        obs_uv=jnp.concatenate([prob.obs_uv,
                                jnp.full((pad, 2), 1e5, jnp.float32)]),
        obs_mask=jnp.concatenate([prob.obs_mask, jnp.zeros(pad, bool)]),
    )
    res = bundle_adjust(prob, BAConfig(max_iters=20))
    assert float(res.mean_reproj_px) < 1.0


def test_ba_cg_matches_dense_solver():
    """The matrix-free Schur-CG path must reach the same optimum as the
    dense-W solver (VERDICT r1 weak #6: dense W is (P,C,10,3) and cannot
    scale to reference-size global BA)."""
    K, cams, X, oc, op, uv = make_ba_scene(n_cams=5, n_pts=150, noise_px=0.4)
    prob = build_problem(K, cams, X, oc, op, uv, cam_jitter=1.0, pt_jitter=0.05)
    r_dense = bundle_adjust(prob, BAConfig(max_iters=25, schur_solver="dense"))
    r_cg = bundle_adjust(prob, BAConfig(max_iters=25, schur_solver="cg"))
    assert float(r_cg.cost_final) <= float(r_dense.cost_final) * 1.05
    assert float(r_cg.mean_reproj_px) < 1.0
    np.testing.assert_allclose(np.asarray(r_cg.points),
                               np.asarray(r_dense.points), atol=0.05)


def test_ba_cg_scales_to_many_cameras():
    """Global-BA regime: 48 cameras (auto switches to CG), thousands of
    observations; must converge without materializing (P, C) blocks."""
    K, cams, X, oc, op, uv = make_ba_scene(n_cams=48, n_pts=400,
                                           noise_px=0.4, seed=5)
    prob = build_problem(K, cams, X, oc, op, uv, cam_jitter=1.0,
                         pt_jitter=0.05, seed=6)
    res = bundle_adjust(prob, BAConfig(max_iters=25))  # auto -> cg
    assert float(res.cost_final) < 0.2 * float(res.cost_initial)
    assert float(res.mean_reproj_px) < 1.0, float(res.mean_reproj_px)


def test_ba_skip_gate_zero_iterations():
    """skip_if_below_px: a problem already below the gate runs 0 LM
    iterations and returns its params unchanged (VERDICT r4 #3)."""
    K, cams, X, oc, op, uv = make_ba_scene(noise_px=0.1)
    prob = build_problem(K, cams, X, oc, op, uv)  # near-GT: mre ~0.1px
    res = bundle_adjust(prob, BAConfig(max_iters=20, skip_if_below_px=0.5))
    assert int(res.iterations) == 0
    np.testing.assert_array_equal(np.asarray(res.cam_params),
                                  np.asarray(prob.cam_params))
    np.testing.assert_array_equal(np.asarray(res.points),
                                  np.asarray(prob.points))
    # a genuinely perturbed problem must NOT skip
    prob2 = build_problem(K, cams, X, oc, op, uv, cam_jitter=1.0,
                          pt_jitter=0.05)
    res2 = bundle_adjust(prob2, BAConfig(max_iters=20,
                                         skip_if_below_px=0.5))
    assert int(res2.iterations) > 0
    assert float(res2.mean_reproj_px) < 0.6


def test_ba_warm_start_lambda():
    """lambda0 warm start converges to the same solution and the final
    damping is exported in stats[4] for the next solve."""
    K, cams, X, oc, op, uv = make_ba_scene(noise_px=0.3)
    prob = build_problem(K, cams, X, oc, op, uv, cam_jitter=1.0,
                         pt_jitter=0.05)
    cold = bundle_adjust(prob, BAConfig(max_iters=30))
    lam_final = float(np.asarray(cold.stats)[4])
    assert lam_final > 0
    warm = bundle_adjust(prob, BAConfig(max_iters=30),
                         lambda0=jnp.float32(lam_final))
    # a different damping trajectory may settle in a slightly different
    # local optimum — the quality must match, not the exact params
    assert float(warm.mean_reproj_px) < float(cold.mean_reproj_px) + 0.05
    assert np.asarray(cold.stats).shape == (6,)
