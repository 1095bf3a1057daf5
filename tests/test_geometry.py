"""Homography / fundamental RANSAC tests on synthetic ground truth, with
cv2 as an accuracy oracle (reference: utils.py:118-153, pair_selector.py:117)."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu3drec.ops.geometry import (
    solve_homography_dlt, homography_transfer_error, find_homography,
    solve_fundamental_8pt, sampson_error, find_fundamental,
    reprojection_error_homography,
)


def make_h_data(n=200, n_out=60, noise=0.5, seed=0):
    r = np.random.default_rng(seed)
    H = np.array([[1.1, 0.05, 10.0],
                  [-0.03, 0.95, -5.0],
                  [1e-4, -5e-5, 1.0]], np.float64)
    p1 = r.uniform(0, 500, size=(n, 2))
    ph = np.concatenate([p1, np.ones((n, 1))], axis=1) @ H.T
    p2 = ph[:, :2] / ph[:, 2:3] + noise * r.standard_normal((n, 2))
    outl = r.permutation(n)[:n_out]
    p2[outl] += r.uniform(30, 120, size=(n_out, 2)) * np.sign(r.standard_normal((n_out, 2)))
    inlier_gt = np.ones(n, bool)
    inlier_gt[outl] = False
    return (p1.astype(np.float32), p2.astype(np.float32), H, inlier_gt)


def test_dlt_homography_exact():
    p1, p2, H, _ = make_h_data(n=40, n_out=0, noise=0.0)
    Hs, ok = solve_homography_dlt(jnp.asarray(p1[:4]), jnp.asarray(p2[:4]))
    assert bool(ok)
    err = np.asarray(homography_transfer_error(Hs, jnp.asarray(p1), jnp.asarray(p2)))
    # float32 minimal solve carries ~0.03px rounding at 500px coordinate
    # scale (f64 reference reaches 0.001px); 0.1px still catches real bugs
    assert np.sqrt(err.max()) < 0.1


def test_find_homography_vs_gt_and_cv2():
    p1, p2, H, inlier_gt = make_h_data()
    res = find_homography(jnp.asarray(p1), jnp.asarray(p2), threshold=3.0,
                          key=jax.random.PRNGKey(1))
    assert bool(res.success)
    inl = np.asarray(res.inliers)
    # recovers essentially all true inliers, rejects all outliers
    assert inl[inlier_gt].mean() > 0.97
    assert inl[~inlier_gt].mean() < 0.05

    Hcv, mask_cv = cv2.findHomography(p1, p2, cv2.RANSAC, 3.0)
    ours = np.array(res.model)
    ours /= ours[2, 2]
    Hcv /= Hcv[2, 2]
    # same model up to noise-level differences
    assert np.abs(ours - Hcv).max() / np.abs(Hcv).max() < 0.02

    # mean reprojection error on inliers comparable to cv2's (within 20%)
    def mean_err(Hm):
        ph = np.concatenate([p1, np.ones((len(p1), 1))], 1) @ Hm.T
        proj = ph[:, :2] / ph[:, 2:3]
        return np.linalg.norm(proj - p2, axis=1)[inlier_gt].mean()
    assert mean_err(ours) < mean_err(Hcv) * 1.2 + 1e-3


def test_reprojection_error_helper():
    p1, p2, H, inlier_gt = make_h_data(noise=0.0, n_out=0)
    err = reprojection_error_homography(jnp.asarray(H.astype(np.float32)),
                                        jnp.asarray(p1), jnp.asarray(p2),
                                        jnp.ones(len(p1), bool))
    assert float(err) < 1e-2


def make_f_data(n=300, n_out=75, noise=0.5, seed=1):
    r = np.random.default_rng(seed)
    K = np.array([[600, 0, 320], [0, 600, 240], [0, 0, 1]], np.float64)
    # camera 2 rotated + translated
    angle = 0.15
    R = cv2.Rodrigues(np.array([0.05, angle, 0.02]))[0]
    t = np.array([1.0, 0.1, 0.2])
    X = r.uniform(-2, 2, size=(n, 3)) + np.array([0, 0, 6.0])
    x1 = (K @ X.T).T
    p1 = x1[:, :2] / x1[:, 2:3]
    x2 = (K @ (R @ X.T + t[:, None])).T
    p2 = x2[:, :2] / x2[:, 2:3]
    p1 += noise * r.standard_normal((n, 2))
    p2 += noise * r.standard_normal((n, 2))
    outl = r.permutation(n)[:n_out]
    p2[outl] += r.uniform(25, 90, size=(n_out, 2)) * np.sign(r.standard_normal((n_out, 2)))
    inlier_gt = np.ones(n, bool)
    inlier_gt[outl] = False
    # ground-truth F = K^-T [t]x R K^-1
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    F = np.linalg.inv(K).T @ tx @ R @ np.linalg.inv(K)
    F /= np.linalg.norm(F)
    return p1.astype(np.float32), p2.astype(np.float32), F, inlier_gt


def test_fundamental_8pt_noise_free():
    p1, p2, F_gt, _ = make_f_data(noise=0.0, n_out=0)
    F, ok = solve_fundamental_8pt(jnp.asarray(p1), jnp.asarray(p2))
    assert bool(ok)
    err = np.asarray(sampson_error(F, jnp.asarray(p1), jnp.asarray(p2)))
    assert np.sqrt(err).max() < 1e-2


def test_find_fundamental_vs_gt():
    p1, p2, F_gt, inlier_gt = make_f_data()
    res = find_fundamental(jnp.asarray(p1), jnp.asarray(p2), threshold=2.0,
                           key=jax.random.PRNGKey(3))
    assert bool(res.success)
    inl = np.asarray(res.inliers)
    assert inl[inlier_gt].mean() > 0.95
    assert inl[~inlier_gt].mean() < 0.05
    # Sampson residual of true inliers under our F should be small
    err = np.sqrt(np.asarray(res.residuals))[inlier_gt]
    assert np.median(err) < 1.5


def test_ransac_with_mask_and_padding():
    p1, p2, H, inlier_gt = make_h_data(n=150, n_out=40)
    # pad with garbage rows that the mask must exclude
    pad = np.full((50, 2), 1e6, np.float32)
    p1p = np.concatenate([p1, pad])
    p2p = np.concatenate([p2, pad])
    mask = np.concatenate([np.ones(150, bool), np.zeros(50, bool)])
    res = find_homography(jnp.asarray(p1p), jnp.asarray(p2p),
                          mask=jnp.asarray(mask), threshold=3.0,
                          key=jax.random.PRNGKey(2))
    assert bool(res.success)
    assert not np.any(np.asarray(res.inliers)[150:])


def test_lie_numpy_twins_roundtrip():
    """Host-side log/exp SO(3) twins (used for BA problem packing) match
    each other and the jax versions, including the pi neighbourhood."""
    import numpy as np
    import jax.numpy as jnp
    from tpu3drec.ops.lie import exp_so3, log_so3_np, exp_so3_np

    rng = np.random.default_rng(3)
    ws = rng.standard_normal((100, 3)) * rng.uniform(0, 3.1, (100, 1))
    ws[0] = 0.0
    ws[1] = [np.pi, 0.0, 0.0]
    ws[2] = [0.0, 1e-9, 0.0]
    ws[3] = [0.0, 0.0, np.pi - 1e-4]
    Rs = exp_so3_np(ws)
    # orthonormality
    RtR = np.einsum("nij,nik->njk", Rs, Rs)
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape),
                               atol=1e-12)
    # round trip through the log map
    Rr = exp_so3_np(log_so3_np(Rs))
    np.testing.assert_allclose(Rs, Rr, atol=1e-8)
    # parity vs the jax exp map
    Rj = np.asarray(exp_so3(jnp.asarray(ws[4], jnp.float32)))
    np.testing.assert_allclose(Rs[4], Rj, atol=1e-5)


def test_sample_minimal_sets_distinct_valid_uniform():
    """Floyd's-over-ranks sampler: distinct indices, valid-only, and
    per-point selection frequency uniform across the valid set."""
    from tpu3drec.ops.ransac import sample_minimal_sets

    n, s, k = 64, 5, 4000
    mask = np.zeros(n, bool)
    valid = np.arange(7, 43)          # 36 valid points, non-contiguous start
    mask[valid] = True
    idx = np.asarray(sample_minimal_sets(
        jax.random.PRNGKey(0), jnp.asarray(mask), k, s))
    assert idx.shape == (k, s)
    # distinct within each hypothesis
    assert all(len(set(row)) == s for row in idx)
    # valid-only
    assert mask[idx].all()
    # roughly uniform marginal frequency: each valid point expected
    # k*s/36 ~= 555 times; chi-square-ish band check
    counts = np.bincount(idx.reshape(-1), minlength=n)[valid]
    exp = k * s / len(valid)
    assert counts.min() > 0.8 * exp and counts.max() < 1.2 * exp

    # degenerate: fewer valid points than sample_size still returns
    # in-range indices (degenerate models are rejected by scoring)
    mask2 = np.zeros(n, bool)
    mask2[[3, 9]] = True
    idx2 = np.asarray(sample_minimal_sets(
        jax.random.PRNGKey(1), jnp.asarray(mask2), 16, 5))
    assert ((idx2 >= 0) & (idx2 < n)).all()


def test_flat_4pt_solver_matches_closed_oracle():
    """The SoA hypothesis solver (_homography_4pt_flat) must interpolate
    its 4 points as exactly as the 3x3 reference implementation and
    agree on validity (the flat form is the RANSAC hot path; the closed
    3x3 form is kept as the oracle)."""
    from tpu3drec.ops.geometry import (
        _homography_4pt_closed, _homography_4pt_flat,
        _homography_transfer_error_flat)
    rng = np.random.default_rng(7)
    H = np.array([[1.05, 0.08, 4.0], [-0.06, 0.92, -3.0],
                  [2e-4, -1e-4, 1.0]], np.float32)
    for t in range(50):
        p1 = rng.uniform(0, 640, (4, 2)).astype(np.float32)
        ph = np.c_[p1, np.ones(4)] @ H.T
        p2 = (ph[:, :2] / ph[:, 2:]).astype(np.float32)
        Ha, oka = _homography_4pt_closed(jnp.asarray(p1), jnp.asarray(p2))
        hv, okf = _homography_4pt_flat(jnp.asarray(p1), jnp.asarray(p2))
        assert bool(oka) == bool(okf)
        if not bool(oka):
            continue
        # both must interpolate the minimal sample to sub-0.1px
        for Hm in (np.asarray(Ha), np.asarray(hv).reshape(3, 3)):
            q = np.c_[p1, np.ones(4)] @ Hm.T
            assert np.abs(q[:, :2] / q[:, 2:] - p2).max() < 0.1
        # flat residuals == 3x3 residuals on arbitrary points
        pts = rng.uniform(0, 640, (32, 2)).astype(np.float32)
        qh = np.c_[pts, np.ones(32)] @ H.T
        qts = (qh[:, :2] / qh[:, 2:]).astype(np.float32)
        r_flat = np.asarray(_homography_transfer_error_flat(
            hv, jnp.asarray(pts), jnp.asarray(qts)))
        r_ref = np.asarray(homography_transfer_error(
            jnp.asarray(np.asarray(hv).reshape(3, 3)), jnp.asarray(pts),
            jnp.asarray(qts)))
        np.testing.assert_allclose(r_flat, r_ref, rtol=1e-4, atol=1e-4)
