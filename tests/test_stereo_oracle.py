"""cv2 oracle tests for the stereo stage (VERDICT r3 #4).

(a) Rectification: the Fusiello homographies (ops/stereo.py:
    rectify_homographies) must produce row-aligned epipolar geometry on
    a synthetic calibrated pair, to the same quality cv2.stereoRectify
    achieves on the identical inputs (reference uses cv2.stereoRectify,
    DenseReconstruction/stereo_matching.py:108-149).
(b) Disparity: on a synthetic rectified pair with ground-truth
    disparity, the SGM pipeline's bad-pixel rate must be within a few
    points of cv2.StereoSGBM's on the same pair
    (stereo_matching.py:49-95 builds StereoSGBM_create).
"""

import cv2
import numpy as np
import jax.numpy as jnp

from tpu3drec.ops.stereo import (
    rectify_homographies, stereo_depth_rectified,
)


def _scene_points(rng, n=500):
    return rng.uniform(-3, 3, (n, 3)) + np.array([0, 0, 8.0])


def _project(K, R, t, X):
    Xc = X @ R.T + t
    uv = Xc[:, :2] / Xc[:, 2:3]
    return uv @ K[:2, :2].T + K[:2, 2]


def _apply_h(H, uv):
    p = np.concatenate([uv, np.ones((len(uv), 1))], axis=1) @ H.T
    return p[:, :2] / p[:, 2:3]


def test_rectification_row_alignment_vs_cv2():
    """Max |y1_rect - y2_rect| over corresponding points: ours vs
    cv2.stereoRectify on the same calibrated pair."""
    rng = np.random.default_rng(0)
    K = np.array([[600, 0, 320], [0, 600, 240], [0, 0, 1]], np.float64)
    # camera 2: mostly-horizontal baseline + a small rotation
    rvec = np.array([0.02, -0.04, 0.01])
    R = cv2.Rodrigues(rvec)[0]
    t = np.array([-0.5, 0.03, 0.02])
    X = _scene_points(rng)
    uv1 = _project(K, np.eye(3), np.zeros(3), X)
    uv2 = _project(K, R, t, X)
    inside = ((uv1 > 10) & (uv1 < [630, 470])).all(1) \
        & ((uv2 > 10) & (uv2 < [630, 470])).all(1)
    uv1, uv2 = uv1[inside], uv2[inside]
    assert inside.sum() > 100

    # ours
    H1, H2, _ = rectify_homographies(
        jnp.asarray(K, jnp.float32), jnp.asarray(K, jnp.float32),
        jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32))
    r1 = _apply_h(np.asarray(H1, np.float64), uv1)
    r2 = _apply_h(np.asarray(H2, np.float64), uv2)
    ours = np.abs(r1[:, 1] - r2[:, 1]).max()

    # cv2 oracle: rectified y via R1/R2 + P1/P2
    dist = np.zeros(5)
    R1, R2, P1, P2, Q, roi1, roi2 = cv2.stereoRectify(
        K, dist, K, dist, (640, 480), R, t.reshape(3, 1))

    def cv2_rect_y(Rr, Pr, Rc, tc):
        Xc = X[inside] @ Rc.T + tc
        Xr = Xc @ Rr.T
        uvh = Xr @ Pr[:, :3].T + Pr[:, 3]
        return uvh[:, 1] / uvh[:, 2]

    y1 = cv2_rect_y(R1, P1, np.eye(3), np.zeros(3))
    y2 = cv2_rect_y(R2, P2, R, t)
    oracle = np.abs(y1 - y2).max()

    # both must row-align essentially exactly (sub-0.05px); ours must
    # not be meaningfully worse than cv2's
    assert oracle < 0.05, f"cv2 oracle unexpectedly misaligned: {oracle}"
    assert ours < max(2.0 * oracle, 0.05), (
        f"Fusiello rectification misaligns rows: ours {ours:.4f}px "
        f"vs cv2 {oracle:.4f}px")


def _textured(rng, h, w):
    img = np.zeros((h, w), np.float32)
    for _ in range(120):
        y, x = rng.integers(0, h - 20), rng.integers(0, w - 20)
        hh, ww = rng.integers(4, 30), rng.integers(4, 30)
        img[y:y + hh, x:x + ww] += rng.uniform(-0.5, 0.5)
    img += 0.1 * rng.standard_normal((h, w)).astype(np.float32)
    img = cv2.GaussianBlur(img, (5, 5), 1.0)
    img -= img.min()
    img /= img.max()
    return img.astype(np.float32)


def _gt_pair(rng, h=240, w=320):
    """Rectified pair with piecewise-constant GT left-disparity: the
    right image is the texture, left(y,x) = tex(y, x - d(y,x)) so the
    correspondence is exact by construction."""
    tex = _textured(rng, h, w)
    disp = np.full((h, w), 10.0, np.float32)
    disp[60:180, 90:230] = 26.0          # near object
    disp[100:150, 140:200] = 40.0        # nearer inset
    xs = np.arange(w, dtype=np.float32)[None, :] - disp
    xi = np.clip(np.floor(xs).astype(np.int32), 0, w - 2)
    f = xs - xi
    rows = np.arange(h)[:, None]
    left = tex[rows, xi] * (1 - f) + tex[rows, xi + 1] * f
    # evaluation mask: inside the disparity range, away from the
    # discontinuities (occlusion bands), away from the left border
    valid = np.ones((h, w), bool)
    valid[:, :48] = False
    edge = (np.abs(np.diff(disp, axis=1, prepend=disp[:, :1])) > 0.1)
    edge = cv2.dilate(edge.astype(np.uint8),
                      np.ones((3, 45), np.uint8)).astype(bool)
    valid &= ~edge
    return left.astype(np.float32), tex, disp, valid


def _bad_rate(pred, gt, eval_mask, pred_valid, thresh=2.0):
    m = eval_mask & pred_valid
    assert m.sum() > 0.2 * eval_mask.sum(), "predictor rejected too much"
    return float((np.abs(pred[m] - gt[m]) > thresh).mean())


def test_sgm_bad_pixel_rate_vs_cv2_sgbm():
    rng = np.random.default_rng(3)
    left, right, gt, eval_mask = _gt_pair(rng)

    res = stereo_depth_rectified(jnp.asarray(left), jnp.asarray(right),
                                 jnp.float32(600.0), jnp.float32(0.1),
                                 num_disparities=64)
    ours_disp = np.asarray(res.disparity)
    ours_valid = np.asarray(res.valid)
    ours_bad = _bad_rate(ours_disp, gt, eval_mask, ours_valid)

    sgbm = cv2.StereoSGBM_create(
        minDisparity=0, numDisparities=64, blockSize=5,
        P1=8 * 25, P2=32 * 25, uniquenessRatio=10,
        speckleWindowSize=100, speckleRange=2, disp12MaxDiff=1,
        mode=cv2.STEREO_SGBM_MODE_SGBM)
    l8 = (left * 255).astype(np.uint8)
    r8 = (right * 255).astype(np.uint8)
    cvd = sgbm.compute(l8, r8).astype(np.float32) / 16.0
    cv_valid = cvd > 0
    cv_bad = _bad_rate(cvd, gt, eval_mask, cv_valid)

    # "within a few points" (VERDICT r3 #4) — record both in the message
    assert ours_bad <= cv_bad + 0.05, (
        f"SGM bad-pixel rate {ours_bad:.3f} vs cv2.SGBM {cv_bad:.3f}")
    # sanity: both solve the scene broadly
    assert ours_bad < 0.20 and cv_bad < 0.20, (ours_bad, cv_bad)
