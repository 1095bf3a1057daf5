"""Tests: iterative two-view refinement, checkerboard calibration,
visualization smoke tests."""

import numpy as np
import cv2
import pytest

from tpu3drec.sfm.refinement import (
    RefinementConfig, iterative_refinement, _clamp_K,
)
from tpu3drec.sfm.calibration import (
    CameraCalibration, checkerboard_object_points,
)


def test_clamp_K_bounds():
    cfg = RefinementConfig()
    K = np.array([[9000.0, 0, 900], [0, 50.0, 10], [0, 0, 1]])
    out = _clamp_K(K, (640, 480), cfg)
    assert out[0, 0] == cfg.focal_max and out[1, 1] == cfg.focal_min
    assert out[0, 2] <= 320 * 1.3 and out[1, 2] >= 240 * 0.7


def test_iterative_refinement_produces_valid_geometry():
    """Two-view focal is only weakly observable (the 3D points absorb
    intrinsics error — verified empirically: BA reaches 0.15px reprojection
    at focals 512 and 1100 alike for f_gt=800). The contract here is the
    reference's (iterative_refinement_for_camera.py): bounded refinement
    yields a consistent two-view geometry — low reprojection, correct
    relative rotation, K within bounds — not metric focal recovery."""
    rng = np.random.default_rng(0)
    W, H = 640, 480
    f_gt = 800.0
    K_gt = np.array([[f_gt, 0, W / 2], [0, f_gt, H / 2], [0, 0, 1]])
    R = cv2.Rodrigues(np.array([0.04, 0.3, 0.0]))[0]
    t = np.array([-1.0, 0.1, 0.15])
    X = rng.uniform(-3, 3, (300, 3)) + [0, 0, 9.0]
    def proj(Rm, tm):
        x = (K_gt @ (Rm @ X.T + tm[:, None])).T
        return (x[:, :2] / x[:, 2:3]).astype(np.float32)
    p1 = proj(np.eye(3), np.zeros(3)) + 0.3 * rng.standard_normal((300, 2)).astype(np.float32)
    p2 = proj(R, t) + 0.3 * rng.standard_normal((300, 2)).astype(np.float32)
    inb = ((p1 > 0) & (p1 < [W, H])).all(1) & ((p2 > 0) & (p2 < [W, H])).all(1)
    p1, p2 = p1[inb], p2[inb]

    K0 = np.array([[1.2 * W, 0, W / 2], [0, 1.2 * W, H / 2], [0, 0, 1]])
    cfg = RefinementConfig(max_iters=4)
    res = iterative_refinement(p1, p2, K0, K0, (W, H), (W, H), cfg)
    assert res is not None
    assert res.history and res.quality > 0
    # converged geometry: sub-pixel reprojection over surviving points
    assert res.history[-1]["mean_reproj_px"] < 1.0
    assert res.point_mask.sum() > 100
    # K stays inside the configured box
    for K in (res.K1, res.K2):
        assert cfg.focal_min <= K[0, 0] <= cfg.focal_max
        assert abs(K[0, 2] - W / 2) <= W / 2 * cfg.pp_range + 1e-6
    # relative rotation close to GT
    ang = np.degrees(np.arccos(np.clip(
        (np.trace(res.R @ R.T) - 1) / 2, -1, 1)))
    assert ang < 3.0


def test_checkerboard_calibration():
    rng = np.random.default_rng(1)
    cols, rows = 7, 5
    calib = CameraCalibration(cols, rows, square_size=0.03)
    K_gt = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    obj3 = np.concatenate([calib.obj, np.zeros((cols * rows, 1))], 1)
    corner_sets = []
    for v in range(5):
        R = cv2.Rodrigues(np.array([0.3 + 0.1 * v, -0.2 + 0.15 * v, 0.05 * v]))[0]
        t = np.array([-0.1 + 0.02 * v, -0.07, 0.5 + 0.1 * v])
        Xc = obj3 @ R.T + t
        uv = (Xc / Xc[:, 2:3]) @ K_gt.T
        corner_sets.append(uv[:, :2] + 0.2 * rng.standard_normal((cols * rows, 2)))
    out = calib.calibrate(corner_sets, (640, 480))
    assert abs(out["K"][0, 0] - 600) / 600 < 0.05, out["K"]
    assert abs(out["K"][0, 2] - 320) < 25
    assert out["mean_reproj_px"] < 1.0
    assert out["num_views"] == 5


def test_object_points_layout():
    pts = checkerboard_object_points(4, 3, 2.0)
    assert pts.shape == (12, 2)
    assert pts[1, 0] == 2.0 and pts[4, 1] == 2.0


def test_visualization_smoke(tmp_path):
    from tpu3drec.api import match_images, detect_features
    from tpu3drec import viz
    rng = np.random.default_rng(2)
    img = np.zeros((120, 160), np.float32)
    for _ in range(25):
        y, x = rng.integers(5, 100), rng.integers(5, 140)
        img[y:y + 12, x:x + 12] += rng.uniform(-0.5, 0.5)
    img -= img.min(); img /= img.max()
    M = cv2.getRotationMatrix2D((80, 60), 6.0, 0.97)
    warped = cv2.warpAffine(img, M, (160, 120))

    r = match_images(img, warped, method="SIFT", max_features=256)
    ax = viz.visualize_matches(img, warped, r)
    p = viz.save_visualization(ax, tmp_path / "matches.png")
    assert p.exists() and p.stat().st_size > 1000

    f = detect_features(img, "SIFT", max_features=128)
    ax2 = viz.visualize_keypoints_only(img, f)
    viz.save_visualization(ax2, tmp_path / "kpts.png")
    assert (tmp_path / "kpts.png").exists()

    from tpu3drec.pipelines.matching import FeatureProcessingPipeline
    pipe = FeatureProcessingPipeline({"methods": ["SIFT"],
                                      "max_features": 128,
                                      "matcher_config": {"SIFT": "bf"}})
    mr = pipe.match(img, warped)
    fig = viz.plot_method_comparison(img, warped, mr)
    viz.save_visualization(fig, tmp_path / "cmp.png")
    assert (tmp_path / "cmp.png").exists()
