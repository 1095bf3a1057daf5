"""End-to-end incremental SfM tests on a synthetic multi-view scene with
known ground truth (reference: CPE/pipeline.py phases 1-4)."""

import json
import pickle
from pathlib import Path

import cv2
import numpy as np
import pytest

from tpu3drec.sfm import SfMPipeline, reconstruct_scene
from tpu3drec.sfm.pipeline import SfMConfig
from tpu3drec.sfm.quality import assess_reconstruction_quality, print_quality_report
from tpu3drec.sfm.pair_selector import InitializationPairSelector
from tpu3drec.sfm.intrinsics import ProgressiveIntrinsicsEstimator, heuristic_K


def make_scene(n_views=5, n_pts=250, noise=0.4, seed=0):
    """Cameras on an arc looking at a point cloud; consecutive-pair matches."""
    rng = np.random.default_rng(seed)
    W, H = 640, 480
    K = np.array([[700, 0, W / 2], [0, 700, H / 2], [0, 0, 1]], np.float64)
    X = rng.uniform(-4, 4, size=(n_pts, 3)) + np.array([0, 0, 12.0])
    views = []
    for i in range(n_views):
        ang = (i - n_views / 2) * 0.12
        R = cv2.Rodrigues(np.array([0.0, ang, 0.0]))[0]
        c = np.array([6 * np.sin(ang), 0.2 * i, 12 - 6 * np.cos(ang) + 0.0])
        t = -R @ c
        views.append((R, t))

    def project(R, t):
        Xc = (R @ X.T + t[:, None]).T
        uv = (K @ Xc.T).T
        uv = uv[:, :2] / uv[:, 2:3]
        vis = (Xc[:, 2] > 0.5) & (uv[:, 0] > 0) & (uv[:, 0] < W) \
            & (uv[:, 1] > 0) & (uv[:, 1] < H)
        return uv, vis

    names = [f"img_{i:02d}.png" for i in range(n_views)]
    matches_data = {}
    for i in range(n_views - 1):
        for j in (i + 1, i + 2):
            if j >= n_views:
                continue
            uv_i, vis_i = project(*views[i])
            uv_j, vis_j = project(*views[j])
            vis = vis_i & vis_j
            corr = np.concatenate([
                uv_i[vis] + noise * rng.standard_normal((vis.sum(), 2)),
                uv_j[vis] + noise * rng.standard_normal((vis.sum(), 2)),
            ], axis=1)
            matches_data[(names[i], names[j])] = {
                "correspondences": corr.tolist(),
                "num_matches": int(vis.sum()),
                "quality_score": 0.8,
            }
    image_info = {n: {"name": n, "width": W, "height": H} for n in names}
    return matches_data, image_info, views, X, K, names


@pytest.fixture(scope="module")
def sfm_result(tmp_path_factory):
    matches_data, image_info, views, X, K, names = make_scene()
    out = tmp_path_factory.mktemp("sfm")
    pipe = SfMPipeline(SfMConfig())
    recon = pipe.reconstruct(matches_data, image_info, output_dir=out)
    return recon, pipe, out, views, X, K, names


def test_all_views_registered(sfm_result):
    recon, pipe, out, views, X, K, names = sfm_result
    assert recon.num_cameras == len(names), \
        f"registered {sorted(recon.cameras)} of {names}"
    # point count is a step function of RANSAC draw internals (measured
    # spread over 64 PRNG keys: essential inliers 59-83 on the init pair,
    # final points ~85-110); 75 gates real regressions without pinning
    # the sampler's random stream
    assert recon.num_points > 75
    assert recon.num_observations > 2 * recon.num_points * 0.8


def test_reprojection_error_low(sfm_result):
    recon, pipe, out, views, X, K, names = sfm_result
    q = assess_reconstruction_quality(recon)
    assert q["mean_reprojection_error"] < 1.5, q
    assert q["quality_level"] in ("good", "excellent", "fair")
    print_quality_report(q)


def test_relative_rotations_match_gt(sfm_result):
    recon, pipe, out, views, X, K, names = sfm_result
    # compare relative rotation between first two registered GT cameras
    errs = []
    for a in range(len(names) - 1):
        b = a + 1
        if names[a] not in recon.cameras or names[b] not in recon.cameras:
            continue
        R_est = recon.cameras[names[b]].R @ recon.cameras[names[a]].R.T
        R_gt = views[b][0] @ views[a][0].T
        d = R_est @ R_gt.T
        errs.append(np.degrees(np.arccos(np.clip((np.trace(d) - 1) / 2, -1, 1))))
    assert errs and max(errs) < 2.0, errs


def test_exports_written(sfm_result):
    recon, pipe, out, views, X, K, names = sfm_result
    assert (out / "optimized_camera_poses.pkl").exists()
    assert (out / "camera_poses.json").exists()
    assert (out / "reconstruction_report.json").exists()
    for f in ("cameras.txt", "images.txt", "points3D.txt"):
        assert (out / "colmap" / f).exists()
    legacy = pickle.load(open(out / "optimized_camera_poses.pkl", "rb"))
    assert set(legacy["camera_poses"]) == set(recon.cameras)
    cp = legacy["camera_poses"][names[0]]
    assert "camera_matrix" in cp and "rotation" in cp and "translation" in cp
    report = json.loads((out / "reconstruction_report.json").read_text())
    assert report["statistics"]["num_cameras"] == recon.num_cameras


def test_reconstruct_scene_from_pickles(tmp_path):
    """Full stage chain: batch pickles -> reconstruct_scene."""
    from tpu3drec.io.batch_pickle import save_batch, save_image_metadata
    from tpu3drec.io.images import ImageMetadata
    matches_data, image_info, views, X, K, names = make_scene(n_views=3)
    save_batch(tmp_path, "results", 0, matches_data,
               config={"feature_type": "SIFT"})
    save_image_metadata(tmp_path, "results", [
        ImageMetadata(name=n, path=n, width=640, height=480) for n in names])
    recon = reconstruct_scene(str(tmp_path / "results_batch_000.pkl"))
    assert recon.num_cameras == 3
    q = assess_reconstruction_quality(recon)
    assert q["mean_reprojection_error"] < 1.5


def test_intrinsics_estimator_learning():
    est = ProgressiveIntrinsicsEstimator()
    K0 = est.estimate(640, 480)
    assert K0[0, 2] == 320 and K0[1, 2] == 240
    # learn a few cameras at focal ratio 1.5 and watch estimates move
    K_learn = np.array([[960, 0, 320], [0, 960, 240], [0, 0, 1]], np.float64)
    for _ in range(5):
        est.learn(K_learn, 640, 480)
    K1 = est.estimate(640, 480)
    assert abs(K1[0, 0] - 960) < abs(K0[0, 0] - 960)
    assert est.num_learned == 5


def test_pair_selector_prefers_wide_baseline():
    matches_data, image_info, views, X, K, names = make_scene(n_views=4)
    sel = InitializationPairSelector()
    best = sel.get_best_pair(matches_data, image_info)
    assert best is not None
    pair, score = best
    assert score["total"] > 0.3
    assert score["inlier_ratio"] > 0.8


def make_weak_scene(seed=3, noise=0.3):
    """Weakly-connected folder: a chain of views where consecutive pairs
    share almost no 3D points with the previous pair (overlap 10 < the
    PnP minimum of 15). Without progressive triangulation + track
    extension the chain breaks after the init pair; with them every view
    registers (VERDICT r1, 'Next round' item 4)."""
    rng = np.random.default_rng(seed)
    W, H = 640, 480
    K = np.array([[700, 0, W / 2], [0, 700, H / 2], [0, 0, 1]], np.float64)
    n_pts = 600
    X = rng.uniform(-5, 5, size=(n_pts, 3)) + np.array([0, 0, 14.0])
    n_views = 5
    views = []
    for i in range(n_views):
        ang = (i - n_views / 2) * 0.10
        R = cv2.Rodrigues(np.array([0.0, ang, 0.0]))[0]
        c = np.array([7 * np.sin(ang), 0.15 * i, 14 - 7 * np.cos(ang)])
        t = -R @ c
        views.append((R, t))

    def project(R, t, ids):
        Xc = (R @ X[ids].T + t[:, None]).T
        uv = (K @ Xc.T).T
        return uv[:, :2] / uv[:, 2:3]

    names = [f"img_{i:02d}.png" for i in range(n_views)]
    # consecutive chain with 10-point overlap between segments
    segments = [np.arange(0, 150), np.arange(140, 290),
                np.arange(280, 430), np.arange(420, 570)]
    matches_data = {}
    for i in range(n_views - 1):
        ids = segments[i]
        uv_i = project(*views[i], ids) + noise * rng.standard_normal((len(ids), 2))
        uv_j = project(*views[i + 1], ids) + noise * rng.standard_normal((len(ids), 2))
        corr = np.concatenate([uv_i, uv_j], axis=1)
        matches_data[(names[i], names[i + 1])] = {
            "correspondences": corr.tolist(),
            "num_matches": len(ids),
            "quality_score": 0.8,
        }
    image_info = {n: {"name": n, "width": W, "height": H} for n in names}
    return matches_data, image_info, names


def test_progressive_rescues_weakly_connected_folder():
    matches_data, image_info, names = make_weak_scene()

    base_cfg = SfMConfig(enable_progressive=False,
                         enable_track_extension=False)
    base = SfMPipeline(base_cfg).reconstruct(
        dict(matches_data), dict(image_info))

    prog = SfMPipeline(SfMConfig()).reconstruct(
        dict(matches_data), dict(image_info))

    # without the recall machinery the chain breaks (segment overlap 10
    # < min_pnp_correspondences 15)
    assert base.num_cameras < len(names)
    assert prog.num_cameras == len(names), sorted(prog.cameras)
    assert prog.num_points >= 1.5 * max(base.num_points, 1), \
        (prog.num_points, base.num_points)
    q = assess_reconstruction_quality(prog)
    assert q["mean_reprojection_error"] < 2.0, q
