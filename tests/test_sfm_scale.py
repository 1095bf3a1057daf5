"""Reference-scale SfM proof (VERDICT r2 #1).

Two layers:
- struct-of-arrays bookkeeping at FULL reference scale (50 cams /
  100k obs): batched projections and bincount segment sums must match a
  brute-force per-observation oracle on a sample, and complete in
  vectorized time (the old tuple-list walk took minutes here).
- the SfM pipeline end-to-end on a wide synthetic folder built by the
  same generator the TPU bench uses (bench.py:bench_sfm), checking
  registration, point count, and reprojection accuracy.

Reference to match: CPE/pipeline.py:912-966 driving <=50-image folders.
"""

import time

import numpy as np
import pytest

from tpu3drec.sfm.reconstruction import Camera, Reconstruction
from tpu3drec.bench.synthetic import make_sfm_scene


def _big_recon(C=50, P=20000, obs_per_pt=5, seed=0):
    rng = np.random.default_rng(seed)
    recon = Reconstruction()
    K = np.array([[700.0, 0, 320], [0, 700.0, 240], [0, 0, 1.0]])
    import cv2
    Rts = []
    for c in range(C):
        ang = (c / (C - 1) - 0.5) * 0.8
        R = cv2.Rodrigues(np.array([0.0, ang, 0.0]))[0]
        center = np.array([10 * np.sin(ang), 0.05 * c, 12 - 10 * np.cos(ang)])
        t = -R @ center
        recon.add_camera(Camera(f"c{c:02d}.png", R, t, K, (640, 480)))
        Rts.append((R, t))
    X = rng.uniform((-4, -3, 9.0), (4, 3, 15.0), (P, 3))
    recon.add_points_batch(X)
    # obs_per_pt distinct cameras per point, grouped per camera for the
    # batched append API
    cam_of = np.argsort(rng.random((P, C)), axis=1)[:, :obs_per_pt]
    names = recon.camera_names()
    for c in range(C):
        sel = np.nonzero((cam_of == c).any(axis=1))[0]
        R, t = Rts[c]
        Xc = (R @ X[sel].T + t[:, None]).T
        uv = (K @ (Xc / Xc[:, 2:3]).T).T[:, :2]
        uv += 0.3 * rng.standard_normal(uv.shape)
        recon.add_observations_batch(names[c], sel, uv)
    return recon, X


def test_soa_bookkeeping_at_reference_scale():
    recon, X = _big_recon()
    assert recon.num_cameras == 50
    assert recon.num_points == 20000
    assert recon.num_observations == 100000

    from tpu3drec.sfm.quality import (
        reprojection_errors, assess_reconstruction_quality,
    )
    t0 = time.perf_counter()
    errs = reprojection_errors(recon)
    q = assess_reconstruction_quality(recon)
    tl = recon.track_lengths()
    dt = time.perf_counter() - t0
    assert errs.shape == (100000,)
    # noise was 0.3 px per axis -> sub-px mean error, no behind sentinels
    assert errs.mean() < 1.0 and errs.max() < 1e3
    assert abs(tl.mean() - 5.0) < 1e-9
    assert q["mean_reprojection_error"] < 1.0
    # vectorized bound (the per-tuple walk was O(minutes) at this size;
    # generous cap so CI jitter can't flake it)
    assert dt < 20.0, f"quality metrics took {dt:.1f}s at 100k obs"

    # oracle: brute-force reprojection on a random sample of observations
    ocam, opid, ouv = recon.obs_arrays()
    names = recon.camera_names()
    rng = np.random.default_rng(1)
    for i in rng.integers(0, len(opid), 50):
        cam = recon.cameras[names[ocam[i]]]
        Xc = cam.R @ np.asarray(recon.points)[opid[i]] + cam.t
        proj = cam.K @ (Xc / Xc[2])
        e = np.hypot(proj[0] - ouv[i, 0], proj[1] - ouv[i, 1])
        np.testing.assert_allclose(errs[i], e, rtol=1e-9)


def test_validate_points_vectorized_matches_oracle():
    from tpu3drec.sfm.pipeline import SfMPipeline, SfMConfig
    recon, X = _big_recon(C=10, P=2000, obs_per_pt=3, seed=2)
    # corrupt some points so validation has something to drop
    bad_ids = np.arange(0, 2000, 97)
    moved = np.asarray(recon.points).copy()
    moved[bad_ids] += 3.0
    names = sorted(recon.cameras)
    cam_params = np.stack([np.concatenate([
        _rvec(recon.cameras[n].R), recon.cameras[n].t,
        [recon.cameras[n].K[0, 0], recon.cameras[n].K[1, 1],
         recon.cameras[n].K[0, 2], recon.cameras[n].K[1, 2]]])
        for n in names])
    recon.update_from_ba(cam_params, moved, names)
    pipe = SfMPipeline(SfMConfig(post_ba_max_reproj_px=4.0))
    t0 = time.perf_counter()
    n_dropped = pipe._validate_points(recon)
    dt = time.perf_counter() - t0
    assert n_dropped >= len(bad_ids) * 0.9   # the moved points die
    assert recon.num_points <= 2000 - n_dropped + 1
    assert dt < 10.0
    # surviving points still reproject well
    from tpu3drec.sfm.quality import reprojection_errors
    assert reprojection_errors(recon).mean() < 4.0


def _rvec(R):
    import cv2
    return cv2.Rodrigues(R)[0][:, 0]


def test_remove_points_remaps_densely():
    recon, _ = _big_recon(C=5, P=200, obs_per_pt=2, seed=3)
    before = recon.num_observations
    ocam0, opid0, ouv0 = (a.copy() for a in recon.obs_arrays())
    drop = [0, 5, 199]
    kept_mask = np.ones(200, bool)
    kept_mask[drop] = False
    remap = np.cumsum(kept_mask) - 1
    recon.remove_points(drop)
    assert recon.num_points == 197
    ocam, opid, ouv = recon.obs_arrays()
    keep_obs = kept_mask[opid0]
    assert len(opid) == keep_obs.sum() and before >= len(opid)
    np.testing.assert_array_equal(opid, remap[opid0[keep_obs]])
    np.testing.assert_array_equal(ocam, ocam0[keep_obs])
    np.testing.assert_allclose(ouv, ouv0[keep_obs])
    # per-camera row caches were rebuilt consistently
    names = recon.camera_names()
    for ci, n in enumerate(names):
        pids, uvs = recon.camera_obs_arrays(n)
        np.testing.assert_array_equal(pids, opid[ocam == ci])


def test_pipeline_reference_scale_folder():
    """End-to-end on a wide synthetic folder (CPU-sized instance of the
    TPU bench's 50-view scene): every view registers, the cloud reaches
    thousands of points, reprojection stays tight."""
    from tpu3drec.sfm import SfMPipeline
    from tpu3drec.sfm.pipeline import SfMConfig

    matches_data, info, gt = make_sfm_scene(
        n_views=16, n_pts=1200, pair_window=2, visibility=0.8, seed=4)
    t0 = time.perf_counter()
    pipe = SfMPipeline(SfMConfig())
    recon = pipe.reconstruct(dict(matches_data), info)
    dt = time.perf_counter() - t0

    assert recon.num_cameras == 16, \
        f"only {recon.num_cameras}/16 views registered"
    assert recon.num_points > 1000
    assert recon.num_observations > 3000
    from tpu3drec.sfm.quality import assess_reconstruction_quality
    q = assess_reconstruction_quality(recon)
    assert q["mean_reprojection_error"] < 2.0
    # bookkeeping must not dominate: the history records per-view times
    add_times = [h["time_s"] for h in pipe.history
                 if h["phase"] == "add_view"]
    assert add_times and max(add_times) < 60.0, (dt, add_times)
