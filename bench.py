"""Benchmarks on the real TPU chip.

Default (driver contract): ONE JSON line — image pairs/s for SIFT
detect + BF ratio match + homography RANSAC at 2K keypoints, 640x480,
batched. Reference baseline: 6.06 pairs/s (SIFT+BF, OpenCV CPU, serial,
BASELINE.md "SIFT pipeline time / FPS"). vs_baseline = ours / 6.06.

BENCH_STAGES=all (or --all) additionally prints one JSON line per
stage (VERDICT r1 #10; BASELINE.md:44-51 requires a BA-solve-time
baseline):
  ba     global bundle adjustment, 50 cams / 100k pts / 500k obs:
         ms per accepted LM iteration (matrix-free Schur-CG path) +
         final mean reprojection error
  sfm    incremental SfM views/s on a synthetic 12-view folder
  dense  stereo+fusion megapixel-depth/s on a 3-view 480x640 scene
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

BASELINE_PAIRS_PER_S = 6.06  # reference SIFT+BF CPU (BASELINE.md)


def synthetic_photo(h, w, seed):
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    for _ in range(60):
        y, x = rng.integers(5, h - 40), rng.integers(5, w - 40)
        hh, ww = rng.integers(8, 80), rng.integers(8, 80)
        img[y:y + hh, x:x + ww] += rng.uniform(-0.4, 0.4)
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(20):
        cy, cx, r = rng.integers(20, h - 20), rng.integers(20, w - 20), rng.integers(5, 30)
        img += rng.uniform(-0.3, 0.3) * (((yy - cy) ** 2 + (xx - cx) ** 2) < r * r)
    img += 0.02 * rng.standard_normal((h, w)).astype(np.float32)
    img -= img.min()
    img /= img.max()
    return img.astype(np.float32)


def bench_ba():
    """Global-BA solve time at reference scale (50/100k/500k)."""
    import jax.numpy as jnp
    from tpu3drec.ops.ba import (
        BAProblem, BAConfig, bundle_adjust, make_cam_params,
    )
    import os
    rng = np.random.default_rng(0)
    C = int(os.environ.get("BENCH_BA_CAMS", 50))
    P = int(os.environ.get("BENCH_BA_PTS", 100_000))
    OBS_PER_PT = 5
    M = P * OBS_PER_PT
    X = rng.uniform(-10, 10, (P, 3)) + np.array([0, 0, 30.0])
    K = np.array([[700, 0, 320], [0, 700, 240], [0, 0, 1]], np.float64)
    import cv2 as _cv2
    cams = []
    for c in range(C):
        ang = (c / max(C - 1, 1) - 0.5) * 0.8   # arc, all facing the cloud
        rvec = np.array([0.0, ang, 0.0])
        R = _cv2.Rodrigues(rvec)[0]
        center = np.array([20 * np.sin(ang), 0.1 * c,
                           30 - 20 * np.cos(ang)])
        cams.append((rvec, -R @ center))
    obs_pt = np.repeat(np.arange(P, dtype=np.int32), OBS_PER_PT)
    obs_cam = rng.integers(0, C, M).astype(np.int32)

    import cv2
    uv_all = np.zeros((M, 2), np.float32)
    for c in range(C):
        sel = obs_cam == c
        pts = X[obs_pt[sel]]
        uv, _ = cv2.projectPoints(pts, cams[c][0], cams[c][1], K, None)
        uv_all[sel] = uv[:, 0]
    uv_all += 0.5 * rng.standard_normal((M, 2)).astype(np.float32)

    cp = np.stack([np.asarray(make_cam_params(
        r + 0.01 * rng.standard_normal(3),
        t + 0.02 * rng.standard_normal(3), K)) for r, t in cams])
    pm = np.ones((C, 10), np.float32)
    pm[0] = 0.0
    pm[1, 3] = 0.0
    pm[:, 6:] = 0.0
    prob = BAProblem(
        cam_params=jnp.asarray(cp),
        points=jnp.asarray(X.astype(np.float32)
                           + 0.05 * rng.standard_normal(X.shape)
                           .astype(np.float32)),
        obs_cam=jnp.asarray(obs_cam), obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(uv_all),
        obs_mask=jnp.ones(M, bool),
        param_mask=jnp.asarray(pm), point_mask=jnp.ones(P, bool),
    )
    cfg = BAConfig(max_iters=10, schur_solver="cg")
    res = bundle_adjust(prob, cfg)          # compile + run
    _ = np.asarray(res.points)
    t0 = time.perf_counter()
    res = bundle_adjust(prob, cfg)
    iters = int(np.asarray(res.iterations))
    _ = np.asarray(res.points)
    dt = time.perf_counter() - t0
    ms_per_iter = dt / max(iters, 1) * 1000
    print(json.dumps({
        "metric": f"global BA ms/LM-iter ({C} cams, {P//1000}k pts, {M//1000}k obs, Schur-CG)",
        "value": round(ms_per_iter, 2),
        "unit": "ms/iter",
        "mean_reproj_px": round(float(np.asarray(res.mean_reproj_px)), 3),
        "iterations": iters,
    }))


def bench_sfm():
    """Incremental SfM throughput on a synthetic 12-view folder."""
    import cv2
    from tpu3drec.sfm import SfMPipeline
    from tpu3drec.sfm.pipeline import SfMConfig
    rng = np.random.default_rng(0)
    W, H, n_views, n_pts = 640, 480, 12, 600
    K = np.array([[700, 0, W / 2], [0, 700, H / 2], [0, 0, 1]], np.float64)
    X = rng.uniform(-4, 4, size=(n_pts, 3)) + np.array([0, 0, 12.0])
    views = []
    for i in range(n_views):
        ang = (i - n_views / 2) * 0.08
        R = cv2.Rodrigues(np.array([0.0, ang, 0.0]))[0]
        c = np.array([6 * np.sin(ang), 0.15 * i, 12 - 6 * np.cos(ang)])
        views.append((R, -R @ c))
    names = [f"img_{i:02d}.png" for i in range(n_views)]
    matches_data = {}
    for i in range(n_views - 1):
        for j in (i + 1, i + 2):
            if j >= n_views:
                continue
            uvs = []
            for R, t in (views[i], views[j]):
                Xc = (R @ X.T + t[:, None]).T
                uv = (K @ Xc.T).T
                uvs.append(uv[:, :2] / uv[:, 2:3])
            vis = np.ones(n_pts, bool)
            for uv in uvs:
                vis &= (uv[:, 0] > 0) & (uv[:, 0] < W) \
                    & (uv[:, 1] > 0) & (uv[:, 1] < H)
            corr = np.concatenate(
                [uvs[0][vis] + 0.4 * rng.standard_normal((vis.sum(), 2)),
                 uvs[1][vis] + 0.4 * rng.standard_normal((vis.sum(), 2))],
                axis=1)
            matches_data[(names[i], names[j])] = {
                "correspondences": corr.tolist(),
                "num_matches": int(vis.sum()), "quality_score": 0.8}
    info = {n: {"name": n, "width": W, "height": H} for n in names}
    t0 = time.perf_counter()
    recon = SfMPipeline(SfMConfig()).reconstruct(dict(matches_data), info)
    dt_cold = time.perf_counter() - t0
    # steady state: same-process second run hits every traced executable
    t0 = time.perf_counter()
    recon = SfMPipeline(SfMConfig()).reconstruct(dict(matches_data), info)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "incremental SfM views/s (12 views, 600 pts, synthetic,"
                  " steady-state)",
        "value": round(recon.num_cameras / dt, 3),
        "unit": "views/s",
        "cold_start_views_per_s": round(recon.num_cameras / dt_cold, 3),
        "cameras": recon.num_cameras, "points": recon.num_points,
    }))


def bench_dense():
    """Stereo + fusion throughput on a 3-view synthetic scene."""
    from tpu3drec.pipelines.dense import DenseReconstructionPipeline
    rng = np.random.default_rng(0)
    W, H = 640, 480
    K = np.array([[600, 0, W / 2], [0, 600, H / 2], [0, 0, 1]], np.float64)
    base = synthetic_photo(H, W, 7)
    images, cams = {}, {}
    for i, bx in enumerate((-0.12, 0.0, 0.12)):
        name = f"v{i}.png"
        shift = int(round(bx * 100))
        images[name] = np.roll(base, shift, axis=1)
        cams[name] = {"camera_matrix": K.tolist(),
                      "rotation": np.eye(3).tolist(),
                      "translation": [bx, 0.0, 0.0]}
    sparse = {"camera_poses": cams,
              "points_3d": (rng.uniform(-2, 2, (100, 3))
                            + np.array([0, 0, 6.0])).tolist()}
    pipe = DenseReconstructionPipeline(tsdf_resolution=64)
    res = pipe.run_complete_pipeline(sparse, images,
                                     reference_view="v1.png")  # compile
    t0 = time.perf_counter()
    res = pipe.run_complete_pipeline(sparse, images,
                                     reference_view="v1.png")
    dt_stereo = res["timings_s"]["stereo"]
    mp = (W * H * 2) / 1e6  # two stereo pairs vs reference
    print(json.dumps({
        "metric": "dense stereo+fusion MP-depth/s (2 pairs, 640x480)",
        "value": round(mp / dt_stereo, 3),
        "unit": "MP/s",
        "total_s": round(time.perf_counter() - t0, 2),
        "mesh_method": res["mesh"]["method"],
    }))


def bench_deep():
    """SuperPoint + LightGlue end-to-end pairs/s on TPU.

    Runs at random init — attention/conv throughput is weight-independent
    — so this measures the deep path's serving speed. Reference baseline:
    9.3-14.5 s/pair on CPU torch (BASELINE.md "LightGlue end-to-end")."""
    import os
    import jax
    import jax.numpy as jnp
    from tpu3drec.models.superpoint import SuperPoint
    from tpu3drec.models.lightglue import LightGlue

    B = int(os.environ.get("BENCH_DEEP_BATCH", "32"))
    REPS = int(os.environ.get("BENCH_REPS", "5"))
    N, H, W = 1024, 480, 640
    sp = SuperPoint(max_features=N)
    sp.init_random((H, W))
    lg = LightGlue(input_dim=256)
    lg.init_random()

    def pair_fn(img1, img2):
        f1 = sp.extract(img1)
        f2 = sp.extract(img2)
        m = lg.match(f1, f2)
        return jnp.sum(m.mask.astype(jnp.int32))

    batched = jax.jit(jax.vmap(pair_fn))
    imgs1 = jnp.asarray(np.stack([synthetic_photo(H, W, i)
                                  for i in range(B)]))
    imgs2 = jnp.asarray(np.stack([synthetic_photo(H, W, 100 + i)
                                  for i in range(B)]))
    _ = np.asarray(batched(imgs1, imgs2))        # compile
    t0 = time.perf_counter()
    for _ in range(REPS):
        _ = np.asarray(batched(imgs1, imgs2))
    dt = (time.perf_counter() - t0) / REPS
    print(json.dumps({
        "metric": f"deep pairs/s SuperPoint+LightGlue (1K kpts, 640x480,"
                  f" batch {B})",
        "value": round(B / dt, 3),
        "unit": "pairs/s",
        "vs_reference_cpu_s_per_pair": 9.3,
    }))


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _make_pair_fn

    import os
    H, W = 480, 640
    MAX_FEATURES = 2048
    BATCH = int(os.environ.get("BENCH_BATCH", "64"))
    REPS = int(os.environ.get("BENCH_REPS", "5"))

    pair_fn = _make_pair_fn(max_features=MAX_FEATURES, num_hypotheses=256)
    batched = jax.jit(jax.vmap(pair_fn))

    imgs1 = jnp.asarray(np.stack([synthetic_photo(H, W, i) for i in range(BATCH)]))
    imgs2 = jnp.asarray(np.stack([synthetic_photo(H, W, 100 + i) for i in range(BATCH)]))

    # warmup / compile. NB: block_until_ready does NOT block on the axon
    # backend (CLAUDE.md) — force a host materialization of an output that
    # depends on the whole computation instead.
    def materialize(o):
        return np.asarray(o["num_inliers"]).sum() + np.asarray(o["num_matches"]).sum()

    materialize(batched(imgs1, imgs2))

    t0 = time.perf_counter()
    for _ in range(REPS):
        materialize(batched(imgs1, imgs2))
    dt = (time.perf_counter() - t0) / REPS
    pairs_per_s = BATCH / dt

    print(json.dumps({
        "metric": f"pairs/s SIFT detect+match+RANSAC (2K kpts, 640x480, batch {BATCH})",
        "value": round(pairs_per_s, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 3),
    }))


if __name__ == "__main__":
    import os
    stages = os.environ.get("BENCH_STAGES", "")
    if "--all" in sys.argv or stages == "all":
        stages = "matching,ba,sfm,dense,deep"
    stages = stages or "matching"
    for stage in stages.split(","):
        {"matching": main, "ba": bench_ba, "sfm": bench_sfm,
         "dense": bench_dense, "deep": bench_deep}[stage.strip()]()
