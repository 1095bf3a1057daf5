"""Full-chain test: image folder -> detection/matching -> incremental SfM
with IN-PROCESS stage handoff (api.reconstruct_folder — the reference
chains stages through pickle files; SURVEY §1, §2.7 'PP' row).

The scene is a rendered 3D gaussian-splat cloud: splats are genuine DoG
blobs, so SIFT detects them, and they carry real parallax, so the
two-view geometry and triangulation are non-degenerate.
"""

import numpy as np
import pytest
from PIL import Image

import tpu3drec


def render_splat_views(tmp_path, n_views=4, n_pts=220, seed=0):
    """Each 3D point carries a UNIQUE random texture patch (pure gaussian
    blobs are too self-similar — the ratio test can't disambiguate
    them); patches scale with 1/depth, far-to-near painter's order."""
    rng = np.random.default_rng(seed)
    W, H = 640, 480
    f = 700.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    X = rng.uniform(-4, 4, (n_pts, 3)) + np.array([0, 0, 12.0])
    base_size = rng.uniform(10.0, 18.0, n_pts)
    patches = rng.uniform(0.15, 1.0, (n_pts, 6, 6)).astype(np.float32)

    names = []
    for i in range(n_views):
        ang = (i - n_views / 2) * 0.09
        R = np.array([[np.cos(ang), 0, np.sin(ang)],
                      [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        c = np.array([6 * np.sin(ang), 0.1 * i, 12 - 6 * np.cos(ang)])
        t = -R @ c
        Xc = (R @ X.T + t[:, None]).T
        z = Xc[:, 2]
        uv = (K @ Xc.T).T
        uv = uv[:, :2] / uv[:, 2:3]
        img = np.zeros((H, W), np.float32)
        order = np.argsort(-z)  # far splats first
        for j in order:
            if z[j] < 1:
                continue
            s = int(round(base_size[j] * 12.0 / z[j]))
            if s < 4:
                continue
            # nearest-neighbour upscale of the 6x6 patch to s x s
            idx = (np.arange(s) * 6 // s)
            patch = patches[j][np.ix_(idx, idx)]
            x0 = int(round(uv[j, 0])) - s // 2
            y0 = int(round(uv[j, 1])) - s // 2
            xa, ya = max(0, x0), max(0, y0)
            xb, yb = min(W, x0 + s), min(H, y0 + s)
            if xa >= xb or ya >= yb:
                continue
            img[ya:yb, xa:xb] = patch[ya - y0:yb - y0, xa - x0:xb - x0]
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        name = f"view_{i:02d}.png"
        Image.fromarray(img).save(tmp_path / name)
        names.append(name)
    return names


@pytest.mark.slow
def test_reconstruct_folder_end_to_end(tmp_path):
    folder = tmp_path / "imgs"
    folder.mkdir()
    names = render_splat_views(folder)
    out = tmp_path / "out"

    result = tpu3drec.reconstruct_folder(
        folder, out, preset="fast", pair_mode="consecutive", pair_window=2)

    recon = result["reconstruction"]
    assert recon.num_cameras >= 3, sorted(recon.cameras)
    assert recon.num_points > 50
    from tpu3drec.sfm.quality import assess_reconstruction_quality
    q = assess_reconstruction_quality(recon)
    assert q["mean_reprojection_error"] < 3.0, q

    # stage artifacts: pickle interchange still written alongside the
    # in-memory handoff
    assert (out / "matching" / "batch_summary.json").exists()
    assert list((out / "matching").glob("results_batch_*.pkl"))
    assert (out / "sfm" / "camera_poses.json").exists()


@pytest.mark.slow
def test_reconstruct_folder_with_dense_stage(tmp_path):
    """Full chain including the dense stage: the handoff from SfM's
    legacy-format export into stereo + TSDF must run end-to-end and
    write artifacts (quality on a splat scene is not asserted — this is
    the plumbing/robustness gate)."""
    folder = tmp_path / "imgs"
    folder.mkdir()
    render_splat_views(folder, n_views=3)
    out = tmp_path / "out"
    result = tpu3drec.reconstruct_folder(
        folder, out, preset="fast", dense=True,
        pair_mode="consecutive", pair_window=2)
    assert result["reconstruction"].num_cameras >= 2
    assert "dense" in result
    dense = result["dense"]
    assert dense["mesh"]["method"] in ("tsdf", "depth_grid")
    assert (out / "dense" / "fused_depth.npy").exists()
    assert (out / "dense" / "point_cloud.ply").exists()
    assert (out / "dense" / "mesh.obj").exists()
