"""Point-cloud at-scale capabilities (VERDICT r4 #4/#5): voxel-hash kNN
normals past the O(N^2) ceiling, reference-parity analytics (density /
clustering / color), and multi-cloud ICP merge orchestration."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu3drec.ops import pointcloud as pc


def test_voxel_knn_matches_bruteforce_uniform():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (2000, 3))
    idx, nm = pc.voxel_knn_indices(pts, 8)
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    bf = np.argsort(d2, axis=1)[:, :8]
    agree = np.mean([len(set(idx[i][nm[i]]) & set(bf[i])) / 8
                     for i in range(2000)])
    assert agree > 0.98, agree
    # invalid input points get self-only neighbourhoods
    mask = np.ones(2000, bool)
    mask[:100] = False
    idx, nm = pc.voxel_knn_indices(pts, 8, mask)
    assert not nm[:100].any()
    assert (idx[:100] == np.arange(100)[:, None]).all()
    # masked points never appear as neighbours of valid ones
    assert not np.isin(idx[100:][nm[100:]], np.arange(100)).any()


def test_analytic_eigvec_matches_eigh():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((300, 3, 3))
    A = (A + A.transpose(0, 2, 1)) / 2
    v = np.asarray(pc._smallest_eigvec_sym3(
        jnp.asarray(A.astype(np.float32))))
    _, V = np.linalg.eigh(A)
    dots = np.abs(np.sum(v * V[:, :, 0], axis=1))
    assert dots.min() > 0.999, dots.min()
    # degenerate isotropic input does not NaN
    iso = np.tile(np.eye(3, dtype=np.float32)[None], (4, 1, 1))
    vv = np.asarray(pc._smallest_eigvec_sym3(jnp.asarray(iso)))
    assert np.isfinite(vv).all()
    np.testing.assert_allclose(np.linalg.norm(vv, axis=1), 1.0, atol=1e-5)


@pytest.mark.slow
def test_normals_at_scale_sphere_oracle():
    """VERDICT r4 #4: estimate_normals must handle >= 100k points; on a
    unit sphere the PCA normal equals the radial direction."""
    rng = np.random.default_rng(2)
    n = 100_000
    u = rng.standard_normal((n, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    normals = np.asarray(pc.estimate_normals_scaled(
        u.astype(np.float32), np.ones(n, bool), viewpoint=jnp.zeros(3)))
    cosang = np.abs(np.sum(normals * u, axis=1))
    assert np.median(cosang) > 0.999, np.median(cosang)
    assert (cosang > 0.99).mean() > 0.99
    # orientation: sphere normals seen from the center point inward
    assert (np.sum(normals * u, axis=1) < 0).mean() > 0.99


def test_normals_scaled_matches_small_path_on_plane():
    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 1, (500, 3)).astype(np.float32)
    pts[:, 2] = 0.25
    vp = jnp.asarray([0.0, 0.0, 5.0])
    n_scaled = np.asarray(pc.estimate_normals_scaled(
        pts, np.ones(500, bool), viewpoint=vp))
    assert np.abs(n_scaled[:, 2]).mean() > 0.99
    assert (n_scaled[:, 2] > 0).mean() > 0.99


def test_cluster_point_cloud_counts():
    rng = np.random.default_rng(4)
    a = rng.normal(0.0, 0.05, (300, 3))
    b = rng.normal(5.0, 0.05, (200, 3))
    stray = np.array([[20.0, 20, 20], [-15, 0, 3], [0, 30, -7]])
    pts = np.concatenate([a, b, stray])
    labels, n_clusters, n_out = pc.cluster_point_cloud(pts, eps=0.5,
                                                       min_samples=5)
    assert n_clusters == 2, n_clusters
    assert n_out == 3, n_out
    assert (labels[:300] == labels[0]).all()
    assert (labels[300:500] == labels[300]).all()
    assert labels[0] != labels[300]
    assert (labels[500:] == -1).all()


def test_point_cloud_quality_reference_fields():
    rng = np.random.default_rng(5)
    pts = rng.uniform(0, 1, (800, 3))
    colors = rng.uniform(0, 1, (800, 3))
    q = pc.point_cloud_quality(pts, colors=colors)
    assert q["num_points"] == 800
    assert set(q["bounds"]) == {"min", "max", "range"}
    assert set(q["density"]) == {"mean_nearest_distance",
                                 "median_nearest_distance",
                                 "std_nearest_distance"}
    assert set(q["clustering"]) == {"num_clusters", "num_outliers",
                                    "outlier_ratio"}
    assert set(q["color"]) == {"mean_rgb", "std_rgb", "brightness_range"}
    assert q["density"]["mean_nearest_distance"] > 0


def test_merge_point_clouds_icp_subvoxel():
    """Two views of one surface with a small rigid misalignment must
    merge to sub-voxel agreement (VERDICT r4 #5 'done' criterion)."""
    import cv2
    rng = np.random.default_rng(6)
    base = rng.uniform(-1, 1, (3000, 3)).astype(np.float32)
    base[:, 2] = 0.3 * np.sin(2 * base[:, 0]) + 0.2 * base[:, 1] ** 2
    R = cv2.Rodrigues(np.array([0.02, -0.03, 0.015]))[0].astype(np.float32)
    t = np.array([0.04, -0.03, 0.05], np.float32)
    # second "view" of the same surface, misaligned by (R, t)
    second = base @ R.T + t
    colors = np.tile([[1.0, 0.0, 0.0]], (3000, 1))
    merged_p, merged_c = pc.merge_point_clouds(
        [(base, colors), (second, colors)], registration="icp")
    assert len(merged_p) == 6000 and len(merged_c) == 6000
    # after registration the second half must coincide with the first
    err = np.linalg.norm(merged_p[3000:] - base, axis=1)
    assert np.median(err) < 0.01, np.median(err)
    # 'none' keeps the misalignment
    un_p, _ = pc.merge_point_clouds(
        [(base, colors), (second, colors)], registration="none")
    err_un = np.linalg.norm(un_p[3000:] - base, axis=1)
    assert np.median(err_un) > 5 * np.median(err)


def test_nearest_neighbor_stats_grid():
    g = np.stack(np.meshgrid(np.arange(10.0), np.arange(10.0),
                             np.arange(4.0), indexing="ij"),
                 axis=-1).reshape(-1, 3)
    s = pc.nearest_neighbor_stats(g, sample=400)
    assert abs(s["median_nearest_distance"] - 1.0) < 1e-6


def test_plot_point_cloud_smoke(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    from tpu3drec.viz import plot_point_cloud
    rng = np.random.default_rng(7)
    pts = rng.uniform(0, 1, (500, 3))
    out = plot_point_cloud(pts, colors=rng.uniform(0, 1, (500, 3)),
                           normals=np.tile([[0, 0, 1.0]], (500, 1)),
                           save_to=tmp_path / "cloud.png")
    assert (tmp_path / "cloud.png").exists()
