"""Implicit-surface reconstruction (ops/implicit.py): Poisson / alpha /
ball-pivot equivalents of mesh_generation.py:29-228, validated on the
sphere oracle (known radius, area, and topology)."""

import numpy as np
import pytest

from tpu3drec.ops.implicit import (alpha_surface_mesh, ball_pivot_mesh,
                                   poisson_mesh)
from tpu3drec.ops.mesh import (create_mesh_alpha_shape,
                               create_mesh_ball_pivoting,
                               create_mesh_poisson, mesh_quality)


@pytest.fixture(scope="module")
def sphere():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(1500, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v.astype(np.float32), v.astype(np.float32)  # points, normals


def test_poisson_sphere(sphere):
    pts, nrm = sphere
    m = poisson_mesh(pts, nrm, resolution=56)
    assert len(m["faces"]) > 1000
    r = np.linalg.norm(m["verts"], axis=1)
    assert abs(r.mean() - 1.0) < 0.02
    assert r.std() < 0.02
    q = mesh_quality(m["verts"], m["faces"])
    # surface area within 5% of 4*pi
    assert abs(q["surface_area"] - 4 * np.pi) / (4 * np.pi) < 0.05
    # crack-free extraction: boundary only where the support mask cuts
    assert q["boundary_edges"] < 0.01 * q["num_faces"]


def test_poisson_estimates_normals(sphere):
    pts, _ = sphere
    m = poisson_mesh(pts, None, resolution=48)
    r = np.linalg.norm(m["verts"], axis=1)
    assert abs(r.mean() - 1.0) < 0.03


def test_alpha_surface_is_ball_union_boundary(sphere):
    pts, _ = sphere
    alpha = 0.15
    m = alpha_surface_mesh(pts, alpha=alpha, resolution=48)
    r = np.linalg.norm(m["verts"], axis=1)
    # boundary of the union of alpha-balls around a unit sphere sampling:
    # radii concentrate at 1 +- alpha
    assert len(m["faces"]) > 1000
    assert r.min() > 1.0 - alpha - 0.06
    assert r.max() < 1.0 + alpha + 0.06
    outer = (r > 1.0).mean()
    assert 0.2 < outer < 0.8  # both shells present


def test_ball_pivot_interpolates_samples(sphere):
    pts, nrm = sphere
    m = ball_pivot_mesh(pts, nrm, radius=0.15, resolution=48)
    r = np.linalg.norm(m["verts"], axis=1)
    assert len(m["faces"]) > 1000
    # Hoppe zero-set hugs the samples (single layer, not the offset)
    assert abs(r.mean() - 1.0) < 0.01
    assert r.std() < 0.01


def test_ball_pivot_leaves_holes_without_support():
    # hemisphere: the uncovered half must stay empty (BPA's property)
    rng = np.random.default_rng(1)
    v = rng.normal(size=(1500, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v = v[v[:, 2] > 0.1]
    m = ball_pivot_mesh(v.astype(np.float32), v.astype(np.float32),
                        radius=0.15, resolution=48)
    assert len(m["faces"]) > 100
    assert m["verts"][:, 2].min() > -0.1  # no surface on the open side


def test_mesh_api_wrappers(sphere):
    pts, nrm = sphere
    for fn, kw in [(create_mesh_poisson, dict(normals=nrm)),
                   (create_mesh_ball_pivoting,
                    dict(normals=nrm, radius=0.15)),
                   (create_mesh_alpha_shape, dict(alpha=0.15))]:
        verts, faces = fn(pts, resolution=40, **kw)
        assert verts.ndim == 2 and verts.shape[1] == 3
        assert faces.ndim == 2 and faces.shape[1] == 3
        assert len(faces) > 100


def test_dense_pipeline_poisson_method():
    """mesh_method='poisson' runs end-to-end in the dense pipeline."""
    from test_dense import make_stereo_pair, FOCAL, BASELINE, H, W
    from tpu3drec.pipelines.dense import run_dense_reconstruction

    left, right, _, _ = make_stereo_pair()
    K = np.array([[FOCAL, 0, W / 2], [0, FOCAL, H / 2], [0, 0, 1]])
    sparse = {
        "camera_poses": {
            "left.png": {"camera_matrix": K.tolist(),
                         "rotation": np.eye(3).tolist(),
                         "translation": [0, 0, 0]},
            "right.png": {"camera_matrix": K.tolist(),
                          "rotation": np.eye(3).tolist(),
                          "translation": [-BASELINE, 0, 0]},
        },
        "points_3d": [[0, 0, 10]],
    }
    res = run_dense_reconstruction(
        sparse, {"left.png": left, "right.png": right},
        num_disparities=16, reference_view="left.png",
        mesh_method="poisson", tsdf_resolution=48)
    assert res["mesh"]["method"] in ("poisson", "depth_grid")
    assert res["mesh"]["num_faces"] > 0


def test_compare_meshes_and_visualize(tmp_path, sphere):
    from tpu3drec.ops.mesh import compare_meshes, mesh_volume
    from tpu3drec import viz

    pts, nrm = sphere
    m = poisson_mesh(pts, nrm, resolution=40)
    cmp = compare_meshes(m["verts"], m["faces"], m["verts"], m["faces"])
    assert cmp["vertex_count"]["ratio"] == 1.0
    assert abs(cmp["surface_area"]["ratio"] - 1.0) < 1e-9
    # a closed sphere mesh has |volume| ~ 4/3 pi; the signed value flips
    # with face orientation (ADVICE r2: inverted meshes must be visible)
    vol = mesh_volume(m["verts"], m["faces"])
    assert abs(abs(vol) - 4.0 / 3.0 * np.pi) / (4.0 / 3.0 * np.pi) < 0.1
    flipped = np.asarray(m["faces"])[:, ::-1]
    assert np.isclose(mesh_volume(m["verts"], flipped), -vol)
    out = viz.visualize_mesh(m["verts"], m["faces"],
                             save_to=tmp_path / "mesh_viz.png")
    assert out is not None and (tmp_path / "mesh_viz.png").exists()
