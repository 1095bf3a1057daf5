"""TSDF fusion + marching tetrahedra (ops/tsdf.py) — the Poisson/BPA
replacement (reference mesh_generation.py:29-143). GT oracle: ray-cast
depth maps of an analytic sphere; the extracted surface must lie on it."""

import math

import numpy as np
import pytest

from tpu3drec.ops.tsdf import tsdf_fuse, tsdf_mesh, marching_tetrahedra

K = np.array([[300, 0, 160], [0, 300, 120], [0, 0, 1]], np.float32)
H, W = 240, 320
CENTER = np.array([0.0, 0.0, 4.0])


def render_sphere(R, t, c=CENTER, r=1.0):
    uu, vv = np.meshgrid(np.arange(W), np.arange(H))
    d = np.stack([(uu - 160) / 300, (vv - 120) / 300,
                  np.ones_like(uu, np.float32)], -1)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    cc = R @ c + t
    b = d @ cc
    disc = b * b - (cc @ cc - r * r)
    hit = disc > 0
    z = np.where(hit, (b - np.sqrt(np.maximum(disc, 0))) * d[..., 2], 0)
    return z.astype(np.float32), hit


def sphere_views(angles=(-0.3, 0.0, 0.3)):
    views = []
    for ang in angles:
        R = np.array([[math.cos(ang), 0, math.sin(ang)],
                      [0, 1, 0],
                      [-math.sin(ang), 0, math.cos(ang)]], np.float32)
        c_cam = np.array([4 * math.sin(ang), 0, 4 - 4 * math.cos(ang)])
        t = (-R @ c_cam).astype(np.float32)
        z, hit = render_sphere(R, t)
        views.append((z, hit, K, R, t))
    d = np.stack([v[0] for v in views])
    va = np.stack([v[1] for v in views])
    Ks = np.stack([v[2] for v in views])
    Rs = np.stack([v[3] for v in views])
    ts = np.stack([v[4] for v in views])
    return d, va, Ks, Rs, ts


@pytest.fixture(scope="module")
def sphere_mesh():
    return tsdf_mesh(*sphere_views(), resolution=64)


def test_surface_on_sphere(sphere_mesh):
    v = sphere_mesh["verts"]
    assert len(v) > 1000
    r = np.linalg.norm(v - CENTER, axis=1)
    assert abs(r.mean() - 1.0) < 0.05, r.mean()
    assert r.std() < 0.05, r.std()


def test_faces_oriented_outward(sphere_mesh):
    v, f = sphere_mesh["verts"], sphere_mesh["faces"]
    n = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    n = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    rad = v[f].mean(1) - CENTER
    rad /= np.linalg.norm(rad, axis=1, keepdims=True)
    assert ((n * rad).sum(1) > 0).mean() > 0.95


def test_mesh_mostly_watertight(sphere_mesh):
    """Interior edges shared by exactly 2 faces; the observed part of the
    sphere should be overwhelmingly 2-manifold."""
    f = sphere_mesh["faces"]
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).mean() > 0.9, (counts == 2).mean()


def test_tsdf_sign_structure():
    d, va, Ks, Rs, ts = sphere_views((0.0,))
    out = tsdf_mesh(d, va, Ks, Rs, ts, resolution=48)
    tsdf, w = out["tsdf"], out["weight"]
    origin, voxel = out["origin"], out["voxel"]
    X, Y, Z = tsdf.shape
    gx, gy, gz = np.meshgrid(np.arange(X), np.arange(Y), np.arange(Z),
                             indexing="ij")
    pts = np.stack([gx, gy, gz], -1) * voxel + origin
    dist = np.linalg.norm(pts - CENTER, axis=-1)
    obs = w > 0
    inside = obs & (dist < 1.0 - 2.5 * voxel)
    outside = obs & (dist > 1.0 + 2.5 * voxel)
    # sign convention: negative behind the surface, positive in front
    assert (tsdf[inside] < 0).mean() > 0.95
    assert (tsdf[outside] > 0).mean() > 0.95


def test_empty_grid_returns_empty_mesh():
    tsdf = np.ones((8, 8, 8), np.float32)
    w = np.ones((8, 8, 8), np.float32)
    v, f = marching_tetrahedra(tsdf, w, np.zeros(3), 0.1)
    assert len(v) == 0 and len(f) == 0


def test_dense_pipeline_tsdf_default():
    """The dense pipeline defaults to TSDF meshing and reports it."""
    from tpu3drec.pipelines.dense import DenseReconstructionPipeline
    assert DenseReconstructionPipeline().mesh_method == "tsdf"
