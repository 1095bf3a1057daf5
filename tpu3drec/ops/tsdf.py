"""TSDF fusion + marching-tetrahedra surface extraction.

Replaces the reference's Poisson / ball-pivoting / alpha-shape meshing
(DenseReconstruction/mesh_generation.py:29-228, all delegated to Open3D
C++) with a TPU-native design:

  - `tsdf_fuse`: truncated-signed-distance integration of V posed depth
    maps into a static (N, N, N) voxel grid, fully jitted — every view
    projects all voxel centres, samples its depth map with one
    linearized gather (the TPU-fast indexing form, see ops/sift.py), and
    accumulates truncated SDF + weights. This is the FLOP/bandwidth-heavy
    part and it runs entirely on device with static shapes.
  - `marching_tetrahedra`: iso-surface extraction on the host in
    vectorized NumPy. Extraction output size is data-dependent (a
    foreign concept to XLA), and only a few percent of cubes are active,
    so the host pass over the compacted active set is cheap. Marching
    TETRAHEDRA is chosen over classic marching cubes deliberately: its
    16-case table is derivable from first principles in a dozen lines
    (no 256x16 magic tables to copy), it has no ambiguous cases, and
    triangle orientation is fixed globally by the TSDF gradient instead
    of per-case windings.

`tsdf_mesh` is the one-call orchestration used by the dense pipeline
(pipelines/dense.py mesh_method="tsdf").
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("dims",))
def tsdf_fuse(depths: jnp.ndarray, valids: jnp.ndarray,
              Ks: jnp.ndarray, Rs: jnp.ndarray, ts: jnp.ndarray,
              origin: jnp.ndarray, voxel: jnp.ndarray,
              dims: Tuple[int, int, int],
              trunc: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Integrate V depth maps into a TSDF grid.

    depths: (V, H, W) f32; valids: (V, H, W) bool; Ks/Rs/ts: (V, ...)
    per-view intrinsics and world->cam poses; origin: (3,) world coords
    of voxel (0,0,0) centre; voxel: scalar size; trunc: truncation band.
    Returns (tsdf (X,Y,Z) in [-1, 1], weight (X,Y,Z)).
    """
    X, Y, Z = dims
    V, H, W = depths.shape
    gx = jnp.arange(X, dtype=jnp.float32)
    gy = jnp.arange(Y, dtype=jnp.float32)
    gz = jnp.arange(Z, dtype=jnp.float32)
    # voxel centres, flattened (N, 3) with N = X*Y*Z
    pts = jnp.stack(jnp.meshgrid(gx, gy, gz, indexing="ij"),
                    axis=-1).reshape(-1, 3) * voxel + origin[None]

    def integrate(carry, view):
        tsdf_sum, w_sum = carry
        depth, valid, K, R, t = view
        Xc = pts @ R.T + t[None]                       # (N, 3)
        z = Xc[:, 2]
        zsafe = jnp.maximum(z, 1e-6)
        u = Xc[:, 0] / zsafe * K[0, 0] + K[0, 2]
        v = Xc[:, 1] / zsafe * K[1, 1] + K[1, 2]
        ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
        vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
        lin = vi * W + ui
        d = jnp.take(depth.reshape(-1), lin)           # linearized gather
        dv = jnp.take(valid.reshape(-1).astype(jnp.float32), lin)
        in_img = ((u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
                  & (z > 1e-4))
        sdf = d - z
        w = (in_img & (dv > 0) & (sdf > -trunc)).astype(jnp.float32)
        tsdf = jnp.clip(sdf / trunc, -1.0, 1.0)
        return (tsdf_sum + w * tsdf, w_sum + w), None

    init = (jnp.zeros(pts.shape[0], jnp.float32),
            jnp.zeros(pts.shape[0], jnp.float32))
    (tsdf_sum, w_sum), _ = jax.lax.scan(
        integrate, init, (depths, valids, Ks, Rs, ts))
    tsdf = jnp.where(w_sum > 0, tsdf_sum / jnp.maximum(w_sum, 1e-6), 1.0)
    return tsdf.reshape(dims), w_sum.reshape(dims)


# ---------------------------------------------------------------------
# marching tetrahedra (host, vectorized numpy)
# ---------------------------------------------------------------------

# Kuhn 6-tetrahedra decomposition of the unit cube: each tet is a
# monotone bit-path 0 -> 7 (corner c at offset (c>>2&1, c>>1&1, c&1)).
# Kuhn's split is the one whose face triangulations MATCH between
# neighbouring cubes (every face is cut along its (0,0)-(1,1) diagonal),
# so the extracted surface has no cracks at cube boundaries.
_TETS = np.array([
    [0, 4, 6, 7],
    [0, 4, 5, 7],
    [0, 2, 6, 7],
    [0, 2, 3, 7],
    [0, 1, 5, 7],
    [0, 1, 3, 7],
], np.int64)

_CORNER_OFF = np.array([[c >> 2 & 1, c >> 1 & 1, c & 1]
                        for c in range(8)], np.int64)


def _tet_case_tables():
    """Derive the 16-case marching-tetrahedra tables.

    For each sign case (bit i set = corner i of the tet is inside), emit
    up to 2 triangles as triples of cut edges; a cut edge is an (inside,
    outside) corner-slot pair. Orientation is repaired afterwards from
    the TSDF gradient, so winding here is arbitrary."""
    tris_per_case = []
    for case in range(16):
        inside = [i for i in range(4) if case >> i & 1]
        outside = [i for i in range(4) if not (case >> i & 1)]
        tris = []
        if len(inside) == 1:
            a = inside[0]
            e = [(a, o) for o in outside]
            tris.append((e[0], e[1], e[2]))
        elif len(inside) == 3:
            a = outside[0]
            e = [(i, a) for i in inside]
            tris.append((e[0], e[1], e[2]))
        elif len(inside) == 2:
            a, b = inside
            c, d = outside
            # crossing-edge ring: ac, ad, bd, bc
            tris.append(((a, c), (a, d), (b, d)))
            tris.append(((a, c), (b, d), (b, c)))
        tris_per_case.append(tris)
    return tris_per_case


_TET_TRIS = _tet_case_tables()


def marching_tetrahedra(tsdf: np.ndarray, weight: np.ndarray,
                        origin: np.ndarray, voxel: float,
                        iso: float = 0.0,
                        min_weight: float = 1.0
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the iso-surface of a TSDF grid. Returns (verts (Nv, 3)
    world coords, faces (Nf, 3) int). Faces are oriented along the TSDF
    gradient (outward = increasing TSDF)."""
    tsdf = np.asarray(tsdf, np.float32)
    weight = np.asarray(weight, np.float32)
    X, Y, Z = tsdf.shape

    # active cubes: sign change among observed corners
    obs = weight >= min_weight
    val = tsdf - iso
    cx, cy, cz = X - 1, Y - 1, Z - 1
    corner_vals = np.empty((8, cx, cy, cz), np.float32)
    corner_obs = np.ones((cx, cy, cz), bool)
    for c in range(8):
        ox, oy, oz = _CORNER_OFF[c]
        corner_vals[c] = val[ox:ox + cx, oy:oy + cy, oz:oz + cz]
        corner_obs &= obs[ox:ox + cx, oy:oy + cy, oz:oz + cz]
    neg = (corner_vals < 0)
    active = corner_obs & neg.any(axis=0) & (~neg).any(axis=0)
    idx = np.argwhere(active)                          # (A, 3)
    if len(idx) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    # corner positions (grid units) and values for active cubes
    cube_vals = corner_vals[:, active].T               # (A, 8)
    base = idx.astype(np.float32)                      # (A, 3)

    verts_list = []
    for tet in _TETS:
        tv = cube_vals[:, tet]                         # (A, 4)
        case = ((tv < 0) * (1 << np.arange(4))).sum(axis=1)
        for c in range(1, 15):
            rows = np.where(case == c)[0]
            if len(rows) == 0:
                continue
            for tri in _TET_TRIS[c]:
                tri_pts = []
                for (i_in, i_out) in tri:
                    ci, co = tet[i_in], tet[i_out]
                    v1 = cube_vals[rows, ci]   # inside: v1 < 0
                    v2 = cube_vals[rows, co]   # outside: v2 >= 0
                    denom = v1 - v2            # always <= -|v1|
                    t = v1 / np.minimum(denom, -1e-12)
                    p1 = base[rows] + _CORNER_OFF[ci]
                    p2 = base[rows] + _CORNER_OFF[co]
                    tri_pts.append(p1 + t[:, None] * (p2 - p1))
                verts_list.append(np.stack(tri_pts, axis=1))  # (R, 3, 3)

    tris = np.concatenate(verts_list, axis=0)          # (T, 3, 3) grid units
    # weld vertices (quantized keys)
    flat = tris.reshape(-1, 3)
    keys = np.round(flat * 256.0).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    # representative position per welded vertex: first occurrence
    first = np.full(len(uniq), len(flat), np.int64)
    np.minimum.at(first, inv, np.arange(len(flat)))
    verts = flat[first]
    faces = inv.reshape(-1, 3)
    # drop degenerate faces
    good = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
            & (faces[:, 0] != faces[:, 2]))
    faces = faces[good]

    # orient faces along the TSDF gradient at the face centroid
    cent = verts[faces].mean(axis=1)
    ci = np.clip(np.round(cent).astype(np.int64), 0,
                 np.array([X - 1, Y - 1, Z - 1]))
    gx, gy, gz = np.gradient(val)
    grad = np.stack([gx[ci[:, 0], ci[:, 1], ci[:, 2]],
                     gy[ci[:, 0], ci[:, 1], ci[:, 2]],
                     gz[ci[:, 0], ci[:, 1], ci[:, 2]]], axis=1)
    n = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                 verts[faces[:, 2]] - verts[faces[:, 0]])
    flip = (n * grad).sum(axis=1) < 0
    faces[flip] = faces[flip][:, [0, 2, 1]]

    verts_world = verts * voxel + np.asarray(origin, np.float32)[None]
    return verts_world.astype(np.float32), faces.astype(np.int64)


def tsdf_mesh(depths: np.ndarray, valids: np.ndarray,
              Ks: np.ndarray, Rs: np.ndarray, ts: np.ndarray,
              resolution: int = 96,
              trunc_voxels: float = 3.0,
              min_weight: float = 1.0,
              bounds: Optional[Tuple[np.ndarray, np.ndarray]] = None
              ) -> Dict:
    """Fuse depth maps and extract the surface (one-call orchestration).

    Grid bounds default to the robust (2..98 percentile) bounding box of
    the back-projected valid depth samples, padded by the truncation
    band. Returns {verts, faces, tsdf, weight, origin, voxel}.
    """
    depths = np.asarray(depths, np.float32)
    valids = np.asarray(valids, bool)
    Ks = np.asarray(Ks, np.float32)
    Rs = np.asarray(Rs, np.float32)
    ts = np.asarray(ts, np.float32)
    if depths.ndim == 2:
        depths, valids = depths[None], valids[None]
        Ks, Rs, ts = Ks[None], Rs[None], ts[None]

    if bounds is None:
        samples = []
        V, H, W = depths.shape
        for i in range(V):
            vv, uu = np.nonzero(valids[i])
            if len(vv) == 0:
                continue
            sel = np.random.default_rng(0).choice(
                len(vv), size=min(len(vv), 20000), replace=False)
            vv, uu = vv[sel], uu[sel]
            z = depths[i, vv, uu]
            x = (uu - Ks[i, 0, 2]) / Ks[i, 0, 0] * z
            y = (vv - Ks[i, 1, 2]) / Ks[i, 1, 1] * z
            Xc = np.stack([x, y, z], axis=1)
            Xw = (Xc - ts[i][None]) @ Rs[i]
            samples.append(Xw)
        if not samples:
            raise ValueError("no valid depth samples for TSDF bounds")
        allp = np.concatenate(samples)
        lo = np.percentile(allp, 2, axis=0)
        hi = np.percentile(allp, 98, axis=0)
    else:
        lo, hi = bounds
    extent = float(np.max(hi - lo))
    voxel = max(extent / (resolution - 1), 1e-6)
    trunc = trunc_voxels * voxel
    lo = lo - trunc
    dims = tuple(np.minimum(np.ceil((hi + trunc - lo) / voxel).astype(int)
                            + 1, resolution + 2 * int(trunc_voxels) + 2))

    tsdf, weight = tsdf_fuse(
        jnp.asarray(depths), jnp.asarray(valids), jnp.asarray(Ks),
        jnp.asarray(Rs), jnp.asarray(ts),
        jnp.asarray(lo.astype(np.float32)), jnp.float32(voxel),
        tuple(int(d) for d in dims), jnp.float32(trunc))
    tsdf = np.asarray(tsdf)
    weight = np.asarray(weight)
    verts, faces = marching_tetrahedra(tsdf, weight, lo, voxel,
                                       min_weight=min_weight)
    return {"verts": verts, "faces": faces, "tsdf": tsdf,
            "weight": weight, "origin": lo, "voxel": voxel}
