"""Implicit-surface reconstruction from oriented point clouds.

TPU-native replacement for the reference's Open3D-delegated surface
reconstruction (DenseReconstruction/mesh_generation.py:29-180):

  - `poisson_mesh`: Poisson surface reconstruction (:29-86). The classic
    formulation — splat oriented normals into a vector field V on a
    voxel grid, solve the (screened) Poisson equation lap(chi) = div V
    for the indicator function chi, extract its iso-surface — is solved
    SPECTRALLY: one batched 3-D FFT diagonalizes the periodic discrete
    Laplacian, so the solve is three forward FFTs, a pointwise multiply,
    and one inverse FFT. This maps to TPU far better than Open3D's
    octree multigrid (irregular neighbour walks): every step is a dense
    static-shape tensor op, and XLA's FFT runs on-device. The periodic
    wrap is immaterial because the domain is padded and extraction is
    masked to the splat support.
  - `alpha_surface_mesh`: alpha-shape equivalent (:144-180) as the
    boundary of the union of alpha-balls — the iso-surface of the exact
    distance-to-point-set field at level alpha. (For dense samplings of
    a closed surface this coincides with the alpha-shape boundary; the
    combinatorial simplex filtration itself is host-hostile and adds
    nothing for reconstruction.) The distance grid is one chunked
    matmul-form nearest-neighbour pass on the MXU.
  - `ball_pivot_mesh`: ball-pivoting equivalent (:87-143) — the r-ball
    offset surface shrunk back along the distance gradient toward the
    samples. True BPA's sequential edge-front pivoting is inherently
    host-serial; the offset+shrink construction reproduces its defining
    property (surface at distance ~0 from the samples, hole radius
    bounded by r) with TPU-shaped ops.

Extraction reuses the crack-free marching-tetrahedra pass from
`ops/tsdf.py`; face orientation follows the field gradient, with the
field sign arranged TSDF-style (negative inside) so orientations agree
across all mesh methods.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu3drec.ops.tsdf import marching_tetrahedra


# ---------------------------------------------------------------------
# splatting
# ---------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("dims",))
def splat_oriented_points(points: jnp.ndarray, normals: jnp.ndarray,
                          mask: jnp.ndarray, origin: jnp.ndarray,
                          voxel: jnp.ndarray,
                          dims: Tuple[int, int, int]
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trilinear scatter of unit normals into a (X,Y,Z,3) vector field.

    Returns (V (X,Y,Z,3), density (X,Y,Z)). Each point deposits its
    normal over the 8 enclosing voxel corners with trilinear weights —
    the low-degree B-spline splat of the Poisson-recon formulation.
    """
    X, Y, Z = dims
    g = (points - origin[None]) / voxel          # grid coords (N, 3)
    g0 = jnp.floor(g)
    f = g - g0                                   # (N, 3) in [0, 1)
    gi = g0.astype(jnp.int32)
    nvox = X * Y * Z
    V = jnp.zeros((nvox, 3), jnp.float32)
    dens = jnp.zeros((nvox,), jnp.float32)
    m = mask.astype(jnp.float32)
    for c in range(8):
        off = jnp.array([c >> 2 & 1, c >> 1 & 1, c & 1], jnp.int32)
        w = jnp.prod(jnp.where(off[None] == 1, f, 1.0 - f), axis=1) * m
        ijk = gi + off[None]
        inb = ((ijk >= 0).all(axis=1)
               & (ijk[:, 0] < X) & (ijk[:, 1] < Y) & (ijk[:, 2] < Z))
        lin = jnp.where(
            inb, (ijk[:, 0] * Y + ijk[:, 1]) * Z + ijk[:, 2], 0)
        w = jnp.where(inb, w, 0.0)
        V = V.at[lin].add(w[:, None] * normals)
        dens = dens.at[lin].add(w)
    return V.reshape(X, Y, Z, 3), dens.reshape(X, Y, Z)


# ---------------------------------------------------------------------
# spectral Poisson solve
# ---------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=())
def solve_poisson_spectral(V: jnp.ndarray, voxel: jnp.ndarray,
                           sigma_voxels: jnp.ndarray,
                           screen: jnp.ndarray) -> jnp.ndarray:
    """Solve (lap - screen) chi = div(G_sigma * V) on a periodic grid.

    Divergence, Gaussian smoothing, and the Laplacian inverse are all
    diagonal in the Fourier basis of the *discrete* central-difference
    operators, so the whole chain is one pointwise complex multiply
    between the forward and inverse FFTs. chi is returned zero-mean.
    """
    X, Y, Z = V.shape[:3]
    h = voxel

    def freq(n):
        return 2.0 * jnp.pi * jnp.fft.fftfreq(n)

    kx, ky, kz = freq(X), freq(Y), freq(Z)
    KX, KY, KZ = jnp.meshgrid(kx, ky, kz, indexing="ij")
    # central-difference derivative eigenvalue: i sin(k) / h
    dx = 1j * jnp.sin(KX) / h
    dy = 1j * jnp.sin(KY) / h
    dz = 1j * jnp.sin(KZ) / h
    # 7-point Laplacian eigenvalue: (2 cos k - 2) / h^2 per axis (<= 0)
    lam = ((2.0 * jnp.cos(KX) - 2.0) + (2.0 * jnp.cos(KY) - 2.0)
           + (2.0 * jnp.cos(KZ) - 2.0)) / (h * h)
    # Gaussian transfer function (grid units)
    k2 = KX * KX + KY * KY + KZ * KZ
    gauss = jnp.exp(-0.5 * (sigma_voxels * sigma_voxels) * k2)

    F = jnp.fft.fftn(V.astype(jnp.complex64), axes=(0, 1, 2))
    div_hat = dx * F[..., 0] + dy * F[..., 1] + dz * F[..., 2]
    denom = lam - screen
    # k = 0 mode: lam = 0; with screen = 0 pin chi_hat(0) = 0 (zero mean)
    safe = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
    chi_hat = jnp.where(jnp.abs(denom) < 1e-12, 0.0,
                        gauss * div_hat / safe)
    chi = jnp.fft.ifftn(chi_hat, axes=(0, 1, 2)).real
    return chi - jnp.mean(chi)


@functools.partial(jax.jit, static_argnames=())
def _sample_trilinear(grid: jnp.ndarray, points: jnp.ndarray,
                      mask: jnp.ndarray, origin: jnp.ndarray,
                      voxel: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked mean of a scalar grid trilinearly sampled at points."""
    X, Y, Z = grid.shape
    g = (points - origin[None]) / voxel
    g0 = jnp.floor(g)
    f = g - g0
    gi = g0.astype(jnp.int32)
    flat = grid.reshape(-1)
    acc = jnp.zeros(points.shape[0], jnp.float32)
    for c in range(8):
        off = jnp.array([c >> 2 & 1, c >> 1 & 1, c & 1], jnp.int32)
        w = jnp.prod(jnp.where(off[None] == 1, f, 1.0 - f), axis=1)
        ijk = jnp.clip(gi + off[None], 0,
                       jnp.array([X - 1, Y - 1, Z - 1], jnp.int32)[None])
        lin = (ijk[:, 0] * Y + ijk[:, 1]) * Z + ijk[:, 2]
        acc = acc + w * jnp.take(flat, lin)
    m = mask.astype(jnp.float32)
    return jnp.sum(acc * m), jnp.sum(m)


def _dilate_mask(mask: np.ndarray, rounds: int) -> np.ndarray:
    """6-connected binary dilation (host numpy; grids are ~2M voxels)."""
    m = mask.copy()
    for _ in range(rounds):
        grown = m.copy()
        grown[1:] |= m[:-1]
        grown[:-1] |= m[1:]
        grown[:, 1:] |= m[:, :-1]
        grown[:, :-1] |= m[:, 1:]
        grown[:, :, 1:] |= m[:, :, :-1]
        grown[:, :, :-1] |= m[:, :, 1:]
        m = grown
    return m


def _grid_setup(pts: np.ndarray, resolution: int, pad_voxels: float):
    lo = pts.min(0)
    hi = pts.max(0)
    extent = float(np.max(hi - lo))
    voxel = max(extent / max(resolution - 1 - 2 * pad_voxels, 1), 1e-9)
    lo = lo - pad_voxels * voxel
    hi = hi + pad_voxels * voxel
    dims = tuple(int(min(np.ceil((h - l) / voxel) + 1, resolution))
                 for l, h in zip(lo, hi))
    return lo.astype(np.float32), float(voxel), dims


def poisson_mesh(points: np.ndarray, normals: Optional[np.ndarray] = None,
                 resolution: int = 96, sigma_voxels: float = 1.5,
                 screen: float = 0.0, support_voxels: int = 3,
                 density_quantile: float = 0.05) -> Dict:
    """Poisson surface reconstruction (mesh_generation.py:29-86).

    points (N,3) with outward unit normals (N,3); if normals are absent
    they are estimated by PCA + outward orientation from the centroid.
    Returns {verts, faces, chi, density, origin, voxel}.
    """
    pts = np.asarray(points, np.float32)
    if normals is None:
        from tpu3drec.ops.pointcloud import estimate_normals
        nrm = np.asarray(estimate_normals(
            jnp.asarray(pts), jnp.ones(len(pts), bool),
            k=min(16, max(len(pts) - 1, 1)),
            viewpoint=jnp.asarray(pts.mean(0))))
        nrm = -nrm  # estimate_normals orients toward viewpoint = inward
    else:
        nrm = np.asarray(normals, np.float32)
    nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)

    origin, voxel, dims = _grid_setup(pts, resolution,
                                      pad_voxels=3 * sigma_voxels + 2)
    V, dens = splat_oriented_points(
        jnp.asarray(pts), jnp.asarray(nrm), jnp.ones(len(pts), bool),
        jnp.asarray(origin), jnp.float32(voxel), dims)
    # chi is LOWER inside (grad chi_indicator = -n_outward at the
    # surface), matching the TSDF sign convention of ops/tsdf.py.
    chi = solve_poisson_spectral(V, jnp.float32(voxel),
                                 jnp.float32(sigma_voxels),
                                 jnp.float32(screen))
    chi_np = np.asarray(chi)
    dens_np = np.asarray(dens)

    # iso level = mean chi over the input samples (the standard choice)
    s, c = _sample_trilinear(chi, jnp.asarray(pts),
                             jnp.ones(len(pts), bool),
                             jnp.asarray(origin), jnp.float32(voxel))
    iso = float(s) / max(float(c), 1.0)

    # extract only where the splat support (dilated) exists — the
    # spectral solve fills the whole periodic box with a smooth field
    thresh = max(np.quantile(dens_np[dens_np > 0], density_quantile)
                 if (dens_np > 0).any() else 0.0, 1e-6)
    support = _dilate_mask(dens_np >= thresh, support_voxels)
    verts, faces = marching_tetrahedra(
        chi_np, support.astype(np.float32), origin, voxel,
        iso=iso, min_weight=0.5)
    return {"verts": verts, "faces": faces, "chi": chi_np,
            "density": dens_np, "origin": origin, "voxel": voxel,
            "iso": iso}


# ---------------------------------------------------------------------
# union-of-balls (alpha shape / ball pivoting equivalents)
# ---------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("dims", "chunk"))
def distance_grid(points: jnp.ndarray, mask: jnp.ndarray,
                  origin: jnp.ndarray, voxel: jnp.ndarray,
                  dims: Tuple[int, int, int],
                  chunk: int = 8192) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact nearest-point distance (+ index) on a voxel grid.

    One matmul-form pass per voxel chunk: |g - p|^2 = |g|^2 + |p|^2
    - 2 g.p rides the MXU; the min-reduction is the only VPU work.
    Returns (dist (X,Y,Z) f32, argmin (X,Y,Z) i32).
    """
    X, Y, Z = dims
    n = X * Y * Z
    npad = -n % chunk
    gx = jnp.arange(X, dtype=jnp.float32)
    gy = jnp.arange(Y, dtype=jnp.float32)
    gz = jnp.arange(Z, dtype=jnp.float32)
    G = jnp.stack(jnp.meshgrid(gx, gy, gz, indexing="ij"),
                  axis=-1).reshape(-1, 3) * voxel + origin[None]
    G = jnp.concatenate([G, jnp.zeros((npad, 3), jnp.float32)], axis=0)
    p2 = jnp.sum(points * points, axis=1)
    p2 = jnp.where(mask, p2, jnp.inf)

    def one_chunk(g):
        d2 = (jnp.sum(g * g, axis=1)[:, None] + p2[None, :]
              - 2.0 * g @ points.T)
        idx = jnp.argmin(d2, axis=1)
        return jnp.take_along_axis(d2, idx[:, None], axis=1)[:, 0], idx

    d2min, amin = jax.lax.map(one_chunk, G.reshape(-1, chunk, 3))
    d2min = d2min.reshape(-1)[:n]
    amin = amin.reshape(-1)[:n]
    return (jnp.sqrt(jnp.maximum(d2min, 0.0)).reshape(X, Y, Z),
            amin.astype(jnp.int32).reshape(X, Y, Z))


def _uob_field(points: np.ndarray, radius: float, resolution: int,
               max_points: int = 16384,
               aux: Optional[np.ndarray] = None):
    """Distance field + grid geometry for union-of-balls surfaces.

    aux: optional per-point payload (e.g. normals) subsampled in lockstep
    with the points; returned as the 5th element when given.
    """
    pts = np.asarray(points, np.float32)
    if aux is not None:
        aux = np.asarray(aux, np.float32)
    if len(pts) > max_points:
        sel = np.random.default_rng(0).choice(
            len(pts), max_points, replace=False)
        pts = pts[sel]
        if aux is not None:
            aux = aux[sel]
    # pad so the ball radius fits inside the box (estimate voxel first)
    extent = float(np.max(pts.max(0) - pts.min(0)))
    voxel_est = max(extent / max(resolution - 1, 1), 1e-9)
    pad = int(np.ceil(radius / voxel_est)) + 2
    origin2, voxel2, dims2 = _grid_setup(pts, resolution + 2 * pad,
                                         pad_voxels=pad)
    npts = len(pts)
    cap = int(np.ceil(npts / 1024) * 1024)
    pts_pad = np.zeros((cap, 3), np.float32)
    pts_pad[:npts] = pts
    mask = np.zeros(cap, bool)
    mask[:npts] = True
    d, amin = distance_grid(jnp.asarray(pts_pad), jnp.asarray(mask),
                            jnp.asarray(origin2), jnp.float32(voxel2),
                            dims2)
    out = (np.asarray(d), np.asarray(amin), origin2, voxel2, pts)
    return out + (aux,) if aux is not None else out


def alpha_surface_mesh(points: np.ndarray, alpha: float = 0.03,
                       resolution: int = 96) -> Dict:
    """Alpha-shape-equivalent surface (mesh_generation.py:144-180):
    the boundary of the union of alpha-balls around the samples,
    extracted as the iso-surface of the exact distance field. (The alpha
    shape of a dense surface sampling is the thin shell of alpha-balls;
    its boundary is exactly this iso-surface.)"""
    d, _, origin, voxel, _ = _uob_field(points, alpha, resolution)
    field = d - float(alpha)            # negative inside the ball union
    verts, faces = marching_tetrahedra(
        field, np.ones_like(field), origin, voxel, iso=0.0,
        min_weight=0.5)
    return {"verts": verts, "faces": faces, "distance": d,
            "origin": origin, "voxel": voxel}


def _median_nn_spacing(pts: np.ndarray) -> float:
    sub = pts[np.random.default_rng(0).choice(
        len(pts), min(len(pts), 2048), replace=False)]
    d2 = ((sub[:, None] - sub[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    return float(np.median(np.sqrt(d2.min(1))))


def ball_pivot_mesh(points: np.ndarray,
                    normals: Optional[np.ndarray] = None,
                    radius: Optional[float] = None,
                    resolution: int = 96) -> Dict:
    """Ball-pivoting equivalent (mesh_generation.py:87-143).

    True BPA's sequential edge-front pivoting is inherently host-serial;
    this reproduces its defining properties — a surface interpolating
    the samples, with holes only where the r-ball finds no support —
    as the zero set of the Hoppe signed distance (x - p_near) . n_near,
    extracted only within distance r of the samples. radius defaults to
    2x the median nearest-neighbour spacing (the usual BPA heuristic).
    """
    pts = np.asarray(points, np.float32)
    if normals is None:
        from tpu3drec.ops.pointcloud import estimate_normals
        nrm = np.asarray(estimate_normals(
            jnp.asarray(pts), jnp.ones(len(pts), bool),
            k=min(16, max(len(pts) - 1, 1)),
            viewpoint=jnp.asarray(pts.mean(0))))
        nrm = -nrm  # estimate_normals orients toward viewpoint = inward
    else:
        nrm = np.asarray(normals, np.float32)
    nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True),
                           1e-12)
    if radius is None:
        radius = 2.0 * _median_nn_spacing(pts)
    d, amin, origin, voxel, used, used_n = _uob_field(
        pts, radius, resolution, aux=nrm)
    X, Y, Z = d.shape
    gx, gy, gz = np.meshgrid(np.arange(X), np.arange(Y), np.arange(Z),
                             indexing="ij")
    centres = (np.stack([gx, gy, gz], axis=-1).astype(np.float32)
               * voxel + origin)
    pn = used[amin]                                    # (X,Y,Z,3)
    nn = used_n[amin]
    signed = ((centres - pn) * nn).sum(-1)             # negative inside
    support = (d <= float(radius)).astype(np.float32)
    verts, faces = marching_tetrahedra(
        signed, support, origin, voxel, iso=0.0, min_weight=0.5)
    return {"verts": verts, "faces": faces, "distance": d,
            "origin": origin, "voxel": voxel, "radius": float(radius)}
