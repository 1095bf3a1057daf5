"""Point-cloud processing: backprojection, outlier filters, normals,
downsampling, merging, ICP.

TPU-native replacement for the Open3D/scipy/sklearn surface of the
reference PointCloudProcessor (DenseReconstruction/point_cloud_processing.py):
depth->cloud backprojection (:29-85), statistical + radius outlier removal
and voxel downsampling (:86-152), multi-cloud merge + ICP registration
(:153-264), PCA normals (:265-308), quality analytics (:309-377), PLY
export (:482-527), and farthest-point downsampling (:528-616).

kNN queries run as chunked masked distance matrices on the MXU (same
kernel family as descriptor matching); the voxel hash runs on host (it is
a data-dependent-size dictionary op, not TPU work).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_INF = np.float32(3.4e38)


def depth_map_to_point_cloud(depth: jnp.ndarray, K: jnp.ndarray,
                             R: Optional[jnp.ndarray] = None,
                             t: Optional[jnp.ndarray] = None,
                             image: Optional[jnp.ndarray] = None,
                             valid: Optional[jnp.ndarray] = None,
                             stride: int = 1):
    """Backproject a depth map to world points (+ colors).

    Returns (points (N,3), colors (N,3) or None, mask (N,)) with
    N = (H/stride)*(W/stride) static. R, t: world->cam pose; identity if None.
    (reference point_cloud_processing.py:29-85)
    """
    d = depth[::stride, ::stride]
    h, w = d.shape
    v = (valid[::stride, ::stride] if valid is not None else d > 1e-6)
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32) * stride,
                          jnp.arange(w, dtype=jnp.float32) * stride,
                          indexing="ij")
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    z = d.reshape(-1)
    x = (xs.reshape(-1) - cx) / fx * z
    y = (ys.reshape(-1) - cy) / fy * z
    Xc = jnp.stack([x, y, z], axis=1)
    if R is not None:
        Xw = (Xc - t[None, :]) @ R  # inverse of x_c = R x_w + t
    else:
        Xw = Xc
    colors = None
    if image is not None:
        im = image[::stride, ::stride]
        if im.ndim == 2:
            c = im.reshape(-1)
            colors = jnp.stack([c, c, c], axis=1)
        else:
            colors = im.reshape(-1, im.shape[-1])
    return Xw, colors, v.reshape(-1)


def _chunked_knn_dists(points: jnp.ndarray, mask: jnp.ndarray, k: int,
                       chunk: int = 2048) -> jnp.ndarray:
    """(N, k) distances to the k nearest valid neighbours (self excluded)."""
    n = points.shape[0]
    pad = (-n) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    msk = jnp.pad(mask, (0, pad))
    nn = pts.shape[0]
    sq = jnp.sum(pts * pts, axis=1)

    def row_chunk(start):
        rows = lax.dynamic_slice_in_dim(pts, start, chunk, 0)
        rsq = lax.dynamic_slice_in_dim(sq, start, chunk, 0)
        d2 = rsq[:, None] + sq[None, :] - 2.0 * rows @ pts.T
        d2 = jnp.where(msk[None, :], d2, _INF)
        # exclude self
        idx = start + jnp.arange(chunk)
        d2 = d2.at[jnp.arange(chunk), idx].set(_INF)
        neg, _ = lax.top_k(-d2, k)
        return jnp.sqrt(jnp.maximum(-neg, 0.0))

    starts = jnp.arange(0, nn, chunk)
    out = lax.map(row_chunk, starts)  # (nchunks, chunk, k)
    return out.reshape(nn, k)[:n]


@functools.partial(jax.jit, static_argnames=("k",))
def statistical_outlier_mask(points: jnp.ndarray, mask: jnp.ndarray,
                             k: int = 20, std_ratio: float = 2.0
                             ) -> jnp.ndarray:
    """Open3D remove_statistical_outlier equivalent: keep points whose mean
    kNN distance is within mean + std_ratio * std of the population."""
    d = _chunked_knn_dists(points, mask, k)
    mean_d = jnp.mean(d, axis=1)
    w = mask.astype(points.dtype)
    mu = jnp.sum(mean_d * w) / jnp.maximum(jnp.sum(w), 1.0)
    var = jnp.sum((mean_d - mu) ** 2 * w) / jnp.maximum(jnp.sum(w), 1.0)
    thr = mu + std_ratio * jnp.sqrt(var)
    return mask & (mean_d <= thr)


@functools.partial(jax.jit, static_argnames=("k",))
def radius_outlier_mask(points: jnp.ndarray, mask: jnp.ndarray,
                        radius: float, min_neighbors: int = 5,
                        k: int = 32) -> jnp.ndarray:
    """Open3D remove_radius_outlier equivalent (k caps the neighbour count
    actually inspected)."""
    d = _chunked_knn_dists(points, mask, k)
    count = jnp.sum(d <= radius, axis=1)
    return mask & (count >= min_neighbors)


def voxel_downsample(points: np.ndarray, voxel_size: float,
                     colors: Optional[np.ndarray] = None,
                     mask: Optional[np.ndarray] = None):
    """Voxel-hash average downsample (host-side; data-dependent sizes)."""
    pts = np.asarray(points)
    if mask is not None:
        pts = pts[np.asarray(mask)]
        if colors is not None:
            colors = np.asarray(colors)[np.asarray(mask)]
    if len(pts) == 0:
        return pts, colors
    keys = np.floor(pts / voxel_size).astype(np.int64)
    _, inv, counts = np.unique(keys, axis=0, return_inverse=True,
                               return_counts=True)
    acc = np.zeros((len(counts), 3))
    np.add.at(acc, inv, pts)
    out = acc / counts[:, None]
    out_c = None
    if colors is not None:
        accc = np.zeros((len(counts), colors.shape[1]))
        np.add.at(accc, inv, colors)
        out_c = accc / counts[:, None]
    return out.astype(np.float32), out_c


@functools.partial(jax.jit, static_argnames=("k",))
def estimate_normals(points: jnp.ndarray, mask: jnp.ndarray,
                     k: int = 16,
                     viewpoint: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """PCA normals from kNN neighbourhoods, oriented toward `viewpoint`
    (Open3D estimate_normals + orient_normals equivalent,
    point_cloud_processing.py:265-308)."""
    n = points.shape[0]
    sq = jnp.sum(points * points, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * points @ points.T
    d2 = jnp.where(mask[None, :], d2, _INF)
    d2 = d2.at[jnp.arange(n), jnp.arange(n)].set(0.0)  # include self
    _, idx = lax.top_k(-d2, k)                         # (N, k)
    nbr = points[idx]                                  # (N, k, 3)
    mu = jnp.mean(nbr, axis=1, keepdims=True)
    c = nbr - mu
    cov = jnp.einsum("nki,nkj->nij", c, c) / k
    _, vecs = jnp.linalg.eigh(cov)
    normals = vecs[:, :, 0]
    vp = viewpoint if viewpoint is not None else jnp.zeros(3)
    to_vp = vp[None, :] - points
    sign = jnp.sign(jnp.sum(normals * to_vp, axis=1))
    sign = jnp.where(sign == 0, 1.0, sign)
    return normals * sign[:, None]


def farthest_point_downsample(points: jnp.ndarray, mask: jnp.ndarray,
                              m: int) -> jnp.ndarray:
    """FPS indices (point_cloud_processing.py:528-616) — O(m N) masked."""
    n = points.shape[0]

    def body(carry, _):
        dist, selected_last = carry
        d_new = jnp.sum((points - points[selected_last]) ** 2, axis=1)
        dist = jnp.minimum(dist, d_new)
        dist_m = jnp.where(mask, dist, -1.0)
        nxt = jnp.argmax(dist_m)
        return (dist, nxt), nxt

    first = jnp.argmax(mask)
    init = (jnp.full((n,), _INF), first)
    _, idx = lax.scan(body, init, None, length=m - 1)
    return jnp.concatenate([first[None], idx])


def icp_register(src: jnp.ndarray, dst: jnp.ndarray,
                 src_mask: jnp.ndarray, dst_mask: jnp.ndarray,
                 iters: int = 20, max_corr_dist: float = 0.5
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Point-to-point ICP: returns (R, t) aligning src -> dst
    (Open3D registration_icp equivalent, point_cloud_processing.py:153-264)."""
    def step(carry, _):
        R, t = carry
        moved = src @ R.T + t
        d2 = (jnp.sum(moved * moved, 1)[:, None]
              + jnp.sum(dst * dst, 1)[None, :]
              - 2.0 * moved @ dst.T)
        d2 = jnp.where(dst_mask[None, :], d2, _INF)
        j = jnp.argmin(d2, axis=1)
        dmin = jnp.take_along_axis(d2, j[:, None], axis=1)[:, 0]
        w = (src_mask & (dmin <= max_corr_dist ** 2)).astype(src.dtype)
        target = dst[j]
        wsum = jnp.maximum(jnp.sum(w), 1.0)
        mu_s = jnp.sum(moved * w[:, None], 0) / wsum
        mu_d = jnp.sum(target * w[:, None], 0) / wsum
        H = ((moved - mu_s) * w[:, None]).T @ (target - mu_d)
        U, _, Vt = jnp.linalg.svd(H)
        S = jnp.diag(jnp.array([1.0, 1.0,
                                jnp.linalg.det(Vt.T @ U.T)]))
        dR = Vt.T @ S @ U.T
        dt = mu_d - dR @ mu_s
        return (dR @ R, dR @ t + dt), None

    init = (jnp.eye(3, dtype=src.dtype), jnp.zeros(3, src.dtype))
    (R, t), _ = lax.scan(step, init, None, length=iters)
    return R, t


def point_cloud_quality(points: np.ndarray,
                        mask: Optional[np.ndarray] = None) -> Dict:
    """Analytics (point_cloud_processing.py:309-377)."""
    pts = np.asarray(points)
    if mask is not None:
        pts = pts[np.asarray(mask)]
    if len(pts) == 0:
        return {"num_points": 0}
    extent = pts.max(0) - pts.min(0)
    centroid = pts.mean(0)
    return {
        "num_points": int(len(pts)),
        "extent": extent.tolist(),
        "centroid": centroid.tolist(),
        "rms_radius": float(np.sqrt(((pts - centroid) ** 2).sum(1).mean())),
    }


def save_ply(path, points: np.ndarray, colors: Optional[np.ndarray] = None,
             normals: Optional[np.ndarray] = None) -> None:
    """ASCII PLY export (point_cloud_processing.py:482-527)."""
    pts = np.asarray(points)
    n = len(pts)
    header = ["ply", "format ascii 1.0", f"element vertex {n}",
              "property float x", "property float y", "property float z"]
    if normals is not None:
        header += ["property float nx", "property float ny",
                   "property float nz"]
    if colors is not None:
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
    header += ["end_header"]
    with open(path, "w") as f:
        f.write("\n".join(header) + "\n")
        for i in range(n):
            row = [f"{pts[i, 0]:.6f}", f"{pts[i, 1]:.6f}", f"{pts[i, 2]:.6f}"]
            if normals is not None:
                row += [f"{normals[i, j]:.4f}" for j in range(3)]
            if colors is not None:
                c = np.clip(np.asarray(colors)[i] * 255
                            if np.asarray(colors).max() <= 1.0
                            else np.asarray(colors)[i], 0, 255).astype(int)
                row += [str(c[0]), str(c[1]), str(c[2])]
            f.write(" ".join(row) + "\n")
