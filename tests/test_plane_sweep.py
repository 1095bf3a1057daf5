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
