"""Multi-device tests on the 8-virtual-CPU-device mesh: mesh construction,
tensor-parallel 2-NN exactness, and the full sharded pair step (the
framework's replacement for the reference's serial pair loop,
FME/pipeline.py:538-678)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from tpu3drec.parallel.mesh import (
    make_mesh, default_mesh_shape, batch_sharding, DATA_AXIS, MODEL_AXIS,
)
from tpu3drec.parallel.pairs import tp_knn2, make_batched_pair_step
from tpu3drec.ops.match import knn2


def test_mesh_shapes():
    assert default_mesh_shape(8) == (4, 2)
    assert default_mesh_shape(4) == (2, 2)
    assert default_mesh_shape(1) == (1, 1)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == (DATA_AXIS, MODEL_AXIS)


def test_tp_knn2_matches_single_device():
    """Sharded 2-NN must be EXACT vs the single-device reference."""
    rng = np.random.default_rng(0)
    n, m, d = 64, 128, 32
    d1 = rng.normal(size=(n, d)).astype(np.float32)
    d2 = rng.normal(size=(m, d)).astype(np.float32)
    m1 = np.ones(n, bool)
    m2 = rng.random(m) > 0.1

    ref_idx, ref_dist = knn2(jnp.asarray(d1), jnp.asarray(d2),
                             jnp.asarray(m1), jnp.asarray(m2))

    mesh = make_mesh(jax.devices()[:2], shape=(1, 2))

    def f(d1_, d2_, m1_, m2_):
        return tp_knn2(d1_, d2_, m1_, m2_)

    sharded = shard_map(
        f, mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS), P(), P(MODEL_AXIS)),
        out_specs=(P(), P()), check_vma=False)
    idx, dist = jax.jit(sharded)(jnp.asarray(d1), jnp.asarray(d2),
                                 jnp.asarray(m1), jnp.asarray(m2))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(dist), np.asarray(ref_dist),
                               rtol=1e-4, atol=1e-4)


def test_batched_pair_step_runs_on_mesh():
    from tpu3drec.ops.sift import detect_and_compute
    mesh = make_mesh()  # 4x2
    max_features = 64

    def detect_tuple(img):
        xy, resp, scale, angle, desc, mask = detect_and_compute(
            img, max_features=max_features)
        return xy, resp, desc, mask

    step = make_batched_pair_step(mesh, detect_tuple, num_hypotheses=32)

    rng = np.random.default_rng(1)
    B, H, W = 8, 72, 72
    def mk(seed):
        # corner-rich: checkerboard + blobs (the border-support gate
        # rejects keypoints within ~0.5*desc-radius of the edge, so tiny
        # noise images can end up with zero valid keypoints)
        r = np.random.default_rng(seed)
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        img = 0.3 * (((yy // 8).astype(int) + (xx // 8).astype(int)) % 2)
        for _ in range(10):
            cy, cx = r.uniform(10, H - 10), r.uniform(10, W - 10)
            s_ = r.uniform(2.0, 5.0)
            img += r.uniform(0.2, 0.5) * np.exp(
                -(((yy - cy) / s_) ** 2 + ((xx - cx) / s_) ** 2))
        img -= img.min()
        return (img / max(img.max(), 1e-6)).astype(np.float32)
    imgs1 = jnp.asarray(np.stack([mk(i) for i in range(B)]))
    imgs2 = imgs1  # identical pairs -> matches guaranteed
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    sh = batch_sharding(mesh)
    stats = step(jax.device_put(imgs1, sh), jax.device_put(imgs2, sh),
                 jax.device_put(keys, sh))
    nm = np.asarray(stats["num_matches"])
    assert nm.shape == (B,)
    # identical images self-match every valid keypoint; tiny 48x48 images
    # yield only a handful of keypoints each
    assert (nm >= 2).all(), nm
    total = np.asarray(stats["total_matches"])
    assert int(total[0]) == int(nm.sum())  # psum'd global count


def test_graft_entry_contract():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert int(out["num_matches"]) >= 0
    g.dryrun_multichip(8)
    g.dryrun_multichip(4)


def test_ring_knn2_matches_single_device():
    """Ring-rotated (ppermute) 2-NN with BOTH sides sharded must be
    exact vs the single-device reference."""
    from tpu3drec.parallel.pairs import ring_knn2

    rng = np.random.default_rng(3)
    n, m, d = 64, 128, 32
    d1 = rng.normal(size=(n, d)).astype(np.float32)
    d2 = rng.normal(size=(m, d)).astype(np.float32)
    m1 = rng.random(n) > 0.1
    m2 = rng.random(m) > 0.1

    ref_idx, ref_dist = knn2(jnp.asarray(d1), jnp.asarray(d2),
                             jnp.asarray(m1), jnp.asarray(m2))

    mesh = make_mesh(jax.devices()[:4], shape=(1, 4))

    def f(d1_, d2_, m1_, m2_):
        return ring_knn2(d1_, d2_, m1_, m2_)

    sharded = shard_map(
        f, mesh=mesh,
        in_specs=(P(MODEL_AXIS), P(MODEL_AXIS), P(MODEL_AXIS),
                  P(MODEL_AXIS)),
        out_specs=(P(MODEL_AXIS), P(MODEL_AXIS)), check_vma=False)
    idx, dist = jax.jit(sharded)(jnp.asarray(d1), jnp.asarray(d2),
                                 jnp.asarray(m1), jnp.asarray(m2))
    idx = np.asarray(idx)
    dist = np.asarray(dist)
    valid = m1
    np.testing.assert_array_equal(idx[valid], np.asarray(ref_idx)[valid])
    np.testing.assert_allclose(dist[valid], np.asarray(ref_dist)[valid],
                               rtol=1e-4, atol=1e-4)


def test_sharded_stereo_matches_serial():
    """Dense stage multi-chip (parallel/dense.py): one stereo pair per
    device over dp, parity vs serial per-pair dispatch of the SAME
    program. shard_map keeps each device on the unbatched gather form
    (vmap over pairs is the measured 7x dead end)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tpu3drec.parallel.mesh import make_mesh
    from tpu3drec.parallel.dense import sharded_pairwise_stereo
    from tpu3drec.ops.stereo import stereo_depth_pair

    rng = np.random.default_rng(5)
    h, w = 96, 128
    base = rng.uniform(0, 1, (h, w)).astype(np.float32)
    import cv2
    base = cv2.GaussianBlur(base, (5, 5), 1.0)
    K = np.array([[150, 0, w / 2], [0, 150, h / 2], [0, 0, 1]], np.float32)
    neighbours = []
    for i, bx in enumerate((-0.1, 0.1, -0.2)):
        img2 = np.roll(base, int(bx * 50), axis=1)
        neighbours.append((img2, K, np.eye(3, dtype=np.float32),
                          np.array([bx, 0, 0], np.float32), None))

    mesh = make_mesh(jax.devices(), shape=(8, 1))
    outs = sharded_pairwise_stereo(mesh, base, neighbours, K,
                                   num_disparities=32)
    assert len(outs) == 3
    for (img2, K2, R, t, _), got in zip(neighbours, outs):
        ref = stereo_depth_pair(jnp.asarray(base), jnp.asarray(img2),
                                jnp.asarray(K), jnp.asarray(K2),
                                jnp.asarray(R), jnp.asarray(t),
                                num_disparities=32)
        np.testing.assert_allclose(got["depth"], np.asarray(ref["depth"]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(got["valid"],
                                      np.asarray(ref["valid"]))


def test_sharded_stereo_chunks_when_pairs_exceed_devices():
    """n pairs > dp: ceil(n/dp) dispatches, all results correct."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tpu3drec.parallel.mesh import make_mesh
    from tpu3drec.parallel.dense import sharded_pairwise_stereo
    from tpu3drec.ops.stereo import stereo_depth_pair

    rng = np.random.default_rng(9)
    h, w = 64, 96
    import cv2
    base = cv2.GaussianBlur(
        rng.uniform(0, 1, (h, w)).astype(np.float32), (5, 5), 1.0)
    K = np.array([[120, 0, w / 2], [0, 120, h / 2], [0, 0, 1]], np.float32)
    neighbours = []
    for bx in (-0.1, 0.1, -0.15, 0.15, 0.2, -0.2):
        img2 = np.roll(base, int(bx * 40), axis=1)
        neighbours.append((img2, K, np.eye(3, dtype=np.float32),
                          np.array([bx, 0, 0], np.float32), None))

    mesh = make_mesh(jax.devices()[:4], shape=(4, 1))  # 6 pairs on dp=4
    outs = sharded_pairwise_stereo(mesh, base, neighbours, K,
                                   num_disparities=16)
    assert len(outs) == 6
    for (img2, K2, R, t, _), got in zip(neighbours, outs):
        ref = stereo_depth_pair(jnp.asarray(base), jnp.asarray(img2),
                                jnp.asarray(K), jnp.asarray(K2),
                                jnp.asarray(R), jnp.asarray(t),
                                num_disparities=16)
        np.testing.assert_allclose(got["depth"], np.asarray(ref["depth"]),
                                   rtol=1e-4, atol=1e-4)
