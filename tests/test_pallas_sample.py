"""Parity tests for the Pallas window-DMA orientation+descriptor kernel
(ops/pallas_sample.py) — interpret mode on CPU vs the NumPy oracle, plus
integrated-detector agreement between the xla and pallas samplers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu3drec.ops.pallas_sample import (
    frac_bits, oracle_ori_desc, ori_desc_windows, prep_meta, pad_dims,
)
from tpu3drec.ops.sift import detect_and_compute


def _grad_stacks(S, H, W, seed=0):
    rng = np.random.default_rng(seed)
    Hp, Wp = pad_dims(H, W)
    dx = np.zeros((S, Hp, Wp), np.float32)
    dy = np.zeros((S, Hp, Wp), np.float32)
    dx[:, :H, :W] = rng.standard_normal((S, H, W)).astype(np.float32) * 0.1
    dy[:, :H, :W] = rng.standard_normal((S, H, W)).astype(np.float32) * 0.1
    return dx, dy, Hp, Wp


def test_kernel_matches_oracle():
    S, H, W = 6, 120, 160
    dx, dy, Hp, Wp = _grad_stacks(S, H, W)
    # bf16-round so the oracle sees exactly what the kernel reads
    dxb = np.asarray(jnp.asarray(dx, jnp.bfloat16).astype(jnp.float32))
    dyb = np.asarray(jnp.asarray(dy, jnp.bfloat16).astype(jnp.float32))

    rng = np.random.default_rng(1)
    K = 6
    xs = rng.uniform(55, W - 55, K).astype(np.float32)
    ys = rng.uniform(55, H - 55, K).astype(np.float32)
    layer = rng.integers(1, 4, K).astype(np.int32)
    scl = rng.uniform(1.6, 3.5, K).astype(np.float32)
    keep = np.ones(K, bool)
    keep[4] = False

    imeta, dims = prep_meta(jnp.asarray(xs), jnp.asarray(ys),
                            jnp.asarray(layer), jnp.asarray(scl),
                            jnp.asarray(keep), Hp, Wp, H, W)
    angle, desc = jax.jit(ori_desc_windows)(
        jnp.asarray(dx, jnp.bfloat16), jnp.asarray(dy, jnp.bfloat16),
        imeta, dims)
    angle, desc = np.asarray(angle), np.asarray(desc)

    for k in range(K):
        if not keep[k]:
            assert angle[k] == 0 and np.all(desc[k] == 0)
            continue
        scl_q = round(scl[k] * 1024.0) / 1024.0  # kernel's fixed point
        a_ref, d_ref = oracle_ori_desc(dxb[layer[k]], dyb[layer[k]],
                                       xs[k], ys[k], scl_q, hp=Hp)
        da = abs(a_ref - angle[k])
        da = min(da, 2 * np.pi - da)
        cos = desc[k] @ d_ref / max(
            np.linalg.norm(desc[k]) * np.linalg.norm(d_ref), 1e-9)
        assert da < 1e-3, (k, da)
        assert cos > 0.9999, (k, cos)


def test_kernel_vmap_batches_via_flattening():
    S, H, W = 4, 96, 128
    dx, dy, Hp, Wp = _grad_stacks(S, H, W, seed=2)
    rng = np.random.default_rng(3)
    B, K = 2, 4
    xs = rng.uniform(50, W - 50, (B, K)).astype(np.float32)
    ys = rng.uniform(45, H - 45, (B, K)).astype(np.float32)
    layer = rng.integers(1, 4, (B, K)).astype(np.int32)
    scl = rng.uniform(1.6, 3.0, (B, K)).astype(np.float32)
    keep = np.ones((B, K), bool)

    dxs = jnp.asarray(np.stack([dx, dx[::-1]]), jnp.bfloat16)
    dys = jnp.asarray(np.stack([dy, dy[::-1]]), jnp.bfloat16)
    metas = [prep_meta(jnp.asarray(xs[b]), jnp.asarray(ys[b]),
                       jnp.asarray(layer[b]), jnp.asarray(scl[b]),
                       jnp.asarray(keep[b]), Hp, Wp, H, W)
             for b in range(B)]
    imeta = jnp.stack([m[0] for m in metas])
    dims = metas[0][1]

    a_b, d_b = jax.jit(jax.vmap(
        ori_desc_windows, in_axes=(0, 0, 0, None)))(
            dxs, dys, imeta, dims)
    for b in range(B):
        a1, d1 = ori_desc_windows(dxs[b], dys[b], imeta[b], dims)
        np.testing.assert_allclose(np.asarray(a_b[b]), np.asarray(a1),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(d_b[b]), np.asarray(d1),
                                   atol=1e-3)


def test_integrated_pallas_sampler_agrees_with_xla(test_image):
    img = jnp.asarray(test_image)
    out_x = detect_and_compute(img, max_features=256, sampler="xla")
    out_p = detect_and_compute(img, max_features=256, sampler="pallas")
    mx, mp = np.asarray(out_x[5]), np.asarray(out_p[5])
    # identical detection; only angle/descriptor differ (dense vs grid)
    assert mx.sum() == mp.sum()
    both = mx & mp
    np.testing.assert_allclose(np.asarray(out_x[0])[both],
                               np.asarray(out_p[0])[both])
    dx_, dp_ = np.asarray(out_x[4])[both], np.asarray(out_p[4])[both]
    cos = (dx_ * dp_).sum(1) / np.maximum(
        np.linalg.norm(dx_, axis=1) * np.linalg.norm(dp_, axis=1), 1e-9)
    assert np.median(cos) > 0.97, float(np.median(cos))
    assert (cos > 0.8).mean() > 0.9, float((cos > 0.8).mean())


def test_prep_meta_contract_8_bytes_per_keypoint():
    """SMEM budget contract: meta is [lv | sclq << 16, xy_pack] two
    int32 = 8 B/keypoint (batch 96 x 1280 candidates must fit the 1 MB
    scalar-prefetch budget — r2 #7), the fixed-point (x, y) pack
    round-trips to 1/64 px and the scale to 1/1024."""
    import numpy as np
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    K = 64
    xs = rng.uniform(0, 1023, K).astype(np.float32)
    ys = rng.uniform(0, 1023, K).astype(np.float32)
    layer = rng.integers(1, 6, K).astype(np.int32)
    scl = rng.uniform(1.5, 4.0, K).astype(np.float32)
    keep = rng.random(K) > 0.3
    imeta, dims = prep_meta(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(layer),
        jnp.asarray(scl), jnp.asarray(keep), 480, 768, 480, 640)
    assert imeta.shape == (K, 2) and imeta.dtype == jnp.int32
    assert dims.shape == (2,)
    im = np.asarray(imeta)
    # low half-word: layer+1 when kept, whole word 0 otherwise
    np.testing.assert_array_equal(im[:, 0] & 0xFFFF,
                                  np.where(keep, layer + 1, 0))
    # high half-word: 1/1024 fixed-point scale (kept slots)
    sclq = (im[:, 0] >> 16) & 0xFFFF
    np.testing.assert_allclose(sclq[keep] / 1024.0, scl[keep],
                               atol=1 / 2048 + 1e-6)
    assert (im[~keep, 0] == 0).all()
    # fixed-point unpack (kernel's arithmetic) recovers x, y to 1/128 px
    xq = im[:, 1] & 0xFFFF
    yq = (im[:, 1] >> 16) & 0xFFFF
    np.testing.assert_allclose(xq / 64.0, xs, atol=1 / 128 + 1e-6)
    np.testing.assert_allclose(yq / 64.0, ys, atol=1 / 128 + 1e-6)


def test_frac_bits_per_shape_bucket():
    """fb shrinks with the stack so 16-bit coords never saturate
    (ADVICE r2: fixed fb=6 clipped x=1500 to 1023.98 on >1024-px images)."""
    assert frac_bits(480, 768) == 6
    assert frac_bits(1024, 1024) == 6
    assert frac_bits(1080, 1920) == 5
    assert frac_bits(2048, 2048) == 5
    assert frac_bits(2160, 3840) == 4
    assert frac_bits(4320, 7680) == 3
    with pytest.raises(ValueError):
        frac_bits(8, 40000)


def test_prep_meta_large_image_round_trip():
    """The advisor's failure case: x=1500 on a 2048-wide stack must
    round-trip (was saturating at 1023.98 px with fixed fb=6)."""
    hp, wp = 1088, 2048
    fb = frac_bits(hp, wp)
    xs = np.array([1500.0, 37.25, 2040.5], np.float32)
    ys = np.array([1060.75, 3.0, 512.5], np.float32)
    imeta, _ = prep_meta(
        jnp.asarray(xs), jnp.asarray(ys),
        jnp.asarray([1, 1, 1], np.int32), jnp.ones(3, np.float32),
        jnp.asarray([True] * 3), hp, wp, 1080, 2040)
    im = np.asarray(imeta)
    xq = im[:, 1] & 0xFFFF
    yq = (im[:, 1] >> 16) & 0xFFFF
    q = 1.0 / (1 << fb)
    np.testing.assert_allclose(xq * q, xs, atol=q / 2 + 1e-6)
    np.testing.assert_allclose(yq * q, ys, atol=q / 2 + 1e-6)


def test_kernel_matches_oracle_beyond_1024px():
    """Kernel parity on a 2048-wide stack with keypoints past 1024 px
    (fb=5 bucket): the kernel and the oracle agree when the oracle is fed
    the dequantized coordinates the kernel actually sees."""
    S, H, W = 2, 160, 2000
    dx, dy, Hp, Wp = _grad_stacks(S, H, W, seed=7)
    fb = frac_bits(Hp, Wp)
    assert fb == 5
    dxb = np.asarray(jnp.asarray(dx, jnp.bfloat16).astype(jnp.float32))
    dyb = np.asarray(jnp.asarray(dy, jnp.bfloat16).astype(jnp.float32))

    xs = np.array([1500.37, 1980.12, 700.81], np.float32)
    ys = np.array([80.22, 100.61, 60.44], np.float32)
    layer = np.array([1, 1, 1], np.int32)
    scl = np.array([2.0, 3.1, 1.7], np.float32)
    keep = np.ones(3, bool)

    imeta, dims = prep_meta(jnp.asarray(xs), jnp.asarray(ys),
                            jnp.asarray(layer), jnp.asarray(scl),
                            jnp.asarray(keep), Hp, Wp, H, W)
    angle, desc = jax.jit(ori_desc_windows)(
        jnp.asarray(dx, jnp.bfloat16), jnp.asarray(dy, jnp.bfloat16),
        imeta, dims)
    angle, desc = np.asarray(angle), np.asarray(desc)

    im = np.asarray(imeta)
    q = 1.0 / (1 << fb)
    for k in range(3):
        x_deq = (im[k, 1] & 0xFFFF) * q
        y_deq = ((im[k, 1] >> 16) & 0xFFFF) * q
        scl_q = round(scl[k] * 1024.0) / 1024.0
        a_ref, d_ref = oracle_ori_desc(dxb[layer[k]], dyb[layer[k]],
                                       x_deq, y_deq, scl_q, hp=Hp)
        da = abs(a_ref - angle[k])
        da = min(da, 2 * np.pi - da)
        cos = desc[k] @ d_ref / max(
            np.linalg.norm(desc[k]) * np.linalg.norm(d_ref), 1e-9)
        assert da < 1e-3, (k, da)
        assert cos > 0.9999, (k, cos)
