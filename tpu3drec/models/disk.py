"""DISK in Flax: thin-U-Net feature extractor with heatmap + 128-d
descriptors, weight-compatible with the published checkpoints.

TPU-native replacement for the reference's torch DISK wrapper
(deep_learning_detectors.py:150-226). The backbone transcribes the
published DISK architecture (Tyszkiewicz et al. 2020, cvg/DISK, which
builds on the `unets` package):

  thin U-Net, kernel size 5, RGB input:
    down channels [16, 32, 64, 64, 64] — block 0 convolves at full
      resolution, blocks 1..4 average-pool 2x then convolve;
    up channels [64, 64, 64, 129] — nearest-neighbour 2x upsample,
      concat the skip, convolve;
    every conv block is PReLU gate -> InstanceNorm (no affine) ->
      5x5 conv (the "thin" single-conv block); the FIRST down block
      applies the conv directly to the image (no gate/norm on raw
      pixels — documented assumption, see `first_block_plain`).
  output channels: descriptors = [:128], heatmap = [128] (DISK's
  `features[:, :desc_dim]` / `[:, desc_dim:]` split).

`load_torch_weights` converts a torch state dict ORDER-BASED: tensors
are consumed in registration order (PReLU slopes, conv kernels, conv
biases), so it tolerates the naming differences between the official
checkpoint (`unet.path_down...`) and any mirror — a topology mismatch
surfaces as a tensor count/shape error instead of silently loading
garbage. Numerical parity vs a torch mirror of the published blocks is
proven in tests/test_disk_parity.py (same harness as SuperPoint /
LightGlue). NB: the reference's own committed benchmark records DISK
accuracy as 0.000 — its DISK path was broken (BASELINE.md); this
converter + the parity harness make the row closable the moment a real
checkpoint is dropped into the weights dir.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tpu3drec.core.types import Features, DescriptorKind

DOWN = (16, 32, 64, 64, 64)
UP = (64, 64, 64, 129)
KSIZE = 5


def _instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d, affine=False (torch default): per-sample,
    per-channel spatial standardization."""
    mu = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps)


class _ThinBlock(nn.Module):
    """gate (PReLU) -> InstanceNorm -> 5x5 conv; `plain` skips gate/norm
    (the image-facing first block)."""
    ch: int
    plain: bool = False

    @nn.compact
    def __call__(self, x):
        if not self.plain:
            slope = self.param("prelu", nn.initializers.constant(0.25),
                               (1,), jnp.float32)
            x = jnp.where(x >= 0, x, slope * x)
            x = _instance_norm(x)
        return nn.Conv(self.ch, (KSIZE, KSIZE), padding="SAME",
                       name="conv")(x)


class DISKNet(nn.Module):
    """Published DISK thin U-Net (see module docstring)."""

    desc_dim: int = 128
    first_block_plain: bool = True

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3), H % 16 == 0, W % 16 == 0.
        Returns (heat (B, H, W), desc (B, H, W, 128) L2-normalized)."""
        skips = []
        h = x
        for i, ch in enumerate(DOWN):
            if i > 0:
                h = nn.avg_pool(h, (2, 2), (2, 2))
            h = _ThinBlock(ch, plain=(i == 0 and self.first_block_plain),
                           name=f"down_{i}")(h)
            skips.append(h)
        for i, ch in enumerate(UP):
            skip = skips[len(DOWN) - 2 - i]
            b_, hh, ww, c_ = skip.shape
            h = jax.image.resize(h, (b_, hh, ww, h.shape[-1]), "nearest")
            h = jnp.concatenate([h, skip], axis=-1)
            h = _ThinBlock(ch, name=f"up_{i}")(h)
        desc = h[..., : self.desc_dim]
        heat = h[..., self.desc_dim]
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
        return heat, desc


class DISK:
    """Inference wrapper (padded top-K extraction)."""

    def __init__(self, params: Optional[Dict] = None,
                 max_features: int = 2048, nms_radius: int = 2,
                 threshold: float = 0.0,
                 matmul_precision: str = "default"):
        self.net = DISKNet()
        self.params = params
        self.max_features = max_features
        self.nms_radius = nms_radius
        self.threshold = threshold
        # U-Net convs at native MXU precision (see models/superpoint.py)
        # NB: _forward is jitted with static self (identity-hashed), so
        # matmul_precision is BAKED IN at first call — set it at
        # construction, never mutate it afterwards; it also shadows any
        # outer jax.default_matmul_precision context (ADVICE r4 #4).
        self.matmul_precision = matmul_precision

    def init_random(self, image_shape: Tuple[int, int], seed: int = 0):
        x = jnp.zeros((1,) + tuple(image_shape) + (3,), jnp.float32)
        self.params = self.net.init(jax.random.PRNGKey(seed), x)
        return self.params

    def extract(self, image: jnp.ndarray) -> Features:
        from jax import lax
        if self.params is None:
            raise RuntimeError("DISK weights not loaded")
        h, w = image.shape
        ph, pw = (-h) % 16, (-w) % 16
        x = jnp.pad(image, ((0, ph), (0, pw)))[None, :, :, None]
        x = jnp.repeat(x, 3, axis=-1)   # grayscale -> RGB input
        with jax.default_matmul_precision(self.matmul_precision):
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


# -- torch checkpoint conversion ---------------------------------------

def load_torch_weights(state_dict: Dict[str, np.ndarray],
                       first_block_plain: bool = True) -> Dict:
    """Convert a DISK torch state dict to this net's params, ORDER-BASED.

    The published checkpoint stores tensors in module registration
    order: for each thin block (down 0..4, then up 0..3) a PReLU slope
    (except a plain first block), then the conv kernel (out, in, 5, 5)
    and bias. Instance norms are affine-free (no tensors). Keys are
    ignored beyond ordering, so `unet.path_down.0...` (official),
    `extractor.unet...` or any mirror naming all convert; a wrong
    topology fails loudly on count/shape.
    """
    tensors: List[np.ndarray] = [
        np.asarray(v) for k, v in state_dict.items()]
    it = iter(tensors)

    def take_block(ch_out: int, plain: bool) -> Dict:
        p: Dict[str, np.ndarray] = {}
        t = next(it)
        if not plain:
            if t.ndim != 1 or t.size != 1:
                raise ValueError(
                    f"expected PReLU slope, got shape {t.shape}")
            p["prelu"] = jnp.asarray(t.reshape(1), jnp.float32)
            t = next(it)
        if t.ndim != 4:
            raise ValueError(f"expected conv kernel, got shape {t.shape}")
        if t.shape[0] != ch_out:
            raise ValueError(
                f"conv out {t.shape[0]} != expected {ch_out}")
        # torch OIHW -> flax HWIO
        kern = jnp.asarray(np.transpose(t, (2, 3, 1, 0)), jnp.float32)
        bias = next(it)
        if bias.shape != (ch_out,):
            raise ValueError(f"bad bias shape {bias.shape}")
        p["conv"] = {"kernel": kern,
                     "bias": jnp.asarray(bias, jnp.float32)}
        return p

    params: Dict[str, Dict] = {}
    for i, ch in enumerate(DOWN):
        params[f"down_{i}"] = take_block(
            ch, plain=(i == 0 and first_block_plain))
    for i, ch in enumerate(UP):
        params[f"up_{i}"] = take_block(ch, plain=False)
    leftover = sum(1 for _ in it)
    if leftover:
        raise ValueError(f"{leftover} unconsumed tensors — topology "
                         "mismatch")
    return {"params": params}


def convert_torch_checkpoint(path_in, path_out=None) -> Dict:
    """CLI helper: torch .pth -> converted npz in the weights dir."""
    import torch
    from pathlib import Path
    from tpu3drec.models import WEIGHTS_DIR
    sd = torch.load(path_in, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "extractor" in sd:   # official save format
        sd = sd["extractor"]
    params = load_torch_weights(
        {k: v.numpy() for k, v in sd.items()})
    out = path_out or (WEIGHTS_DIR / "disk.npz")
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    np.savez(out, params=np.asarray(
        jax.tree.map(np.asarray, params["params"]), dtype=object))
    return params


def detect_disk_features(img, max_features: int = 2048, **_unused) -> Features:
    from tpu3drec.models import WEIGHTS_DIR, weights_available
    if not weights_available("disk"):
        raise ImportError(f"disk weights not available ({WEIGHTS_DIR}/disk.npz)")
    data = np.load(WEIGHTS_DIR / "disk.npz", allow_pickle=True)
    dk = DISK(max_features=max_features)
    dk.params = {"params": jax.tree.map(jnp.asarray,
                                        data["params"].item())}
    return dk.extract(jnp.asarray(img))
