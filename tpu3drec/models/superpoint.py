"""SuperPoint in Flax: VGG encoder + detector/descriptor heads, batched
TPU inference under jit.

TPU-native replacement for the reference's torch SuperPoint wrapper
(deep_learning_detectors.py:28-148, which loads LightGlue's extractor and
runs `.extract` on a 1x1xHxW tensor). Architecture follows the original
MagicPoint/SuperPoint design: shared VGG-style encoder (64-64-64-64-128-
128-128-128 with 3 maxpools), a 65-channel detector head (8x8 cell
softmax with dustbin, depth-to-space), and a 256-d descriptor head
(bilinear upsample + L2 norm).

Pretrained weights cannot be downloaded here (zero egress);
`load_torch_weights` converts the published checkpoint's state dict when
one is present on disk (models/__init__.WEIGHTS_DIR), and
`weights_available('superpoint')` gates the detector registration
(config hardware adjust, core/config.py).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tpu3drec.core.types import Features, DescriptorKind


class SuperPointNet(nn.Module):
    """Encoder + detector/descriptor heads (original SuperPoint layout).

    ``dtype`` is the ACTIVATION/compute dtype (params always stored
    f32): bfloat16 halves the activation working set, which is what
    gates the TPU batch size (batch 48 at f32 activations collapsed
    under HBM pressure, CLAUDE.md). Heads still emit f32 (softmax and
    descriptor normalization run in f32 either way).
    """

    desc_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (B, H, W, 1) float in [0,1] -> (scores (B,H,W),
        desc (B, H/8, W/8, 256) L2-normalized)."""
        x = x.astype(self.dtype)

        def conv(x, ch, name):
            x = nn.Conv(ch, (3, 3), padding="SAME", name=name,
                        dtype=self.dtype)(x)
            return nn.relu(x)

        x = conv(x, 64, "conv1a")
        x = conv(x, 64, "conv1b")
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = conv(x, 64, "conv2a")
        x = conv(x, 64, "conv2b")
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = conv(x, 128, "conv3a")
        x = conv(x, 128, "conv3b")
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = conv(x, 128, "conv4a")
        x = conv(x, 128, "conv4b")

        # detector head: 65 = 8*8 + dustbin
        cpa = nn.relu(nn.Conv(256, (3, 3), padding="SAME", name="convPa",
                              dtype=self.dtype)(x))
        semi = nn.Conv(65, (1, 1), name="convPb",
                       dtype=self.dtype)(cpa)  # (B, H/8, W/8, 65)
        prob = jax.nn.softmax(semi.astype(jnp.float32), axis=-1)[..., :64]
        b, hc, wc, _ = prob.shape
        heat = prob.reshape(b, hc, wc, 8, 8)
        heat = heat.transpose(0, 1, 3, 2, 4).reshape(b, hc * 8, wc * 8)

        # descriptor head
        cda = nn.relu(nn.Conv(256, (3, 3), padding="SAME", name="convDa",
                              dtype=self.dtype)(x))
        desc = nn.Conv(self.desc_dim, (1, 1), name="convDb",
                       dtype=self.dtype)(cda).astype(jnp.float32)
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
        return heat, desc


def _simple_nms(scores: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Keep local maxima within (2r+1)^2 windows (SuperPoint's simple_nms)."""
    from jax import lax
    win = 2 * radius + 1
    pooled = lax.reduce_window(scores, -jnp.inf, lax.max,
                               (1, win, win), (1, 1, 1), "SAME")
    return jnp.where(scores >= pooled, scores, 0.0)


class SuperPoint:
    """Inference wrapper with padded top-K keypoint extraction."""

    def __init__(self, params: Optional[Dict] = None,
                 max_features: int = 2048,
                 keypoint_threshold: float = 0.005,
                 nms_radius: int = 4,
                 matmul_precision: str = "default",
                 activation_dtype: str = "float32"):
        # activation_dtype="bfloat16" halves the activation working set
        # (params stay f32) — the knob that clears the TPU batch-48 HBM
        # cliff (VERDICT r4 #7). Default f32: parity tests compare
        # against the torch mirrors. Construction-time only, like
        # matmul_precision.
        self.net = SuperPointNet(dtype=jnp.dtype(activation_dtype))
        self.params = params
        self.max_features = max_features
        self.keypoint_threshold = keypoint_threshold
        self.nms_radius = nms_radius
        # Deep inference runs the convs at the backend's NATIVE matmul
        # precision (bf16 MXU passes on TPU: 1 pass vs 6 — measured 2.0x
        # end-to-end, 68.2 -> 137.1 pairs/s, bench.py r4), overriding the
        # package-wide precision=highest guard that exists for f32
        # GEOMETRY. Pass "highest" to restore full-f32 passes.
        # NB: _forward is jitted with static self (identity-hashed), so
        # matmul_precision is BAKED IN at first call — set it at
        # construction, never mutate it afterwards; it also shadows any
        # outer jax.default_matmul_precision context (ADVICE r4 #4).
        self.matmul_precision = matmul_precision

    def init_random(self, image_shape: Tuple[int, int],
                    seed: int = 0) -> Dict:
        x = jnp.zeros((1,) + tuple(image_shape) + (1,), jnp.float32)
        self.params = self.net.init(jax.random.PRNGKey(seed), x)
        return self.params

    @functools.partial(jax.jit, static_argnames=("self",))
    def _forward(self, params, images):
        with jax.default_matmul_precision(self.matmul_precision):
            heat, desc = self.net.apply(params, images)
        heat = _simple_nms(heat, self.nms_radius)
        return heat, desc

    def extract(self, image: jnp.ndarray) -> Features:
        """(H, W) float [0,1] -> Features (padded to max_features)."""
        if self.params is None:
            raise RuntimeError(
                "SuperPoint weights not loaded; call init_random() for "
                "testing or convert a checkpoint with load_torch_weights()")
        h, w = image.shape
        # pad to multiples of 8
        ph, pw = (-h) % 8, (-w) % 8
        x = jnp.pad(image, ((0, ph), (0, pw)))[None, :, :, None]
        heat, desc = self._forward(self.params, x)
        heat = heat[0, :h, :w]
        scores, idx = jax.lax.top_k(heat.reshape(-1), self.max_features)
        ys = (idx // w).astype(jnp.float32)
        xs = (idx % w).astype(jnp.float32)
        mask = scores > self.keypoint_threshold
        # bilinear descriptor sampling at keypoints from the (H/8, W/8) map
        dh, dw = desc.shape[1], desc.shape[2]
        gx = jnp.clip(xs / 8.0 - 0.5, 0, dw - 1.001)
        gy = jnp.clip(ys / 8.0 - 0.5, 0, dh - 1.001)
        x0 = jnp.floor(gx).astype(jnp.int32)
        y0 = jnp.floor(gy).astype(jnp.int32)
        fx = (gx - x0)[:, None]
        fy = (gy - y0)[:, None]
        d = desc[0]
        v = ((1 - fy) * (1 - fx) * d[y0, x0]
             + (1 - fy) * fx * d[y0, jnp.minimum(x0 + 1, dw - 1)]
             + fy * (1 - fx) * d[jnp.minimum(y0 + 1, dh - 1), x0]
             + fy * fx * d[jnp.minimum(y0 + 1, dh - 1),
                           jnp.minimum(x0 + 1, dw - 1)])
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
        return Features(
            xy=jnp.stack([xs, ys], axis=1),
            response=jnp.where(mask, scores, 0.0),
            scale=jnp.full((self.max_features,), 8.0, jnp.float32),
            angle=jnp.zeros((self.max_features,), jnp.float32),
            desc=v * mask[:, None],
            mask=mask,
            method="SuperPoint",
            desc_kind=DescriptorKind.FLOAT.value,
            image_shape=(h, w),
        )


# -- torch checkpoint conversion ---------------------------------------

_TORCH_TO_FLAX = {
    # torch name -> flax module name (original SuperPoint checkpoint names)
    "conv1a": "conv1a", "conv1b": "conv1b",
    "conv2a": "conv2a", "conv2b": "conv2b",
    "conv3a": "conv3a", "conv3b": "conv3b",
    "conv4a": "conv4a", "conv4b": "conv4b",
    "convPa": "convPa", "convPb": "convPb",
    "convDa": "convDa", "convDb": "convDb",
}


def load_torch_weights(state_dict: Dict[str, Any]) -> Dict:
    """Convert a torch SuperPoint state dict (OIHW) to flax params (HWIO)."""
    params: Dict[str, Dict] = {}
    for tname, fname in _TORCH_TO_FLAX.items():
        wkey = f"{tname}.weight"
        bkey = f"{tname}.bias"
        if wkey not in state_dict:
            raise KeyError(f"missing {wkey} in checkpoint")
        w = np.asarray(state_dict[wkey])          # (O, I, kh, kw)
        params[fname] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),  # HWIO
            "bias": jnp.asarray(np.asarray(state_dict[bkey])),
        }
    return {"params": params}


def convert_torch_checkpoint(path_in, path_out=None) -> Dict:
    """CLI helper: torch superpoint_v1.pth -> superpoint.npz in the
    weights dir (the converter-fleet counterpart of disk/aliked/lightglue;
    reference downloads this checkpoint at runtime,
    deep_learning_detectors.py:82)."""
    import torch
    from pathlib import Path
    from tpu3drec.models import WEIGHTS_DIR
    sd = torch.load(path_in, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    params = load_torch_weights({k: np.asarray(v) for k, v in sd.items()})
    out = path_out or (WEIGHTS_DIR / "superpoint.npz")
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    np.savez(out, params=np.asarray(
        jax.tree.map(np.asarray, params), dtype=object))
    return params


def detect_superpoint_features(img, max_features: int = 2048,
                               keypoint_threshold: float = 0.005,
                               nms_radius: int = 4, **_unused) -> Features:
    """Detector-contract entry; requires converted weights on disk."""
    from tpu3drec.models import WEIGHTS_DIR, weights_available
    if not weights_available("superpoint"):
        raise ImportError("superpoint weights not available "
                          f"(expected {WEIGHTS_DIR}/superpoint.npz)")
    data = np.load(WEIGHTS_DIR / "superpoint.npz", allow_pickle=True)
    sp = SuperPoint(max_features=max_features,
                    keypoint_threshold=keypoint_threshold,
                    nms_radius=nms_radius)
    sp.params = jax.tree.map(jnp.asarray, data["params"].item())
    return sp.extract(jnp.asarray(img))
