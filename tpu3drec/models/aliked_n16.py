"""ALIKED-n16 in Flax/XLA, weight-compatible with the published
checkpoints (Zhao et al. 2023, "ALIKED: A Lighter Keypoint and
Descriptor Extraction Network via Deformable Transformation").

TPU-native implementation of the REAL architecture (reference runs it
through torch, deep_learning_detectors.py:227-307) — unlike
`models/aliked.py` (a TPU-friendly approximation used at random init),
this module converts checkpoints. The deformable parts are TPU-viable
at inference: the backbone's deformable convs run at 1/8 and 1/32
resolution (tens of thousands of bilinear samples — linearized-gather
regime, CLAUDE.md), and the SDDH descriptor head is SPARSE (M=16
samples per keypoint).

Architecture (aliked-n16 config: c1..c4 = 16/32/64/128, dim=128, K=3,
M=16):
  block1   ConvBlock(3->c1): [conv3x3 -> BN -> SELU] x2, full res
  block2   ResBlock(c1->c2, conv) after avg-pool 2      (1/2)
  block3   ResBlock(c2->c3, DEFORMABLE) after avg-pool 4 (1/8)
  block4   ResBlock(c3->c4, DEFORMABLE) after avg-pool 4 (1/32)
  aggregation: per-level 1x1 conv (no bias) -> SELU -> bilinear
    upsample (align_corners=True) to full res -> concat = dim channels
  score head (SMH): 1x1(dim->8) -> SELU -> 3x3(8->4) -> SELU ->
    3x3(4->4) -> SELU -> 3x3(4->1) -> sigmoid
  feature map: L2-normalized aggregation
  DKD: 5x5 NMS + top-K + softargmax sub-pixel over a radius-2 window
  SDDH: per keypoint, a KxK feature patch predicts M (x, y) offsets
    (conv KxK valid -> SELU -> 1x1); M bilinear samples of the feature
    map at kp+offset; 1x1 feature transform (no bias); aggregation
    descriptor d = sum_m W_m @ f_m with learned (M, dim, dim) weights;
    L2 normalize.

Documented ASSUMPTIONS where the official code could differ (the
order-based converter and the torch mirror in
tests/test_aliked_n16_parity.py pin them down; a real checkpoint that
violates one fails LOUDLY on tensor order/shape, not silently):
  A1 deformable conv = torchvision.ops.deform_conv2d semantics
     (per-tap learned (dy, dx) offsets, zero padding, bilinear);
     each deformable layer owns a regular 3x3 offset-predictor conv.
  A2 ResBlock downsample is a bare 1x1 conv (no norm).
  A3 per-level 1x1 aggregation convs and score-head convs carry no
     bias except the final 3x3(4->1), which does.
  A4 SDDH offsets reshape to (M, 2) as (x, y) pairs; sampling uses
     pixel coordinates.
  A5 BatchNorms are standard eps=1e-5 with running stats (inference).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu3drec.core.types import Features, DescriptorKind

CFG_N16 = dict(c1=16, c2=32, c3=64, c4=128, dim=128, K=3, M=16)
_BN_EPS = 1e-5
_TAPS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


# ---------------------------------------------------------------------
# functional building blocks (params are plain dict trees so the
# order-based converter stays transparent)
# ---------------------------------------------------------------------

def _conv(x: jnp.ndarray, p: Dict, stride: int = 1,
          padding: str = "SAME") -> jnp.ndarray:
    """x (H, W, Cin) -> (H', W', Cout); p: kernel (kh, kw, Cin, Cout)
    [+ bias]."""
    y = jax.lax.conv_general_dilated(
        x[None], p["kernel"], (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)[0]
    if "bias" in p:
        y = y + p["bias"]
    return y


def _bn(x: jnp.ndarray, p: Dict) -> jnp.ndarray:
    inv = 1.0 / jnp.sqrt(p["var"] + _BN_EPS)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def _selu(x):
    return jax.nn.selu(x)


def _bilinear_map(img: jnp.ndarray, px: jnp.ndarray,
                  py: jnp.ndarray) -> jnp.ndarray:
    """Zero-padded bilinear sampling of img (H, W, C) at float coords
    px/py (...,) -> (..., C). Linearized takes (CLAUDE.md gather rule)."""
    h, w, c = img.shape
    flat = img.reshape(h * w, c)
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = px - x0
    fy = py - y0
    out = 0.0
    for dy, wy in ((0, 1.0 - fy), (1, fy)):
        for dx, wx in ((0, 1.0 - fx), (1, fx)):
            xi = x0.astype(jnp.int32) + dx
            yi = y0.astype(jnp.int32) + dy
            ok = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
            lin = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
            v = jnp.take(flat, lin.reshape(-1), axis=0) \
                .reshape(lin.shape + (c,))
            out = out + v * (wy * wx * ok.astype(img.dtype))[..., None]
    return out


def _deform_conv3x3(x: jnp.ndarray, p: Dict) -> jnp.ndarray:
    """Deformable 3x3 conv (A1): p = {offset_conv: {kernel, bias},
    kernel (3, 3, Cin, Cout) [+ bias]}. x (H, W, Cin) -> (H, W, Cout)."""
    h, w, cin = x.shape
    offs = _conv(x, p["offset_conv"])            # (H, W, 18): (dy, dx)*9
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    kern = p["kernel"]                           # (3, 3, Cin, Cout)
    acc = 0.0
    for k, (dy, dx) in enumerate(_TAPS):
        py = yy + dy + offs[..., 2 * k]
        px = xx + dx + offs[..., 2 * k + 1]
        v = _bilinear_map(x, px, py)             # (H, W, Cin)
        acc = acc + jnp.einsum(
            "hwc,cd->hwd", v, kern[1 + dy, 1 + dx],
            precision=jax.lax.Precision.HIGHEST)
    if "bias" in p:
        acc = acc + p["bias"]
    return acc


def _conv_block(x, p):
    x = _selu(_bn(_conv(x, p["conv1"]), p["bn1"]))
    return _selu(_bn(_conv(x, p["conv2"]), p["bn2"]))


def _res_block(x, p, deform: bool):
    cv = _deform_conv3x3 if deform else _conv
    y = _selu(_bn(cv(x, p["conv1"]), p["bn1"]))
    y = _bn(cv(y, p["conv2"]), p["bn2"])
    skip = _conv(x, p["downsample"])             # bare 1x1 (A2)
    return _selu(y + skip)


def _avg_pool(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (k, k, 1), (k, k, 1), "VALID") / (k * k)


def _upsample_ac(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear upsample with align_corners=True (torch nn.Upsample):
    separable interpolation matrices -> two MXU matmuls."""
    h, w, c = x.shape

    def interp_matrix(n_in, n_out):
        if n_in == 1:
            return np.ones((n_out, 1), np.float32)
        src = np.linspace(0.0, n_in - 1.0, n_out)
        i0 = np.clip(np.floor(src).astype(int), 0, n_in - 2)
        f = (src - i0).astype(np.float32)
        m = np.zeros((n_out, n_in), np.float32)
        m[np.arange(n_out), i0] = 1.0 - f
        m[np.arange(n_out), i0 + 1] += f
        return m

    mh = jnp.asarray(interp_matrix(h, out_h))
    mw = jnp.asarray(interp_matrix(w, out_w))
    y = jnp.einsum("oh,hwc->owc", mh, x,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("pw,owc->opc", mw, y,
                      precision=jax.lax.Precision.HIGHEST)


def forward_dense(params: Dict, image: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """image (H, W, 3) f32 [0,1], H % 32 == W % 32 == 0.
    Returns (score_map (H, W) in [0,1], feature_map (H, W, dim) L2)."""
    h, w, _ = image.shape
    x1 = _conv_block(image, params["block1"])                 # H
    x2 = _res_block(_avg_pool(x1, 2), params["block2"], False)  # H/2
    x3 = _res_block(_avg_pool(x2, 4), params["block3"], True)   # H/8
    x4 = _res_block(_avg_pool(x3, 4), params["block4"], True)   # H/32
    a1 = _selu(_conv(x1, params["conv1"]))
    a2 = _selu(_conv(x2, params["conv2"]))
    a3 = _selu(_conv(x3, params["conv3"]))
    a4 = _selu(_conv(x4, params["conv4"]))
    cat = jnp.concatenate([
        a1, _upsample_ac(a2, h, w), _upsample_ac(a3, h, w),
        _upsample_ac(a4, h, w)], axis=-1)                     # (H, W, dim)
    s = _selu(_conv(cat, params["score1"]))
    s = _selu(_conv(s, params["score2"]))
    s = _selu(_conv(s, params["score3"]))
    s = _conv(s, params["score4"])[..., 0]
    score = jax.nn.sigmoid(s)
    feat = cat / jnp.maximum(
        jnp.linalg.norm(cat, axis=-1, keepdims=True), 1e-12)
    return score, feat


def sddh_descriptors(params: Dict, feat: jnp.ndarray,
                     xy: jnp.ndarray, K: int = 3,
                     M: int = 16) -> jnp.ndarray:
    """Sparse deformable descriptor head: feat (H, W, dim) L2-normalized,
    xy (N, 2) pixel keypoints -> (N, dim) unit descriptors."""
    h, w, dim = feat.shape
    r = K // 2
    # KxK patches at rounded keypoint positions (one fused linear gather)
    xi = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), r, w - 1 - r)
    yi = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), r, h - 1 - r)
    offs = [(dy, dx) for dy in range(-r, r + 1) for dx in range(-r, r + 1)]
    lin = jnp.stack([(yi + dy) * w + (xi + dx) for dy, dx in offs],
                    axis=1)                                    # (N, K*K)
    flat = feat.reshape(h * w, dim)
    patches = jnp.take(flat, lin.reshape(-1), axis=0) \
        .reshape(-1, K * K, dim)                               # (N, 9, dim)
    # offset_conv layer 1: KxK valid conv over the patch == one linear
    # layer on the flattened patch; kernel (K, K, dim, 2M)
    k1 = params["off1"]["kernel"].reshape(K * K * dim, -1)
    o = patches.reshape(-1, K * K * dim) @ k1 + params["off1"]["bias"]
    o = _selu(o)
    o = o @ params["off2"]["kernel"].reshape(o.shape[-1], -1) \
        + params["off2"]["bias"]                               # (N, 2M)
    off_xy = o.reshape(-1, M, 2)                               # (x, y) A4
    px = xy[:, None, 0] + off_xy[..., 0]
    py = xy[:, None, 1] + off_xy[..., 1]
    samp = _bilinear_map(feat, px, py)                         # (N, M, dim)
    # sf_conv: 1x1 dim->dim, no bias
    samp = jnp.einsum("nmd,de->nme", samp, params["sf"]["kernel"],
                      precision=jax.lax.Precision.HIGHEST)
    # aggregation: d = sum_m W_m @ f_m ; agg (M, dim, dim)
    desc = jnp.einsum("nmd,mde->ne", samp, params["agg"],
                      precision=jax.lax.Precision.HIGHEST)
    return desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)


# ---------------------------------------------------------------------
# inference wrapper
# ---------------------------------------------------------------------

class ALIKEDN16:
    def __init__(self, params: Optional[Dict] = None,
                 max_features: int = 2048, nms_radius: int = 2,
                 threshold: float = 0.0,
                 matmul_precision: str = "default"):
        self.params = params
        self.max_features = max_features
        self.nms_radius = nms_radius
        self.threshold = threshold
        # backbone convs at native MXU precision (see models/superpoint.py)
        # NB: _forward is jitted with static self (identity-hashed), so
        # matmul_precision is BAKED IN at first call — set it at
        # construction, never mutate it afterwards; it also shadows any
        # outer jax.default_matmul_precision context (ADVICE r4 #4).
        self.matmul_precision = matmul_precision

    def extract(self, image: jnp.ndarray) -> Features:
        from jax import lax
        if self.params is None:
            raise RuntimeError("ALIKED-n16 weights not loaded")
        h, w = image.shape
        ph, pw = (-h) % 32, (-w) % 32
        x = jnp.pad(image, ((0, ph), (0, pw)))[:, :, None]
        x = jnp.repeat(x, 3, axis=-1)
        with jax.default_matmul_precision(self.matmul_precision):
            score, feat = forward_dense(self.params, x)
        score = score[:h, :w]
        win = 2 * self.nms_radius + 1
        pooled = lax.reduce_window(score, -jnp.inf, lax.max,
                                   (win, win), (1, 1), "SAME")
        peaks = jnp.where(score >= pooled, score, -jnp.inf)
        vals, idx = lax.top_k(peaks.reshape(-1), self.max_features)
        ys = (idx // w).astype(jnp.float32)
        xs = (idx % w).astype(jnp.float32)
        mask = vals > self.threshold
        # DKD softargmax sub-pixel over the radius-2 window (temp 0.1)
        r = 2
        flat = score.reshape(-1)
        num_x = jnp.zeros_like(xs)
        num_y = jnp.zeros_like(ys)
        den = jnp.zeros_like(xs)
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                yy = jnp.clip(ys.astype(jnp.int32) + dy, 0, h - 1)
                xx = jnp.clip(xs.astype(jnp.int32) + dx, 0, w - 1)
                sv = jnp.exp(flat[yy * w + xx] / 0.1)
                num_x += sv * dx
                num_y += sv * dy
                den += sv
        sub_x = jnp.clip(num_x / jnp.maximum(den, 1e-12), -r, r)
        sub_y = jnp.clip(num_y / jnp.maximum(den, 1e-12), -r, r)
        xy = jnp.stack([xs + sub_x, ys + sub_y], axis=1)
        desc = sddh_descriptors(self.params["sddh"], feat[:h, :w], xy)
        return Features(
            xy=xy, response=jnp.where(mask, vals, 0.0),
            scale=jnp.full((self.max_features,), 4.0, jnp.float32),
            angle=jnp.zeros((self.max_features,), jnp.float32),
            desc=desc * mask[:, None], mask=mask,
            method="ALIKED", desc_kind=DescriptorKind.FLOAT.value,
            image_shape=(h, w))


# ---------------------------------------------------------------------
# torch checkpoint conversion (order-based, loud failures)
# ---------------------------------------------------------------------

class _Cursor:
    def __init__(self, tensors: List[np.ndarray]):
        self.t = tensors
        self.i = 0

    def take(self, ndim=None, shape=None) -> np.ndarray:
        while self.i < len(self.t) and self.t[self.i].ndim == 0:
            self.i += 1          # skip num_batches_tracked scalars
        if self.i >= len(self.t):
            raise ValueError("state dict exhausted — topology mismatch")
        v = self.t[self.i]
        self.i += 1
        if ndim is not None and v.ndim != ndim:
            raise ValueError(f"tensor {self.i - 1}: ndim {v.ndim} != "
                             f"{ndim} (shape {v.shape})")
        if shape is not None and tuple(v.shape) != tuple(shape):
            raise ValueError(f"tensor {self.i - 1}: shape {v.shape} != "
                             f"{shape}")
        return v

    def done(self):
        while self.i < len(self.t) and self.t[self.i].ndim == 0:
            self.i += 1
        if self.i != len(self.t):
            raise ValueError(f"{len(self.t) - self.i} unconsumed tensors")


def _cv(c: _Cursor, cin: int, cout: int, k: int, bias: bool) -> Dict:
    w = c.take(4, (cout, cin, k, k))
    p = {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)), jnp.float32)}
    if bias:
        p["bias"] = jnp.asarray(c.take(1, (cout,)), jnp.float32)
    return p


def _bnp(c: _Cursor, ch: int) -> Dict:
    return {"scale": jnp.asarray(c.take(1, (ch,)), jnp.float32),
            "bias": jnp.asarray(c.take(1, (ch,)), jnp.float32),
            "mean": jnp.asarray(c.take(1, (ch,)), jnp.float32),
            "var": jnp.asarray(c.take(1, (ch,)), jnp.float32)}


def _dcv(c: _Cursor, cin: int, cout: int) -> Dict:
    """Deformable conv = offset predictor conv3x3(cin->18, bias) then
    the regular 3x3 kernel (A1; registration order of the torch
    DeformableConv2d module)."""
    return {"offset_conv": _cv(c, cin, 18, 3, bias=True),
            **_cv(c, cin, cout, 3, bias=True)}


def load_torch_weights(state_dict: Dict[str, np.ndarray]) -> Dict:
    """ALIKED-n16 torch state dict -> param tree, order-based (keys
    ignored beyond ordering; num_batches_tracked scalars skipped)."""
    cfg = CFG_N16
    c1, c2, c3, c4 = cfg["c1"], cfg["c2"], cfg["c3"], cfg["c4"]
    dim, K, M = cfg["dim"], cfg["K"], cfg["M"]
    c = _Cursor([np.asarray(v) for v in state_dict.values()])
    p: Dict[str, Dict] = {}
    p["block1"] = {"conv1": _cv(c, 3, c1, 3, True), "bn1": _bnp(c, c1),
                   "conv2": _cv(c, c1, c1, 3, True), "bn2": _bnp(c, c1)}
    p["block2"] = {"conv1": _cv(c, c1, c2, 3, True), "bn1": _bnp(c, c2),
                   "conv2": _cv(c, c2, c2, 3, True), "bn2": _bnp(c, c2),
                   "downsample": _cv(c, c1, c2, 1, True)}
    p["block3"] = {"conv1": _dcv(c, c2, c3), "bn1": _bnp(c, c3),
                   "conv2": _dcv(c, c3, c3), "bn2": _bnp(c, c3),
                   "downsample": _cv(c, c2, c3, 1, True)}
    p["block4"] = {"conv1": _dcv(c, c3, c4), "bn1": _bnp(c, c4),
                   "conv2": _dcv(c, c4, c4), "bn2": _bnp(c, c4),
                   "downsample": _cv(c, c3, c4, 1, True)}
    q = dim // 4
    p["conv1"] = _cv(c, c1, q, 1, False)
    p["conv2"] = _cv(c, c2, q, 1, False)
    p["conv3"] = _cv(c, c3, q, 1, False)
    p["conv4"] = _cv(c, c4, q, 1, False)
    p["score1"] = _cv(c, dim, 8, 1, False)
    p["score2"] = _cv(c, 8, 4, 3, False)
    p["score3"] = _cv(c, 4, 4, 3, False)
    p["score4"] = _cv(c, 4, 1, 3, True)
    # NB: torch state_dict emits a module's DIRECT parameters before its
    # submodules — SDDH's agg tensor precedes the offset/sf convs
    p["sddh"] = {"agg": jnp.asarray(c.take(3, (M, dim, dim)),
                                    jnp.float32)}
    p["sddh"]["off1"] = _cv(c, dim, 2 * M, K, True)
    p["sddh"]["off2"] = _cv(c, 2 * M, 2 * M, 1, True)
    p["sddh"]["sf"] = {"kernel": jnp.asarray(
        np.transpose(c.take(4, (dim, dim, 1, 1))[:, :, 0, 0],
                     (1, 0)), jnp.float32)}
    # off1/off2 4-d kernels stay HWIO; sddh_descriptors reshapes them
    c.done()
    return p


def convert_torch_checkpoint(path_in, path_out=None) -> Dict:
    import torch
    from pathlib import Path
    from tpu3drec.models import WEIGHTS_DIR
    sd = torch.load(path_in, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    params = load_torch_weights({k: v.numpy() for k, v in sd.items()})
    out = path_out or (WEIGHTS_DIR / "aliked.npz")
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    np.savez(out, params=np.asarray(jax.tree.map(np.asarray, params),
                                    dtype=object),
             format=np.asarray(["aliked-n16"]))
    return params
