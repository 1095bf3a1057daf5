"""BRISK: multi-scale FAST + concentric-ring binary descriptor.

TPU-native replacement for cv2.BRISK (reference
traditional_detectors.py:129-165). The classic BRISK sampling pattern — 60
points on concentric rings, short-distance pairs thresholded into bits —
is generated programmatically; orientation uses the long-pair gradient
rule from the BRISK paper, vectorized as two masked matmul-shaped
reductions. Descriptors are 512-bit, stored +-1 for MXU Hamming matching.
Bit-compatibility with cv2 is not a goal (different detector stack);
matching quality is asserted functionally in tests.
"""

from __future__ import annotations

import functools
import itertools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tpu3drec.core.types import Features, DescriptorKind
from tpu3drec.ops.fast import fast_score_map
from tpu3drec.ops.harris import nms_2d, select_top_k
from tpu3drec.ops.image import gaussian_blur


def _make_pattern():
    """60-point concentric-ring pattern (BRISK paper layout)."""
    radii = [0.0, 2.9, 4.9, 7.4, 10.8]
    counts = [1, 10, 14, 15, 20]
    pts = []
    for r, c in zip(radii, counts):
        for i in range(c):
            a = 2 * math.pi * i / c
            pts.append((r * math.cos(a), r * math.sin(a)))
    pts = np.asarray(pts, np.float32)  # (60, 2)
    pairs = np.asarray(list(itertools.combinations(range(60), 2)))
    d = np.linalg.norm(pts[pairs[:, 0]] - pts[pairs[:, 1]], axis=1)
    order = np.argsort(d)
    short = pairs[order[:512]]            # descriptor bits
    long_ = pairs[order[-256:]]           # orientation pairs
    return pts, short.astype(np.int32), long_.astype(np.int32)


_PTS, _SHORT, _LONG = _make_pattern()
# numpy on purpose: module-level jnp constants leak tracers when the
# module is first imported inside a jit trace (ops/five_point.py:60)
PATTERN = np.asarray(_PTS)
SHORT_PAIRS = np.asarray(_SHORT)
LONG_PAIRS = np.asarray(_LONG)


def _sample_pattern(img: jnp.ndarray, xy: jnp.ndarray, angle: jnp.ndarray,
                    scale: jnp.ndarray) -> jnp.ndarray:
    """(K, 60) smoothed intensities at the rotated, scaled pattern points."""
    from tpu3drec.ops.sift import _bilinear_many
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    px = PATTERN[:, 0][None] * scale[:, None]
    py = PATTERN[:, 1][None] * scale[:, None]
    rx = ca[:, None] * px - sa[:, None] * py + xy[:, 0:1]
    ry = sa[:, None] * px + ca[:, None] * py + xy[:, 1:2]
    return _bilinear_many(img, rx, ry)


@functools.partial(jax.jit, static_argnames=("max_features", "octaves"))
def _brisk_impl(img: jnp.ndarray, max_features: int, octaves: int,
                threshold: float):
    h0, w0 = img.shape
    parts = []
    for o in range(octaves):
        s = 2.0 ** o
        h, w = max(int(h0 / s), 16), max(int(w0 / s), 16)
        im = img if o == 0 else jax.image.resize(img, (h, w), "linear")
        blur = gaussian_blur(im, 1.2)
        score = fast_score_map(im, threshold)
        peaks = nms_2d(score, 1) & (score > 0)
        k_level = max(max_features // (2 ** o), 64)
        k_level = min(k_level, h * w)
        xy, resp, mask = select_top_k(score, peaks, k_level)

        # orientation from long pairs: mean gradient direction g =
        # sum (I(a)-I(b)) * (a-b)/|a-b|^2  (BRISK paper eq. 3)
        vals0 = _sample_pattern(blur, xy, jnp.zeros(xy.shape[0]),
                                jnp.ones(xy.shape[0]))
        pa = vals0[:, LONG_PAIRS[:, 0]]
        pb = vals0[:, LONG_PAIRS[:, 1]]
        dxy = PATTERN[LONG_PAIRS[:, 0]] - PATTERN[LONG_PAIRS[:, 1]]  # (L, 2)
        norm2 = jnp.maximum(jnp.sum(dxy * dxy, axis=1), 1e-9)
        gw = (pa - pb) / norm2[None]            # (K, L)
        gx = gw @ dxy[:, 0]
        gy = gw @ dxy[:, 1]
        angle = jnp.arctan2(gy, gx)

        vals = _sample_pattern(blur, xy, angle, jnp.ones(xy.shape[0]))
        bits = jnp.where(vals[:, SHORT_PAIRS[:, 0]] <
                         vals[:, SHORT_PAIRS[:, 1]], 1.0, -1.0)
        parts.append(dict(
            xy=xy * s,
            response=jnp.where(mask, resp, -jnp.inf),
            scale=jnp.full((k_level,), 12.0 * s, jnp.float32),
            angle=angle, desc=bits, mask=mask))
    merged = {k: jnp.concatenate([p[k] for p in parts]) for k in parts[0]}
    sc = jnp.where(merged["mask"], merged["response"], -jnp.inf)
    _, order = lax.top_k(sc, max_features)
    out = {k: v[order] for k, v in merged.items()}
    out["mask"] = out["mask"] & (sc[order] > -jnp.inf)
    out["response"] = jnp.where(out["mask"], out["response"], 0.0)
    return (out["xy"], out["response"], out["scale"], out["angle"],
            out["desc"], out["mask"])


def detect_brisk_features(img: jnp.ndarray, max_features: int = 2048,
                          threshold: float = 30.0, octaves: int = 3,
                          pattern_scale: float = 1.0,
                          method: str = "BRISK", **_unused) -> Features:
    """cv2.BRISK defaults: threshold=30 (0-255 units), octaves=3."""
    thr = threshold / 255.0 if threshold > 1.0 else threshold
    xy, resp, scale, angle, desc, mask = _brisk_impl(
        img, max_features, octaves, thr)
    return Features(xy=xy, response=resp, scale=scale * pattern_scale,
                    angle=angle, desc=desc, mask=mask, method=method,
                    desc_kind=DescriptorKind.BINARY.value,
                    image_shape=tuple(img.shape))
