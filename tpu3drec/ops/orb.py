"""ORB: FAST pyramid + Harris ranking + intensity-centroid orientation +
steered BRIEF binary descriptors.

TPU-native replacement for cv2.ORB_create (reference
traditional_detectors.py:54-91). Notes vs OpenCV:

- TWO sampling patterns (`pattern=` of detect_orb_features):
  * "brief" (default): 256 pairs from the isotropic Gaussian sampling of
    the original BRIEF paper (seeded, fixed at import) — self-consistent
    within this framework;
  * "opencv": OpenCV's learned bit pattern (ops/_orb_pattern_cv.py) with
    the matching sigma-2 smoothing, so descriptors INTEROPERATE with
    reference-produced cv2 ORB pickles (VERDICT r2 #8) —
    `unpack_cv2_orb` converts cv2's packed 32-byte rows into this
    framework's +-1 layout for cross-framework Hamming matching;
- descriptors are stored as +-1 float so Hamming distance runs on the MXU
  as a matmul (core_data_structures rebuild, see ops/match.py).

Pipeline per level (static python loop over the scale pyramid):
FAST-9 -> 3x3 NMS -> Harris re-ranking of survivors -> per-level top-K ->
orientation via 31x31 intensity-centroid convs -> rotated pair sampling.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tpu3drec.core.types import Features, DescriptorKind
from tpu3drec.ops.fast import fast_score_map
from tpu3drec.ops.harris import harris_response, nms_2d, select_top_k
from tpu3drec.ops.image import gaussian_blur

DESC_BITS = 256
PATCH_R = 15  # orientation / descriptor patch radius (cv2: 31x31 patch)

# Fixed BRIEF sampling pattern: pairs ~ N(0, (PATCH_R/2)^2), seeded.
_rng = np.random.default_rng(20120916)  # fixed: pattern is part of the format
_PAIRS = np.clip(_rng.normal(0.0, PATCH_R / 2.0, size=(DESC_BITS, 4)),
                 -PATCH_R, PATCH_R).astype(np.float32)
BRIEF_PAIRS = _PAIRS  # (256, 4) = x1, y1, x2, y2; numpy on purpose
# (module-level jnp constants leak tracers if the module is first
# imported inside a jit trace — see ops/five_point.py:60)


def _pattern_table(pattern: str) -> np.ndarray:
    if pattern == "opencv":
        from tpu3drec.ops._orb_pattern_cv import BIT_PATTERN_31
        return BIT_PATTERN_31
    return BRIEF_PAIRS


def unpack_cv2_orb(desc_u8: np.ndarray) -> np.ndarray:
    """cv2 ORB descriptors (N, 32) uint8 -> this framework's (N, 256)
    +-1 float layout (bit k = byte k//8, bit k%8; set bit -> +1, the
    `I(p1) < I(p2)` convention both sides share). Enables matching
    reference-produced ORB pickles against pattern="opencv" features."""
    d = np.asarray(desc_u8, np.uint8)
    bits = np.unpackbits(d, axis=1, bitorder="little")  # (N, 256)
    return (bits.astype(np.float32) * 2.0 - 1.0)


def _centroid_kernels() -> Tuple[jnp.ndarray, jnp.ndarray]:
    """31x31 circular-masked x- and y-moment kernels."""
    r = PATCH_R
    ys, xs = np.mgrid[-r:r + 1, -r:r + 1]
    mask = (xs ** 2 + ys ** 2) <= r * r
    kx = (xs * mask).astype(np.float32)
    ky = (ys * mask).astype(np.float32)
    return jnp.asarray(kx), jnp.asarray(ky)


_KX, _KY = _centroid_kernels()


def _moment_maps(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """m10, m01 maps via one 2-channel 31x31 convolution."""
    x = img[None, None]
    w = jnp.stack([_KX, _KY])[:, None]  # (2, 1, 31, 31)
    y = lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                 dimension_numbers=("NCHW", "OIHW", "NCHW"),
                                 precision=lax.Precision.HIGHEST)
    return y[0, 0], y[0, 1]


def _describe(img: jnp.ndarray, xy: jnp.ndarray, angle: jnp.ndarray,
              pairs: np.ndarray = BRIEF_PAIRS) -> jnp.ndarray:
    """Steered BRIEF: (K, 256) +-1 floats."""
    from tpu3drec.ops.sift import _bilinear_many
    ca, sa = jnp.cos(angle), jnp.sin(angle)  # (K,)
    x1, y1, x2, y2 = (pairs[:, 0], pairs[:, 1], pairs[:, 2], pairs[:, 3])

    def rot(px, py):
        rx = ca[:, None] * px[None] - sa[:, None] * py[None]
        ry = sa[:, None] * px[None] + ca[:, None] * py[None]
        return xy[:, 0:1] + rx, xy[:, 1:2] + ry

    ax, ay = rot(x1, y1)
    bx, by = rot(x2, y2)
    va = _bilinear_many(img, ax, ay)
    vb = _bilinear_many(img, bx, by)
    return jnp.where(va < vb, 1.0, -1.0)


@functools.partial(jax.jit, static_argnames=("max_features", "n_levels",
                                             "scale_factor_x1000",
                                             "pattern"))
def _orb_impl(img: jnp.ndarray, max_features: int, n_levels: int,
              scale_factor_x1000: int, fast_threshold: float,
              harris_k: float, pattern: str = "brief"):
    pairs = _pattern_table(pattern)
    # cv2 smooths with a 7x7 sigma-2 Gaussian before sampling; match it
    # on the interop pattern so comparisons see the same measurements
    desc_sigma = 2.0 if pattern == "opencv" else 1.0
    scale_factor = scale_factor_x1000 / 1000.0
    h0, w0 = img.shape
    parts = []
    # per-level budget ~ proportional to area (cv2's allocation)
    areas = [1.0 / (scale_factor ** (2 * l)) for l in range(n_levels)]
    total_area = sum(areas)
    for level in range(n_levels):
        s = scale_factor ** level
        h, w = max(int(round(h0 / s)), 16), max(int(round(w0 / s)), 16)
        im = img if level == 0 else jax.image.resize(img, (h, w), "linear")
        blur = gaussian_blur(im, desc_sigma)  # descriptor sampling image
        score = fast_score_map(im, fast_threshold)
        peaks = nms_2d(score, 1) & (score > 0)
        # Harris re-ranking of FAST survivors (cv2 HARRIS_SCORE)
        harris = harris_response(im, block_size=7, k=harris_k)
        rank = jnp.where(peaks, harris, -jnp.inf)
        k_level = max(int(max_features * areas[level] / total_area), 32)
        k_level = min(k_level, h * w)
        xy, resp, mask = select_top_k(rank, peaks, k_level)
        # orientation by intensity centroid
        m10, m01 = _moment_maps(blur)
        xi = jnp.clip(xy[:, 0].astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(xy[:, 1].astype(jnp.int32), 0, h - 1)
        angle = jnp.arctan2(m01[yi, xi], m10[yi, xi])
        desc = _describe(blur, xy, angle, pairs)
        parts.append(dict(
            xy=xy * s,
            response=jnp.where(mask, resp, -jnp.inf),
            scale=jnp.full((k_level,), 31.0 * s, jnp.float32),
            angle=angle,
            desc=desc,
            mask=mask,
        ))
    merged = {k: jnp.concatenate([p[k] for p in parts]) for k in parts[0]}
    score_all = jnp.where(merged["mask"], merged["response"], -jnp.inf)
    # per-level budgets can sum below max_features (int truncation, tiny
    # images) — clamp the top_k and pad back to the static capacity
    k_top = min(max_features, score_all.shape[0])
    _, order = lax.top_k(score_all, k_top)
    out = {k: v[order] for k, v in merged.items()}
    out["mask"] = out["mask"] & (score_all[order] > -jnp.inf)
    if k_top < max_features:
        pad = max_features - k_top
        out = {k: jnp.concatenate(
            [v, jnp.zeros((pad,) + v.shape[1:], v.dtype)])
            for k, v in out.items()}
    out["response"] = jnp.where(out["mask"], out["response"], 0.0)
    return (out["xy"], out["response"], out["scale"], out["angle"],
            out["desc"], out["mask"])


def detect_orb_features(img: jnp.ndarray, max_features: int = 2048,
                        n_levels: int = 8, scale_factor: float = 1.2,
                        fast_threshold: float = 20.0 / 255.0,
                        harris_k: float = 0.04,
                        pattern: str = "brief",
                        method: str = "ORB", **_unused) -> Features:
    """Detector contract: cv2.ORB defaults (n_levels=8, scale=1.2,
    fast_threshold=20 -> 0.078 in [0,1] units). pattern="opencv" uses
    OpenCV's learned bit pattern for cross-framework descriptor
    interop (see module docstring)."""
    if fast_threshold > 1.0:  # accept cv2-style 0-255 thresholds
        fast_threshold = fast_threshold / 255.0
    xy, resp, scale, angle, desc, mask = _orb_impl(
        img, max_features, n_levels, int(round(scale_factor * 1000)),
        fast_threshold, harris_k, pattern=pattern)
    return Features(xy=xy, response=resp, scale=scale, angle=angle,
                    desc=desc, mask=mask, method=method,
                    desc_kind=DescriptorKind.BINARY.value,
                    image_shape=tuple(img.shape))
