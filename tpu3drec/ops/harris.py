"""Harris / Shi-Tomasi corner detection: structure tensor + NMS + top-K.

TPU-native replacement for cv2.goodFeaturesToTrack / cornerHarris
(reference: traditional_detectors.py:166-287). The whole detector is three
fused elementwise/conv passes plus one top-k — ideal VPU work:

  1. gradients (Sobel), products Ixx/Iyy/Ixy
  2. windowed sums (separable box/gaussian filter) -> structure tensor M
  3. response: Harris  R = det(M) - k trace(M)^2
              Shi-Tomasi R = lambda_min(M)
  4. 3x3 (or (2r+1)^2) max-pool NMS + quality-level gate + top-K

Returns fixed-capacity Features with a validity mask (no dynamic shapes).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from tpu3drec.core.types import Features, DescriptorKind
from tpu3drec.ops.image import sobel_gradients, box_filter, gaussian_blur


def structure_tensor(img: jnp.ndarray, block_size: int = 3
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    dx, dy = sobel_gradients(img)
    sxx = box_filter(dx * dx, block_size)
    syy = box_filter(dy * dy, block_size)
    sxy = box_filter(dx * dy, block_size)
    return sxx, syy, sxy


def harris_response(img: jnp.ndarray, block_size: int = 3,
                    k: float = 0.04) -> jnp.ndarray:
    sxx, syy, sxy = structure_tensor(img, block_size)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - k * tr * tr


def shi_tomasi_response(img: jnp.ndarray, block_size: int = 3) -> jnp.ndarray:
    """Min eigenvalue of the 2x2 structure tensor (cv2 goodFeaturesToTrack)."""
    sxx, syy, sxy = structure_tensor(img, block_size)
    half_tr = 0.5 * (sxx + syy)
    disc = jnp.sqrt(jnp.maximum(
        0.25 * (sxx - syy) ** 2 + sxy * sxy, 0.0))
    return half_tr - disc


def nms_2d(response: jnp.ndarray, radius: int = 1) -> jnp.ndarray:
    """True where response is the strict max of its (2r+1)^2 neighbourhood."""
    win = 2 * radius + 1
    pooled = lax.reduce_window(response, -jnp.inf, lax.max,
                               (win, win), (1, 1), "SAME")
    return response >= pooled


def select_top_k(response: jnp.ndarray, valid: jnp.ndarray, k: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-k peak locations: returns xy (k,2) f32, resp (k,), mask (k,)."""
    h, w = response.shape
    flat = jnp.where(valid, response, -jnp.inf).reshape(-1)
    vals, idx = lax.top_k(flat, k)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    mask = vals > -jnp.inf
    return jnp.stack([xs, ys], axis=1), jnp.where(mask, vals, 0.0), mask


@functools.partial(jax.jit,
                   static_argnames=("max_features", "block_size", "use_harris",
                                    "min_distance"))
def detect_corners(img: jnp.ndarray, max_features: int = 1000,
                   quality_level: float = 0.01, block_size: int = 3,
                   min_distance: int = 10, use_harris: bool = False,
                   k: float = 0.04):
    """goodFeaturesToTrack equivalent. Returns (xy, response, mask).

    quality_level gates peaks at quality_level * max(response), exactly like
    cv2.goodFeaturesToTrack; min_distance is enforced by NMS radius (an
    approximation of cv2's greedy distance suppression that keeps shapes
    static; parity tests check overlap, not identical sets).
    """
    resp = harris_response(img, block_size, k) if use_harris \
        else shi_tomasi_response(img, block_size)
    radius = max(1, int(min_distance) // 2)
    peaks = nms_2d(resp, radius)
    gate = resp >= quality_level * jnp.max(resp)
    # kill the border where gradients are invalid
    h, w = resp.shape
    yy = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    b = block_size
    interior = (yy >= b) & (yy < h - b) & (xx >= b) & (xx < w - b)
    return select_top_k(resp, peaks & gate & interior, max_features)


def detect_harris_features(img: jnp.ndarray, max_features: int = 1000,
                           quality_level: float = 0.01, block_size: int = 3,
                           min_distance: int = 10, use_harris: bool = True,
                           k: float = 0.04, desc_dim: int = 128,
                           method: str = "Harris") -> Features:
    """Full detector contract: corners + SIFT-style descriptors.

    The reference pairs Harris/GFTT corners with SIFT descriptors computed at
    the corner locations (traditional_detectors.py:166-287); we do the same
    via the shared descriptor op (imported lazily to avoid a cycle).
    """
    xy, resp, mask = detect_corners(img, max_features, quality_level,
                                    block_size, min_distance, use_harris, k)
    from tpu3drec.ops.sift import describe_at_points
    desc, angle = describe_at_points(img, xy, mask)
    return Features(
        xy=xy, response=resp,
        scale=jnp.full((max_features,), float(block_size * 2), jnp.float32),
        angle=angle, desc=desc, mask=mask,
        method=method, desc_kind=DescriptorKind.FLOAT.value,
        image_shape=tuple(img.shape),
    )
