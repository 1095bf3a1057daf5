"""FAST-9/16 corner detection as pure vectorized XLA.

TPU-native replacement for the FAST detector inside cv2.ORB/BRISK
(reference traditional_detectors.py:54-165). The segment test — at least 9
contiguous pixels of the 16-pixel Bresenham circle all brighter/darker than
the center by a threshold — is evaluated for EVERY pixel at once via 16
statically shifted views (jnp.roll) and a circular run-length test done as
16 x 9 boolean ANDs. No branches, no early-exit: the whole image is one
fused VPU pass, which on TPU is faster than any pixel-loop early-exit.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Bresenham circle of radius 3, clockwise from 12 o'clock: (dy, dx)
FAST_CIRCLE = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)


def _circle_stack(img: jnp.ndarray) -> jnp.ndarray:
    """(16, H, W): the circle pixel values around every center."""
    return jnp.stack([jnp.roll(img, (-dy, -dx), axis=(0, 1))
                      for dy, dx in FAST_CIRCLE])


def fast_score_map(img: jnp.ndarray, threshold: float = 0.08,
                   arc: int = 9) -> jnp.ndarray:
    """(H, W) FAST corner response; 0 where the segment test fails.

    threshold is in [0,1] intensity units (cv2's 20/255 ~ 0.078).
    Score = sum of |circle - center| - t over the qualifying arc pixels
    (cv2's score definition, adapted to float images).
    """
    c = _circle_stack(img)  # (16, H, W)
    brighter = c > img[None] + threshold
    darker = c < img[None] - threshold
    # contiguous arc >= `arc` in circular order: OR over all 16 rotations of
    # the AND of `arc` consecutive flags
    def has_arc(flags):
        hits = jnp.zeros(img.shape, bool)
        for s in range(16):
            run = flags[s % 16]
            for k in range(1, arc):
                run = run & flags[(s + k) % 16]
            hits = hits | run
        return hits

    is_corner = has_arc(brighter) | has_arc(darker)
    diff = jnp.abs(c - img[None]) - threshold
    score = jnp.sum(jnp.maximum(diff, 0.0) * (brighter | darker), axis=0)
    # invalidate the 3px border where the circle wraps around
    h, w = img.shape
    yy = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (yy >= 3) & (yy < h - 3) & (xx >= 3) & (xx < w - 3)
    return jnp.where(is_corner & interior, score, 0.0)


def detect_fast(img: jnp.ndarray, max_features: int,
                threshold: float = 0.08, nms_radius: int = 1
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """FAST + NMS + top-K: returns xy (K,2), score (K,), mask (K,)."""
    from tpu3drec.ops.harris import nms_2d, select_top_k
    score = fast_score_map(img, threshold)
    peaks = nms_2d(score, nms_radius) & (score > 0)
    return select_top_k(score, peaks, max_features)
