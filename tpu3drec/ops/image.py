"""Image primitives: grayscale, resize, separable Gaussian filtering, gradients.

TPU-native replacements for the cv2 calls in the reference's preprocessing
(base_classes.py:35-47 cvtColor; image_manager.py:260 resize) and the
scale-space machinery that cv2.SIFT/AKAZE hide inside C++.

All functions are pure, shape-static, jit-able, and batchable with vmap.
Images are float32 (H, W) grayscale in [0, 1] unless stated otherwise.
Convolutions are expressed as lax.conv_general_dilated so XLA fuses and tiles
them; the separable Gaussian is two 1-D convs (O(H*W*K) not O(H*W*K^2)).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# ITU-R BT.601 luma weights — same as cv2.cvtColor(BGR2GRAY)/(RGB2GRAY)
_LUMA = np.array([0.299, 0.587, 0.114], np.float32)


def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) RGB (or (H, W)) -> (H, W) float32 gray, cv2-compatible weights."""
    img = img.astype(jnp.float32)
    if img.ndim == 2:
        return img
    return img @ _LUMA


def normalize_u8(img: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] -> float32 [0,1]."""
    return img.astype(jnp.float32) * (1.0 / 255.0)


def resize(img: jnp.ndarray, shape: Tuple[int, int], method: str = "linear") -> jnp.ndarray:
    """Resize (H, W[, C]) image to (h, w) — replacement for cv2.resize."""
    out_shape = tuple(shape) + tuple(img.shape[2:])
    return jax.image.resize(img, out_shape, method=method)


def gaussian_kernel_1d(sigma: float, radius: int = None) -> jnp.ndarray:
    """1-D Gaussian taps; radius defaults to ceil(4*sigma) like cv2 (f32)."""
    if radius is None:
        radius = max(1, int(math.ceil(4.0 * sigma)))
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _conv1d(img: jnp.ndarray, taps: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Reflect-padded 1-D convolution of a (H, W) image along axis 0 or 1."""
    r = taps.shape[0] // 2
    pad = [(0, 0), (0, 0)]
    pad[axis] = (r, r)
    x = jnp.pad(img, pad, mode="reflect")
    x = x[None, None]  # NCHW
    if axis == 0:
        w = taps.reshape(1, 1, -1, 1)
    else:
        w = taps.reshape(1, 1, 1, -1)
    # Precision.HIGHEST: TPU convs otherwise default to bfloat16 passes,
    # which is far too coarse for DoG contrast thresholds (~0.013).
    y = lax.conv_general_dilated(x, w, (1, 1), "VALID",
                                 dimension_numbers=("NCHW", "OIHW", "NCHW"),
                                 precision=lax.Precision.HIGHEST)
    return y[0, 0]


def gaussian_blur(img: jnp.ndarray, sigma: float, radius: int = None) -> jnp.ndarray:
    """Separable Gaussian blur of a (H, W) image with reflect padding.

    Replaces cv2.GaussianBlur inside SIFT's scale-space construction.
    sigma is a static Python float (kernel size must be static under jit).
    """
    if sigma <= 0:
        return img
    taps = gaussian_kernel_1d(sigma, radius)
    return _conv1d(_conv1d(img, taps, 0), taps, 1)


@functools.lru_cache(maxsize=256)
def _band_matrix(n: int, sigma: float, radius: int = None):
    """(n, n) banded Toeplitz blur matrix with reflect boundary, cached.

    Built with numpy at trace time; embedding it as a constant turns the
    1-channel convolution (which lowers terribly on TPU) into a dense
    matmul that runs on the MXU.
    """
    import numpy as _np
    if radius is None:
        radius = max(1, int(math.ceil(4.0 * sigma)))
    x = _np.arange(-radius, radius + 1, dtype=_np.float64)
    taps = _np.exp(-0.5 * (x / sigma) ** 2)
    taps /= taps.sum()
    B = _np.zeros((n, n), _np.float32)
    idx = _np.arange(n)
    for k, w in zip(range(-radius, radius + 1), taps):
        j = idx + k
        # reflect-101 boundary (matches np.pad mode='reflect')
        j = _np.where(j < 0, -j, j)
        j = _np.where(j >= n, 2 * (n - 1) - j, j)
        B[idx, j] += w
    # cache the NUMPY array: converting inside a trace would cache a tracer
    return B


def gaussian_blur_matmul(img: jnp.ndarray, sigma: float,
                         radius: int = None) -> jnp.ndarray:
    """Gaussian blur as two MXU matmuls: B_h @ img @ B_w^T.

    Same taps and reflect boundary as `gaussian_blur` but ~2 orders of
    magnitude faster on TPU, where single-
    channel convs can't tile onto the MXU. Used by the scale-space
    detectors (SIFT/AKAZE); `gaussian_blur` remains for parity tests.
    """
    if sigma <= 0:
        return img
    h, w = img.shape
    Bh = _band_matrix(h, float(sigma), radius)
    Bw = _band_matrix(w, float(sigma), radius)
    out = jnp.dot(Bh, img, preferred_element_type=jnp.float32,
                  precision=lax.Precision.HIGH)
    # HIGH (3-pass bf16, ~1e-6 relative error) instead of HIGHEST (6
    # passes): measured quality-neutral on the warp oracle (144 matches
    # @ 0.977 inlier ratio either way) and 73.9 -> 85.0 pairs/s
    return jnp.dot(out, Bw.T, preferred_element_type=jnp.float32,
                   precision=lax.Precision.HIGH)


def sobel_gradients(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sobel dx, dy of a (H, W) image (cv2.Sobel ksize=3 equivalents)."""
    smooth = jnp.array([1.0, 2.0, 1.0], jnp.float32)
    diff = jnp.array([-1.0, 0.0, 1.0], jnp.float32)
    dx = _conv1d(_conv1d(img, smooth, 0), diff, 1)
    dy = _conv1d(_conv1d(img, diff, 0), smooth, 1)
    return dx, dy


def central_gradients(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Central-difference dx, dy (what SIFT uses for orientation/descriptors)."""
    dx = 0.5 * (jnp.roll(img, -1, axis=1) - jnp.roll(img, 1, axis=1))
    dy = 0.5 * (jnp.roll(img, -1, axis=0) - jnp.roll(img, 1, axis=0))
    return dx, dy


def box_filter(img: jnp.ndarray, size: int) -> jnp.ndarray:
    """Mean filter via separable ones kernel (for Harris window sums)."""
    taps = jnp.ones((size,), jnp.float32) / size
    return _conv1d(_conv1d(img, taps, 0), taps, 1)


def downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """2x nearest-neighbour decimation (SIFT octave downsampling)."""
    return img[::2, ::2]


def bilinear_sample(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample (H, W) image at (N, 2) float (x, y) coords, bilinear, clamped.

    The gather/warp primitive used for stereo rectification remaps and
    descriptor patch sampling (replaces cv2.remap).
    """
    h, w = img.shape
    x = jnp.clip(xy[:, 0], 0.0, w - 1.0)
    y = jnp.clip(xy[:, 1], 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = x - x0
    fy = y - y0
    # one linearized gather for all four taps: 2-D advanced indexing
    # lowers to the slow general gather on TPU; flat jnp.take is the
    # fast form (and fusing the taps avoids 4 dispatches)
    flat = img.reshape(-1)
    idx = jnp.stack([y0 * w + x0, y0 * w + x1,
                     y1 * w + x0, y1 * w + x1])
    v00, v01, v10, v11 = jnp.take(flat, idx.reshape(-1),
                                  axis=0).reshape(4, -1)
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


def homography_grid(H: jnp.ndarray, out_shape: Tuple[int, int]
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-pixel source coordinates of the FORWARD map H.

    Returns (sx, sy), each (h, w) float32, with [sx, sy, 1] ~ H @ [x, y, 1]
    for every output pixel (x, y). Sampling an image at this grid computes
    out(p) = img(H p); pass H^-1 for the usual inverse warp.
    """
    h, w = out_shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    # projective division with sign-preserving |w| guard
    den = H[2, 0] * xs + H[2, 1] * ys + H[2, 2]
    den = jnp.sign(den) * jnp.maximum(jnp.abs(den), 1e-12)
    sx = (H[0, 0] * xs + H[0, 1] * ys + H[0, 2]) / den
    sy = (H[1, 0] * xs + H[1, 1] * ys + H[1, 2]) / den
    return sx, sy


def sample_grid(img: jnp.ndarray, sx: jnp.ndarray,
                sy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample a (H, W) image at (h, w) coordinate grids, clamped
    (the 2-D form of `bilinear_sample`; cv2.remap BORDER_REPLICATE)."""
    out = bilinear_sample(img, jnp.stack([sx.ravel(), sy.ravel()], axis=1))
    return out.reshape(sx.shape)


def grid_in_bounds(shape: Tuple[int, int], sx: jnp.ndarray,
                   sy: jnp.ndarray) -> jnp.ndarray:
    """Mask of grid positions whose bilinear footprint lies inside a
    (H, W) source image (no border replication involved)."""
    h, w = shape
    return ((sx >= 0.0) & (sx <= w - 1.0)
            & (sy >= 0.0) & (sy <= h - 1.0))


def warp_perspective(img: jnp.ndarray, H: jnp.ndarray,
                     out_shape: Tuple[int, int]) -> jnp.ndarray:
    """Inverse-warp an image by homography H (cv2.warpPerspective equivalent).

    H maps src -> dst; we sample src at H^-1 @ dst grid.
    """
    sx, sy = homography_grid(jnp.linalg.inv(H), out_shape)
    return sample_grid(img, sx, sy)
