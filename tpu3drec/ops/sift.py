"""SIFT re-derived for TPU: DoG scale space, 3-D NMS, subpixel refinement,
orientation histograms, and 128-d gradient descriptors — all static-shape XLA.

Replaces cv2.SIFT_create().detectAndCompute (reference:
traditional_detectors.py:16-52). Structure (mirrors Lowe's algorithm and
OpenCV's implementation, re-designed for the TPU compilation model):

  octave loop (STATIC python loop — one trace per octave resolution)
    Gaussian pyramid: n_layers+3 separable blurs            (conv, VPU)
    DoG stack: adjacent differences                         (fused sub)
    extrema: 3x3x3 min/max reduce_window + contrast gate    (VPU)
    per-octave top-K candidates (fixed capacity)            (top_k)
    subpixel refine: batched 3x3x3 quadratic fit            (vmap, 3x3 solve)
    edge rejection: 2x2 spatial Hessian ratio test
    orientation: fixed 17x17 gradient-patch histogram, 36 bins (gather+einsum)
    descriptor: fixed 16x16 rotated-patch samples -> 4x4x8 trilinear
                binning as one-hot einsum -> (K, 128)        (MXU-friendly)
  global top-K across octaves by |contrast|

Variable-radius windows (cv2 uses per-keypoint pixel radii) become
fixed-count sample grids scaled by the keypoint's octave-relative scale —
identical math, static shapes. Keypoints are *not* bit-identical to OpenCV's
(different NMS tie-breaks, single dominant orientation per keypoint); parity
is asserted at the matching level: GT-homography inlier rates and
reprojection errors on par with cv2.SIFT (see tests/test_sift.py).
"""

from __future__ import annotations

import functools
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from tpu3drec.core.types import Features, DescriptorKind
from tpu3drec.ops.image import gaussian_blur, downsample2

# ---------------------------------------------------------------------
# constants (OpenCV defaults)
# ---------------------------------------------------------------------
N_LAYERS = 3            # nOctaveLayers
SIGMA0 = 1.6            # base sigma
INIT_SIGMA = 0.5        # assumed blur of the input image
ORI_BINS = 36
ORI_SIG_FCTR = 1.5
ORI_RADIUS_FCTR = 4.5   # 3 * ORI_SIG_FCTR
ORI_PEAK_RATIO = 0.8
DESC_D = 4              # descriptor spatial bins
DESC_B = 8              # orientation bins
DESC_SCL_FCTR = 3.0     # hist width = 3 * scale
DESC_MAG_THR = 0.2
ORI_SAMPLES = 17        # fixed orientation-patch side
DESC_SAMPLES = 16       # fixed descriptor-patch side


def num_octaves(h: int, w: int, min_size: int = 16) -> int:
    return max(1, int(math.floor(math.log2(min(h, w) / min_size))) + 1)


def _gaussian_pyramid(img: jnp.ndarray) -> List[jnp.ndarray]:
    """One octave's stack of N_LAYERS+3 progressively blurred images.

    Returns a (S, H, W) array; the caller downsamples layer N_LAYERS for the
    next octave (cv2's convention).
    """
    k = 2.0 ** (1.0 / N_LAYERS)
    sigmas = [SIGMA0]
    for i in range(1, N_LAYERS + 3):
        sig_prev = SIGMA0 * (k ** (i - 1))
        sig_total = sig_prev * k
        sigmas.append(math.sqrt(sig_total ** 2 - sig_prev ** 2))
    gs = [img]
    for i in range(1, N_LAYERS + 3):
        gs.append(gaussian_blur(gs[-1], sigmas[i]))
    return jnp.stack(gs)


def _dog_extrema_mask(dog: jnp.ndarray, contrast_threshold: float) -> jnp.ndarray:
    """(S-?,H,W) bool: strict 26-neighbourhood extrema above the prelim gate.

    dog is the (N_LAYERS+2, H, W) DoG stack; output covers layers 1..N_LAYERS
    (same shape, borders False).
    """
    s, h, w = dog.shape
    mx = lax.reduce_window(dog, -jnp.inf, lax.max, (3, 3, 3), (1, 1, 1), "SAME")
    mn = lax.reduce_window(dog, jnp.inf, lax.min, (3, 3, 3), (1, 1, 1), "SAME")
    prelim = 0.5 * contrast_threshold / N_LAYERS
    is_ext = ((dog >= mx) | (dog <= mn)) & (jnp.abs(dog) > prelim)
    # valid layers: 1..N_LAYERS; valid pixels: away from image border
    ss = lax.broadcasted_iota(jnp.int32, dog.shape, 0)
    yy = lax.broadcasted_iota(jnp.int32, dog.shape, 1)
    xx = lax.broadcasted_iota(jnp.int32, dog.shape, 2)
    B = 5
    ok = (ss >= 1) & (ss <= N_LAYERS) & \
         (yy >= B) & (yy < h - B) & (xx >= B) & (xx < w - B)
    return is_ext & ok


def _refine_candidates(dog: jnp.ndarray, sel_s, sel_y, sel_x,
                       contrast_threshold: float, edge_threshold: float):
    """Batched quadratic subpixel refinement + contrast & edge rejection.

    One Newton step on the 3x3x3 neighbourhood (cv2 iterates up to 5 times
    moving between pixels; a single clamped step changes keypoints by <0.5px
    which is below our parity tolerance).
    Returns (xs, ys, layer_offset, contrast, keep).
    """
    def grab(ds, dy, dx):
        return dog[sel_s + ds, sel_y + dy, sel_x + dx]

    v = grab(0, 0, 0)
    # first derivatives (scale, y, x)
    d_s = 0.5 * (grab(1, 0, 0) - grab(-1, 0, 0))
    d_y = 0.5 * (grab(0, 1, 0) - grab(0, -1, 0))
    d_x = 0.5 * (grab(0, 0, 1) - grab(0, 0, -1))
    # second derivatives
    dss = grab(1, 0, 0) + grab(-1, 0, 0) - 2 * v
    dyy = grab(0, 1, 0) + grab(0, -1, 0) - 2 * v
    dxx = grab(0, 0, 1) + grab(0, 0, -1) - 2 * v
    dsy = 0.25 * (grab(1, 1, 0) - grab(1, -1, 0) - grab(-1, 1, 0) + grab(-1, -1, 0))
    dsx = 0.25 * (grab(1, 0, 1) - grab(1, 0, -1) - grab(-1, 0, 1) + grab(-1, 0, -1))
    dyx = 0.25 * (grab(0, 1, 1) - grab(0, 1, -1) - grab(0, -1, 1) + grab(0, -1, -1))

    H = jnp.stack([
        jnp.stack([dss, dsy, dsx], -1),
        jnp.stack([dsy, dyy, dyx], -1),
        jnp.stack([dsx, dyx, dxx], -1),
    ], -2)  # (K, 3, 3)
    g = jnp.stack([d_s, d_y, d_x], -1)  # (K, 3)
    # solve H @ off = -g ; guard singular Hessians
    det = jnp.linalg.det(H)
    Hsafe = jnp.where(jnp.abs(det)[:, None, None] > 1e-12, H,
                      jnp.eye(3, dtype=H.dtype))
    off = -jnp.linalg.solve(Hsafe, g[..., None])[..., 0]
    off = jnp.clip(off, -0.5, 0.5)

    contrast = v + 0.5 * jnp.sum(g * off, axis=-1)
    keep = jnp.abs(contrast) >= contrast_threshold / N_LAYERS

    # edge response: 2x2 spatial Hessian (y, x)
    tr = dyy + dxx
    det2 = dyy * dxx - dyx * dyx
    r = edge_threshold
    keep &= (det2 > 0) & (tr * tr * r < (r + 1) ** 2 * det2)

    xs = sel_x.astype(jnp.float32) + off[:, 2]
    ys = sel_y.astype(jnp.float32) + off[:, 1]
    ls = sel_s.astype(jnp.float32) + off[:, 0]
    return xs, ys, ls, contrast, keep


def _patch_offsets(n: int) -> jnp.ndarray:
    """(n*n, 2) unit-square sample offsets in [-0.5, 0.5]^2, row-major (x, y)."""
    lin = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n - 0.5
    gx, gy = jnp.meshgrid(lin, lin, indexing="xy")
    return jnp.stack([gx.ravel(), gy.ravel()], axis=1)


def _bilinear_many(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Bilinear sample of (H, W) image at arbitrary-shaped x, y arrays."""
    h, w = img.shape
    x = jnp.clip(x, 0.0, w - 1.001)
    y = jnp.clip(y, 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


def _orientation(dxs: jnp.ndarray, dys: jnp.ndarray,
                 xs: jnp.ndarray, ys: jnp.ndarray,
                 scl: jnp.ndarray) -> jnp.ndarray:
    """Dominant gradient orientation per keypoint (radians).

    dxs/dys: per-layer gradient images (S, H, W) — caller selects the layer
    by passing pre-gathered (K, H, W)? No: we pass single-layer gradients and
    vmap outside. Here dxs, dys are (H, W); xs, ys, scl are (K,).
    """
    P = ORI_SAMPLES
    offs = _patch_offsets(P) * 2.0 * ORI_RADIUS_FCTR  # in scale units
    # sample positions: x + off * scl
    px = xs[:, None] + offs[None, :, 0] * scl[:, None]   # (K, P*P)
    py = ys[:, None] + offs[None, :, 1] * scl[:, None]
    gx = _bilinear_many(dxs, px, py)
    gy = _bilinear_many(dys, px, py)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ori = jnp.arctan2(gy, gx)  # [-pi, pi]
    r2 = jnp.sum(offs ** 2, axis=1)  # scale-unit radius^2
    wgt = jnp.exp(-r2 / (2.0 * ORI_SIG_FCTR ** 2))[None, :]
    # histogram via one-hot einsum
    bin_f = (ori / (2 * jnp.pi) + 0.5) * ORI_BINS  # [0, 36)
    b0 = jnp.floor(bin_f).astype(jnp.int32) % ORI_BINS
    frac = bin_f - jnp.floor(bin_f)
    w_all = mag * wgt
    oh0 = jax.nn.one_hot(b0, ORI_BINS, dtype=w_all.dtype)
    oh1 = jax.nn.one_hot((b0 + 1) % ORI_BINS, ORI_BINS, dtype=w_all.dtype)
    hist = jnp.einsum("kp,kpb->kb", w_all * (1 - frac), oh0) + \
           jnp.einsum("kp,kpb->kb", w_all * frac, oh1)
    # circular [1,4,6,4,1]/16 smoothing, twice (approximates cv2's smoothing)
    def smooth(hh):
        return (6 * hh + 4 * (jnp.roll(hh, 1, -1) + jnp.roll(hh, -1, -1))
                + (jnp.roll(hh, 2, -1) + jnp.roll(hh, -2, -1))) / 16.0
    hist = smooth(smooth(hist))
    # parabolic peak interpolation around argmax
    pk = jnp.argmax(hist, axis=1)
    k_idx = jnp.arange(hist.shape[0])
    hl = hist[k_idx, (pk - 1) % ORI_BINS]
    hc = hist[k_idx, pk]
    hr = hist[k_idx, (pk + 1) % ORI_BINS]
    denom = hl - 2 * hc + hr
    dbin = jnp.where(jnp.abs(denom) > 1e-12,
                     0.5 * (hl - hr) / jnp.where(jnp.abs(denom) > 1e-12,
                                                 denom, 1.0), 0.0)
    bin_pos = (pk.astype(jnp.float32) + dbin) % ORI_BINS
    return (bin_pos / ORI_BINS - 0.5) * 2 * jnp.pi


def _descriptor(dxs: jnp.ndarray, dys: jnp.ndarray,
                xs: jnp.ndarray, ys: jnp.ndarray,
                scl: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """(K, 128) SIFT descriptors via fixed 16x16 rotated-patch sampling."""
    P = DESC_SAMPLES
    offs = _patch_offsets(P)  # (P*P, 2) in [-0.5, 0.5]
    win = DESC_SCL_FCTR * (DESC_D + 1)  # full window width in scale units
    ox = offs[:, 0] * win
    oy = offs[:, 1] * win
    ca, sa = jnp.cos(angle), jnp.sin(angle)  # (K,)
    # rotate sample offsets by keypoint angle, scale to pixels
    px = xs[:, None] + (ca[:, None] * ox[None] - sa[:, None] * oy[None]) * scl[:, None]
    py = ys[:, None] + (sa[:, None] * ox[None] + ca[:, None] * oy[None]) * scl[:, None]
    gx = _bilinear_many(dxs, px, py)
    gy = _bilinear_many(dys, px, py)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ori = jnp.arctan2(gy, gx) - angle[:, None]
    # bin coordinates: rows/cols in [0, D)
    rbin = oy[None, :] / DESC_SCL_FCTR + DESC_D / 2 - 0.5  # (1, P*P) -> bcast
    cbin = ox[None, :] / DESC_SCL_FCTR + DESC_D / 2 - 0.5
    rbin = jnp.broadcast_to(rbin, mag.shape)
    cbin = jnp.broadcast_to(cbin, mag.shape)
    obin = (ori / (2 * jnp.pi) % 1.0) * DESC_B
    wgt = jnp.exp(-(ox ** 2 + oy ** 2)[None, :]
                  / (2 * (0.5 * DESC_D * DESC_SCL_FCTR) ** 2))
    w_all = mag * wgt

    def onehot_lin(binf, n, wrap):
        b0 = jnp.floor(binf)
        f = binf - b0
        b0i = b0.astype(jnp.int32)
        if wrap:
            i0 = b0i % n
            i1 = (b0i + 1) % n
            v0 = jnp.ones_like(f)
            v1 = jnp.ones_like(f)
        else:
            i0 = jnp.clip(b0i, 0, n - 1)
            i1 = jnp.clip(b0i + 1, 0, n - 1)
            v0 = ((b0i >= 0) & (b0i < n)).astype(f.dtype)
            v1 = ((b0i + 1 >= 0) & (b0i + 1 < n)).astype(f.dtype)
        oh0 = jax.nn.one_hot(i0, n, dtype=f.dtype) * ((1 - f) * v0)[..., None]
        oh1 = jax.nn.one_hot(i1, n, dtype=f.dtype) * (f * v1)[..., None]
        return oh0 + oh1  # (K, P*P, n)

    ohr = onehot_lin(rbin, DESC_D, wrap=False)
    ohc = onehot_lin(cbin, DESC_D, wrap=False)
    oho = onehot_lin(obin, DESC_B, wrap=True)
    desc = jnp.einsum("kp,kpr,kpc,kpo->krco", w_all, ohr, ohc, oho)
    desc = desc.reshape(desc.shape[0], -1)  # (K, 128)
    # normalize -> clip 0.2 -> renormalize -> scale 512 (cv2 convention)
    norm = jnp.linalg.norm(desc, axis=1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-12)
    desc = jnp.minimum(desc, DESC_MAG_THR)
    norm = jnp.linalg.norm(desc, axis=1, keepdims=True)
    return 512.0 * desc / jnp.maximum(norm, 1e-12)


@functools.partial(jax.jit, static_argnames=("max_features", "upscale"))
def detect_and_compute(img: jnp.ndarray, max_features: int = 2048,
                       contrast_threshold: float = 0.04,
                       edge_threshold: float = 10.0,
                       upscale: bool = False):
    """Full SIFT. img: (H, W) float32 in [0, 1]. Returns array bundle
    (xy, response, scale, angle, desc, mask) with capacity max_features."""
    if upscale:
        img = jax.image.resize(img, (img.shape[0] * 2, img.shape[1] * 2),
                               "linear")
    h0, w0 = img.shape
    n_oct = num_octaves(h0, w0)
    # initial blur to reach SIGMA0 from the assumed INIT_SIGMA
    sig_diff = math.sqrt(max(SIGMA0 ** 2 - (2 * INIT_SIGMA if upscale else INIT_SIGMA) ** 2, 0.01))
    base = gaussian_blur(img, sig_diff)

    per_oct_cap = max(256, max_features)
    all_parts = []
    cur = base
    for o in range(n_oct):
        gauss = _gaussian_pyramid(cur)          # (S+3, h, w)
        dog = gauss[1:] - gauss[:-1]            # (S+2, h, w)
        ext = _dog_extrema_mask(dog, contrast_threshold)
        # per-octave candidate selection (fixed cap) by |dog|
        score = jnp.where(ext, jnp.abs(dog), -jnp.inf)
        flat = score.reshape(-1)
        k_cap = min(per_oct_cap, flat.shape[0])
        vals, idx = lax.top_k(flat, k_cap)
        cand_ok = vals > -jnp.inf
        sh, hh, wh = dog.shape
        sel_s = idx // (hh * wh)
        rem = idx % (hh * wh)
        sel_y = rem // wh
        sel_x = rem % wh

        xs, ys, ls, contrast, keep = _refine_candidates(
            dog, sel_s, sel_y, sel_x, contrast_threshold, edge_threshold)
        keep &= cand_ok

        # octave-relative scale, and per-keypoint gradients from the nearest
        # gaussian layer. Layer selection must be static -> gather from the
        # stacked gradient images by rounded layer index.
        scl_oct = SIGMA0 * jnp.exp2(ls / N_LAYERS)  # pixels, octave-relative
        layer_idx = jnp.clip(jnp.round(ls).astype(jnp.int32), 1, N_LAYERS)
        dx_stack = 0.5 * (jnp.roll(gauss, -1, axis=2) - jnp.roll(gauss, 1, axis=2))
        dy_stack = 0.5 * (jnp.roll(gauss, -1, axis=1) - jnp.roll(gauss, 1, axis=1))

        # orientation + descriptor: vmap over the (small) set of layers by
        # computing against every layer is wasteful; instead gather per-
        # keypoint using one _bilinear_many on an indexed stack.
        def sample_layer(stack, x, y, li):
            # advanced indexing (K,) layers with (K, P) coords
            hq, wq = stack.shape[1:]
            x = jnp.clip(x, 0.0, wq - 1.001)
            y = jnp.clip(y, 0.0, hq - 1.001)
            x0 = jnp.floor(x).astype(jnp.int32)
            y0 = jnp.floor(y).astype(jnp.int32)
            fx = x - x0
            fy = y - y0
            li_b = li[:, None]
            v00 = stack[li_b, y0, x0]
            v01 = stack[li_b, y0, x0 + 1]
            v10 = stack[li_b, y0 + 1, x0]
            v11 = stack[li_b, y0 + 1, x0 + 1]
            return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
                    + fy * ((1 - fx) * v10 + fx * v11))

        # orientation on indexed layers
        P = ORI_SAMPLES
        offs = _patch_offsets(P) * 2.0 * ORI_RADIUS_FCTR
        px = xs[:, None] + offs[None, :, 0] * scl_oct[:, None]
        py = ys[:, None] + offs[None, :, 1] * scl_oct[:, None]
        gx = sample_layer(dx_stack, px, py, layer_idx)
        gy = sample_layer(dy_stack, px, py, layer_idx)
        mag = jnp.sqrt(gx * gx + gy * gy)
        orid = jnp.arctan2(gy, gx)
        r2 = jnp.sum(offs ** 2, axis=1)
        wgt = jnp.exp(-r2 / (2.0 * ORI_SIG_FCTR ** 2))[None, :]
        bin_f = (orid / (2 * jnp.pi) + 0.5) * ORI_BINS
        b0 = jnp.floor(bin_f).astype(jnp.int32) % ORI_BINS
        frac = bin_f - jnp.floor(bin_f)
        w_all = mag * wgt
        oh0 = jax.nn.one_hot(b0, ORI_BINS, dtype=w_all.dtype)
        oh1 = jax.nn.one_hot((b0 + 1) % ORI_BINS, ORI_BINS, dtype=w_all.dtype)
        hist = jnp.einsum("kp,kpb->kb", w_all * (1 - frac), oh0) + \
               jnp.einsum("kp,kpb->kb", w_all * frac, oh1)
        def smooth(hh_):
            return (6 * hh_ + 4 * (jnp.roll(hh_, 1, -1) + jnp.roll(hh_, -1, -1))
                    + (jnp.roll(hh_, 2, -1) + jnp.roll(hh_, -2, -1))) / 16.0
        hist = smooth(smooth(hist))
        pk = jnp.argmax(hist, axis=1)
        kidx = jnp.arange(hist.shape[0])
        hl = hist[kidx, (pk - 1) % ORI_BINS]
        hc = hist[kidx, pk]
        hr = hist[kidx, (pk + 1) % ORI_BINS]
        denom = hl - 2 * hc + hr
        safe = jnp.abs(denom) > 1e-12
        dbin = jnp.where(safe, 0.5 * (hl - hr) / jnp.where(safe, denom, 1.0), 0.0)
        angle = (((pk.astype(jnp.float32) + dbin) % ORI_BINS) / ORI_BINS - 0.5) \
            * 2 * jnp.pi

        # descriptor on indexed layers
        Pd = DESC_SAMPLES
        offs_d = _patch_offsets(Pd)
        win = DESC_SCL_FCTR * (DESC_D + 1)
        ox = offs_d[:, 0] * win
        oy = offs_d[:, 1] * win
        ca, sa = jnp.cos(angle), jnp.sin(angle)
        pxd = xs[:, None] + (ca[:, None] * ox[None] - sa[:, None] * oy[None]) * scl_oct[:, None]
        pyd = ys[:, None] + (sa[:, None] * ox[None] + ca[:, None] * oy[None]) * scl_oct[:, None]
        gxd = sample_layer(dx_stack, pxd, pyd, layer_idx)
        gyd = sample_layer(dy_stack, pxd, pyd, layer_idx)
        magd = jnp.sqrt(gxd * gxd + gyd * gyd)
        orid2 = jnp.arctan2(gyd, gxd) - angle[:, None]
        rbin = jnp.broadcast_to(oy[None, :] / DESC_SCL_FCTR + DESC_D / 2 - 0.5, magd.shape)
        cbin = jnp.broadcast_to(ox[None, :] / DESC_SCL_FCTR + DESC_D / 2 - 0.5, magd.shape)
        obin = (orid2 / (2 * jnp.pi) % 1.0) * DESC_B
        wgt_d = jnp.exp(-(ox ** 2 + oy ** 2)[None, :]
                        / (2 * (0.5 * DESC_D * DESC_SCL_FCTR) ** 2))
        w_d = magd * wgt_d

        def onehot_lin(binf, n, wrap):
            b0_ = jnp.floor(binf)
            f = binf - b0_
            b0i = b0_.astype(jnp.int32)
            if wrap:
                i0, i1 = b0i % n, (b0i + 1) % n
                v0 = jnp.ones_like(f)
                v1 = jnp.ones_like(f)
            else:
                i0 = jnp.clip(b0i, 0, n - 1)
                i1 = jnp.clip(b0i + 1, 0, n - 1)
                v0 = ((b0i >= 0) & (b0i < n)).astype(f.dtype)
                v1 = ((b0i + 1 >= 0) & (b0i + 1 < n)).astype(f.dtype)
            oh0_ = jax.nn.one_hot(i0, n, dtype=f.dtype) * ((1 - f) * v0)[..., None]
            oh1_ = jax.nn.one_hot(i1, n, dtype=f.dtype) * (f * v1)[..., None]
            return oh0_ + oh1_

        ohr = onehot_lin(rbin, DESC_D, wrap=False)
        ohc = onehot_lin(cbin, DESC_D, wrap=False)
        oho = onehot_lin(obin, DESC_B, wrap=True)
        desc = jnp.einsum("kp,kpr,kpc,kpo->krco", w_d, ohr, ohc, oho)
        desc = desc.reshape(desc.shape[0], -1)
        norm = jnp.linalg.norm(desc, axis=1, keepdims=True)
        desc = desc / jnp.maximum(norm, 1e-12)
        desc = jnp.minimum(desc, DESC_MAG_THR)
        norm = jnp.linalg.norm(desc, axis=1, keepdims=True)
        desc = 512.0 * desc / jnp.maximum(norm, 1e-12)

        # map back to input-image coordinates
        factor = (2.0 ** o) * (0.5 if upscale else 1.0)
        size = scl_oct * factor * 2.0
        all_parts.append(dict(
            xy=jnp.stack([xs * factor, ys * factor], axis=1),
            response=jnp.abs(contrast),
            scale=size,
            angle=angle,
            desc=desc,
            mask=keep,
        ))
        if o + 1 < n_oct:
            cur = downsample2(gauss[N_LAYERS])

    merged = {k: jnp.concatenate([p[k] for p in all_parts], axis=0)
              for k in all_parts[0]}
    # global top-K by response among valid
    score = jnp.where(merged["mask"], merged["response"], -jnp.inf)
    _, order = lax.top_k(score, max_features)
    out = {k: v[order] for k, v in merged.items()}
    out["mask"] = out["mask"] & (score[order] > -jnp.inf)
    return out["xy"], out["response"], out["scale"], out["angle"], \
        out["desc"], out["mask"]


def detect_sift_features(img: jnp.ndarray, max_features: int = 2048,
                         contrast_threshold: float = 0.04,
                         edge_threshold: float = 10.0,
                         upscale: bool = False, sigma: float = 1.6,
                         method: str = "SIFT", **_unused) -> Features:
    """Detector-contract wrapper returning a Features pytree."""
    xy, resp, scale, angle, desc, mask = detect_and_compute(
        img, max_features=max_features,
        contrast_threshold=contrast_threshold,
        edge_threshold=edge_threshold, upscale=upscale)
    return Features(xy=xy, response=resp, scale=scale, angle=angle,
                    desc=desc, mask=mask, method=method,
                    desc_kind=DescriptorKind.FLOAT.value,
                    image_shape=tuple(img.shape))


@functools.partial(jax.jit)
def describe_at_points(img: jnp.ndarray, xy: jnp.ndarray,
                       mask: jnp.ndarray, patch_scale: float = 2.0):
    """SIFT descriptors + orientations at given points at a fixed scale.

    Used by corner detectors (Harris/GFTT) which have no intrinsic scale —
    the reference pairs them with SIFT descriptors the same way
    (traditional_detectors.py:166-287).
    Returns (desc (K, 128), angle (K,)).
    """
    blur = gaussian_blur(img, SIGMA0)
    dx = 0.5 * (jnp.roll(blur, -1, axis=1) - jnp.roll(blur, 1, axis=1))
    dy = 0.5 * (jnp.roll(blur, -1, axis=0) - jnp.roll(blur, 1, axis=0))
    scl = jnp.full((xy.shape[0],), patch_scale, jnp.float32)
    angle = _orientation(dx, dy, xy[:, 0], xy[:, 1], scl)
    desc = _descriptor(dx, dy, xy[:, 0], xy[:, 1], scl, angle)
    return desc * mask[:, None], jnp.where(mask, angle, 0.0)
