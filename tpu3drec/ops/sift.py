"""SIFT re-derived for TPU: DoG scale space, 3-D NMS, subpixel refinement,
orientation histograms, and 128-d gradient descriptors — all static-shape XLA.

Replaces cv2.SIFT_create().detectAndCompute (reference:
traditional_detectors.py:16-52). Structure (mirrors Lowe's algorithm and
OpenCV's implementation, re-designed for the TPU compilation model):

  octave loop (STATIC python loop — one trace per octave resolution)
    Gaussian pyramid: blurs as banded-matrix MXU matmuls  (ops/image.py)
    DoG stack: adjacent differences                        (fused sub)
    extrema: separable shift-max over the 3x3x3 nbhd + contrast gate (VPU)
    per-octave candidates: lax.approx_max_k (TPU-native partial top-k)
    subpixel refine: batched 3x3x3 quadratic fit           (vmapped solve)
    edge rejection: 2x2 spatial Hessian ratio test
    orientation: fixed 13x13 gradient-patch histogram, 36 bins
    descriptor: fixed 16x16 rotated-patch samples -> 4x4x8 trilinear
                binning; the row/col one-hots are keypoint-independent
                constants, so binning is one small batched matmul
  global top-K across octaves by |contrast|

All per-keypoint sampling uses LINEARIZED 1-D gathers (flat indices into
the (S*H*W,) stack) — multi-axis advanced indexing lowers to slow general
gathers on TPU, single-axis gathers are fast.

Keypoints are not bit-identical to OpenCV's (different NMS tie-breaks,
single dominant orientation per keypoint); parity is asserted at the
matching level: GT-homography inlier rates and reprojection errors on par
with cv2.SIFT (tests/test_sift.py).
"""

from __future__ import annotations

import functools
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tpu3drec.core.types import Features, DescriptorKind
from tpu3drec.ops.image import gaussian_blur_matmul, downsample2

# ---------------------------------------------------------------------
# constants (OpenCV defaults)
# ---------------------------------------------------------------------
N_LAYERS = 3            # nOctaveLayers
SIGMA0 = 1.6            # base sigma
INIT_SIGMA = 0.5        # assumed blur of the input image
ORI_BINS = 36
ORI_SIG_FCTR = 1.5
ORI_RADIUS_FCTR = 4.5   # 3 * ORI_SIG_FCTR
DESC_D = 4              # descriptor spatial bins
DESC_B = 8              # orientation bins
DESC_SCL_FCTR = 3.0     # hist width = 3 * scale
DESC_MAG_THR = 0.2
ORI_SAMPLES = 9         # fixed orientation-patch side (13 and 9 give
                        # identical GT-warp match quality; 9 = 2x fewer
                        # gather elements in the orientation stage)
DESC_SAMPLES = 12       # fixed descriptor-patch side


def num_octaves(h: int, w: int, min_size: int = 16) -> int:
    return max(1, int(math.floor(math.log2(min(h, w) / min_size))) + 1)


def _gaussian_pyramid(img: jnp.ndarray) -> jnp.ndarray:
    """(N_LAYERS+3, H, W) progressively blurred stack (one octave).

    Every level is blurred DIRECTLY from the octave base with the
    composed sigma (Gaussians compose: sqrt(sig_i^2 - SIGMA0^2)) so the
    five level blurs run as two batched (L, n, n) einsum-matmuls instead
    of ten sequential dependent matmuls — bigger MXU ops, no serial
    chain. Numerically equivalent to incremental blurring up to kernel
    truncation (~1e-4, far below the DoG contrast gates)."""
    from tpu3drec.ops.image import _band_matrix
    h, w = img.shape
    k = 2.0 ** (1.0 / N_LAYERS)
    L = N_LAYERS + 2
    sigs = [math.sqrt((SIGMA0 * k ** i) ** 2 - SIGMA0 ** 2)
            for i in range(1, L + 1)]
    Rh = jnp.stack([jnp.asarray(_band_matrix(h, s)) for s in sigs])
    Cw = jnp.stack([jnp.asarray(_band_matrix(w, s)) for s in sigs])
    t = jnp.einsum("lhk,kw->lhw", Rh, img,
                   precision=lax.Precision.HIGH,
                   preferred_element_type=jnp.float32)
    out = jnp.einsum("lhw,lvw->lhv", t, Cw,
                     precision=lax.Precision.HIGH,
                     preferred_element_type=jnp.float32)
    return jnp.concatenate([img[None], out], axis=0)


def _separable_extrema(dog: jnp.ndarray):
    """(S,H,W) max and min over each voxel's 3x3x3 neighbourhood.

    Three separable 1-D `lax.reduce_window` passes per bound: measured
    75.5 -> 52.2 ms per 64-image batch on v5e vs the previous
    concatenate-of-slices shift-max (the lane-axis concats forced
    relayout copies). SAME padding with the +-inf identity equals the
    old edge-clamped semantics exactly — a duplicated edge element
    never changes a max/min.
    """
    mx = dog
    mn = dog
    for ax in range(3):
        win = [1, 1, 1]
        win[ax] = 3
        mx = lax.reduce_window(mx, -jnp.inf, lax.max, tuple(win),
                               (1, 1, 1), "SAME")
        mn = lax.reduce_window(mn, jnp.inf, lax.min, tuple(win),
                               (1, 1, 1), "SAME")
    return mx, mn


def _dog_extrema_mask(dog: jnp.ndarray, contrast_threshold: float) -> jnp.ndarray:
    s, h, w = dog.shape
    mx, mn = _separable_extrema(dog)
    prelim = 0.5 * contrast_threshold / N_LAYERS
    is_ext = ((dog >= mx) | (dog <= mn)) & (jnp.abs(dog) > prelim)
    ss = lax.broadcasted_iota(jnp.int32, dog.shape, 0)
    yy = lax.broadcasted_iota(jnp.int32, dog.shape, 1)
    xx = lax.broadcasted_iota(jnp.int32, dog.shape, 2)
    B = 5
    ok = (ss >= 1) & (ss <= N_LAYERS) & \
         (yy >= B) & (yy < h - B) & (xx >= B) & (xx < w - B)
    return is_ext & ok


@jax.custom_batching.custom_vmap
def _flat_gather(flat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """1-D gather — the TPU-fast indexing primitive.

    Under vmap the batch axis is folded INTO the gather: (B, L) sources
    flatten to (B*L,) and indices get per-element offsets, so XLA sees
    one plain 1-D take instead of a batched general gather (measured
    ~150M vs ~76M elements/s on v5e — refine + XLA sampling are gather-
    element-bound, CLAUDE.md)."""
    return jnp.take(flat, idx, axis=0)


@_flat_gather.def_vmap
def _flat_gather_vmap(axis_size, in_batched, flat, idx):
    flat_b, idx_b = in_batched
    if not flat_b:
        flat = jnp.broadcast_to(flat[None], (axis_size,) + flat.shape)
    if not idx_b:
        idx = jnp.broadcast_to(idx[None], (axis_size,) + idx.shape)
    L = flat.shape[1]
    offs = (jnp.arange(axis_size, dtype=idx.dtype) * L).reshape(
        (axis_size,) + (1,) * (idx.ndim - 1))
    out = jnp.take(flat.reshape(-1), idx + offs, axis=0)
    return out, True


def _refine_candidates(dog: jnp.ndarray, sel_s, sel_y, sel_x,
                       contrast_threshold: float, edge_threshold: float):
    """Batched quadratic subpixel refinement + contrast & edge rejection."""
    s, h, w = dog.shape
    flat = dog.reshape(-1)
    base = sel_s * (h * w) + sel_y * w + sel_x

    # one linearized gather for all 19 stencil taps (19 separate K-sized
    # gathers were op-dispatch bound: ~0.75 ms/image at 2.6K candidates).
    # Measured dead end: trading the 12 corner taps for 3 dense mixed-
    # derivative volumes + a 10-tap gather over a stacked (4,S,H,W)
    # volume REGRESSED the headline 154.9 -> 140.7 pairs/s — the dense
    # volume writes + the stack copy cost more than the gather savings.
    stencil = [(0, 0, 0),
               (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
               (0, 0, 1), (0, 0, -1),
               (1, 1, 0), (1, -1, 0), (-1, 1, 0), (-1, -1, 0),
               (1, 0, 1), (1, 0, -1), (-1, 0, 1), (-1, 0, -1),
               (0, 1, 1), (0, 1, -1), (0, -1, 1), (0, -1, -1)]
    offs = jnp.asarray([ds * (h * w) + dy * w + dx
                        for ds, dy, dx in stencil], jnp.int32)
    taps = _flat_gather(
        flat, (base[:, None] + offs[None, :]).reshape(-1)
    ).reshape(-1, len(stencil))
    (v, v_sp, v_sm, v_yp, v_ym, v_xp, v_xm,
     c_pp0, c_pm0, c_mp0, c_mm0,
     c_p0p, c_p0m, c_m0p, c_m0m,
     c_0pp, c_0pm, c_0mp, c_0mm) = [taps[:, i] for i in range(len(stencil))]

    d_s = 0.5 * (v_sp - v_sm)
    d_y = 0.5 * (v_yp - v_ym)
    d_x = 0.5 * (v_xp - v_xm)
    dss = v_sp + v_sm - 2 * v
    dyy = v_yp + v_ym - 2 * v
    dxx = v_xp + v_xm - 2 * v
    dsy = 0.25 * (c_pp0 - c_pm0 - c_mp0 + c_mm0)
    dsx = 0.25 * (c_p0p - c_p0m - c_m0p + c_m0m)
    dyx = 0.25 * (c_0pp - c_0pm - c_0mp + c_0mm)

    # closed-form symmetric 3x3 solve (Cramer / adjugate): XLA's batched
    # small-matrix linalg.solve/det lower to scalar LU loops on TPU and
    # dominated the whole selection stage (~45 ms per 16-image batch)
    det = (dss * (dyy * dxx - dyx * dyx)
           - dsy * (dsy * dxx - dyx * dsx)
           + dsx * (dsy * dyx - dyy * dsx))
    safe = jnp.abs(det) > 1e-12
    inv_det = jnp.where(safe, 1.0 / jnp.where(safe, det, 1.0), 0.0)
    # adjugate of the symmetric Hessian [[dss,dsy,dsx],[dsy,dyy,dyx],
    # [dsx,dyx,dxx]]
    a00 = dyy * dxx - dyx * dyx
    a01 = dsx * dyx - dsy * dxx
    a02 = dsy * dyx - dsx * dyy
    a11 = dss * dxx - dsx * dsx
    a12 = dsy * dsx - dss * dyx
    a22 = dss * dyy - dsy * dsy
    off_s = -(a00 * d_s + a01 * d_y + a02 * d_x) * inv_det
    off_y = -(a01 * d_s + a11 * d_y + a12 * d_x) * inv_det
    off_x = -(a02 * d_s + a12 * d_y + a22 * d_x) * inv_det
    off = jnp.stack([off_s, off_y, off_x], -1)
    g = jnp.stack([d_s, d_y, d_x], -1)
    off = jnp.clip(off, -0.5, 0.5)

    contrast = v + 0.5 * jnp.sum(g * off, axis=-1)
    keep = jnp.abs(contrast) >= contrast_threshold / N_LAYERS
    tr = dyy + dxx
    det2 = dyy * dxx - dyx * dyx
    r = edge_threshold
    keep &= (det2 > 0) & (tr * tr * r < (r + 1) ** 2 * det2)

    xs = sel_x.astype(jnp.float32) + off[:, 2]
    ys = sel_y.astype(jnp.float32) + off[:, 1]
    ls = sel_s.astype(jnp.float32) + off[:, 0]
    return xs, ys, ls, contrast, keep


def _patch_offsets(n: int) -> jnp.ndarray:
    lin = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n - 0.5
    gx, gy = jnp.meshgrid(lin, lin, indexing="xy")
    return jnp.stack([gx.ravel(), gy.ravel()], axis=1)


def _sample_stack(stack_flat: jnp.ndarray, h: int, w: int,
                  layer: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Bilinear sample a flattened (S*H*W,) stack at per-keypoint layers.

    layer: (K,) int32; x, y: (K, P) float coords. One linearized gather per
    bilinear tap.
    """
    x = jnp.clip(x, 0.0, w - 1.001)
    y = jnp.clip(y, 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    base = (layer * (h * w))[:, None]
    i00 = base + y0 * w + x0
    v00 = _flat_gather(stack_flat, i00)
    v01 = _flat_gather(stack_flat, i00 + 1)
    v10 = _flat_gather(stack_flat, i00 + w)
    v11 = _flat_gather(stack_flat, i00 + w + 1)
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


def _sample_gradients(grad_stack: jnp.ndarray,
                      layer: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Bilinear-sample both gradient channels.

    grad_stack: (2, S, H, W) with dx/dy leading. Measured on hardware:
    XLA gather throughput is bound by ELEMENTS fetched (~50M/s), not index
    count — block gathers (slice_sizes (1,2,2)) ran 30x SLOWER (layout
    handling), and 2-wide 1-D slices bought nothing. Plain linearized
    jnp.take per bilinear tap is the fastest XLA formulation; the next
    step-change needs a Pallas window-DMA kernel (see ops/pallas_sample).
    Returns (gx, gy), each (K, P).
    """
    _, s, h, w = grad_stack.shape
    x = jnp.clip(x, 0.0, w - 1.001)
    y = jnp.clip(y, 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    base = (layer * (h * w))[:, None] + y0 * w + x0

    def chan(flat):
        v00 = jnp.take(flat, base, axis=0).astype(jnp.float32)
        v01 = jnp.take(flat, base + 1, axis=0).astype(jnp.float32)
        v10 = jnp.take(flat, base + w, axis=0).astype(jnp.float32)
        v11 = jnp.take(flat, base + w + 1, axis=0).astype(jnp.float32)
        return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
                + fy * ((1 - fx) * v10 + fx * v11))

    return (chan(grad_stack[0].reshape(-1)),
            chan(grad_stack[1].reshape(-1)))


# static descriptor-binning constants ---------------------------------

def _static_desc_bins():
    """Row/col trilinear one-hots are keypoint-independent: (P, 16)."""
    P = DESC_SAMPLES
    offs = np.asarray(_patch_offsets(P))
    win = DESC_SCL_FCTR * (DESC_D + 1)
    ox = offs[:, 0] * win
    oy = offs[:, 1] * win
    wgt = np.exp(-(ox ** 2 + oy ** 2)
                 / (2 * (0.5 * DESC_D * DESC_SCL_FCTR) ** 2))

    def lin_onehot(binf, n):
        b0 = np.floor(binf).astype(int)
        f = binf - b0
        oh = np.zeros((len(binf), n), np.float32)
        for i, (b, ff) in enumerate(zip(b0, f)):
            if 0 <= b < n:
                oh[i, b] += 1 - ff
            if 0 <= b + 1 < n:
                oh[i, b + 1] += ff
        return oh

    rbin = oy / DESC_SCL_FCTR + DESC_D / 2 - 0.5
    cbin = ox / DESC_SCL_FCTR + DESC_D / 2 - 0.5
    ohr = lin_onehot(rbin, DESC_D)            # (P*P, 4)
    ohc = lin_onehot(cbin, DESC_D)
    # combined spatial one-hot weighted by the Gaussian window: (P*P, 16)
    rc = (ohr[:, :, None] * ohc[:, None, :]).reshape(len(ox), -1)
    rc = rc * wgt[:, None]
    return (jnp.asarray(ox.astype(np.float32)),
            jnp.asarray(oy.astype(np.float32)),
            jnp.asarray(rc.astype(np.float32)))


_DESC_OX, _DESC_OY, _DESC_RC = _static_desc_bins()

# cv2-compatible orientation-bin direction. OpenCV computes descriptor
# gradients y-UP (dy = row_above - row_below) but stores keypoint angles
# flipped (kpt.angle = 360 - peak), so its stored angles equal our y-down
# ones while its orientation bins run the OPPOSITE way around the circle:
# cv2_bin o == our_bin (-o) % 8. Reversing whole histogram columns after
# trilinear accumulation is exactly equivalent to accumulating with the
# flipped bin index (the splat pair (f, f+1) maps onto the reversed pair
# bin-for-bin), so this one gather makes the native layout byte-
# compatible with reference-produced cv2.SIFT descriptors
# (traditional_detectors.py:16-52; verified empirically: mean pearson
# 0.97 on co-located keypoints vs cv2, tests/test_sift.py interop test).
_OBIN_REV = (-np.arange(8)) % 8


def _orientation_from_samples(gx, gy, offs):
    """Dominant orientation from (K, P) gradient samples."""
    mag = jnp.sqrt(gx * gx + gy * gy)
    ori = jnp.arctan2(gy, gx)
    r2 = jnp.sum(offs ** 2, axis=1)
    wgt = jnp.exp(-r2 / (2.0 * ORI_SIG_FCTR ** 2))[None, :]
    bin_f = (ori / (2 * jnp.pi) + 0.5) * ORI_BINS
    b0 = jnp.floor(bin_f).astype(jnp.int32) % ORI_BINS
    frac = bin_f - jnp.floor(bin_f)
    w_all = mag * wgt
    oh0 = jax.nn.one_hot(b0, ORI_BINS, dtype=w_all.dtype)
    oh1 = jax.nn.one_hot((b0 + 1) % ORI_BINS, ORI_BINS, dtype=w_all.dtype)
    hist = jnp.einsum("kp,kpb->kb", w_all * (1 - frac), oh0) + \
           jnp.einsum("kp,kpb->kb", w_all * frac, oh1)

    def smooth(hh):
        return (6 * hh + 4 * (jnp.roll(hh, 1, -1) + jnp.roll(hh, -1, -1))
                + (jnp.roll(hh, 2, -1) + jnp.roll(hh, -2, -1))) / 16.0

    hist = smooth(smooth(hist))
    pk = jnp.argmax(hist, axis=1)
    kidx = jnp.arange(hist.shape[0])
    hl = hist[kidx, (pk - 1) % ORI_BINS]
    hc = hist[kidx, pk]
    hr = hist[kidx, (pk + 1) % ORI_BINS]
    denom = hl - 2 * hc + hr
    safe = jnp.abs(denom) > 1e-12
    dbin = jnp.where(safe, 0.5 * (hl - hr) / jnp.where(safe, denom, 1.0), 0.0)
    return (((pk.astype(jnp.float32) + dbin) % ORI_BINS) / ORI_BINS - 0.5) \
        * 2 * jnp.pi


def _descriptor_from_samples(gx, gy, angle):
    """(K, 128) from (K, 256) rotated-patch gradient samples."""
    mag = jnp.sqrt(gx * gx + gy * gy)
    ori = jnp.arctan2(gy, gx) - angle[:, None]
    obin = (ori / (2 * jnp.pi) % 1.0) * DESC_B
    b0 = jnp.floor(obin).astype(jnp.int32) % DESC_B
    f = obin - jnp.floor(obin)
    oh0 = jax.nn.one_hot(b0, DESC_B, dtype=mag.dtype)
    oh1 = jax.nn.one_hot((b0 + 1) % DESC_B, DESC_B, dtype=mag.dtype)
    t = mag[..., None] * (oh0 * (1 - f)[..., None] + oh1 * f[..., None])
    # contract samples against the static spatial one-hot: (K,P,8),(P,16)
    # then reverse the orientation-bin direction to cv2's (_OBIN_REV)
    desc = jnp.einsum("kpo,pg->kgo", t, _DESC_RC)[:, :, _OBIN_REV]
    desc = desc.reshape(mag.shape[0], -1)
    norm = jnp.linalg.norm(desc, axis=1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-12)
    desc = jnp.minimum(desc, DESC_MAG_THR)
    norm = jnp.linalg.norm(desc, axis=1, keepdims=True)
    return 512.0 * desc / jnp.maximum(norm, 1e-12)


@functools.partial(jax.jit, static_argnames=("max_features", "upscale",
                                              "sampler"))
def detect_and_compute(img: jnp.ndarray, max_features: int = 2048,
                       contrast_threshold: float = 0.04,
                       edge_threshold: float = 10.0,
                       upscale: bool = False,
                       sampler: str = "auto"):
    """Full SIFT. img: (H, W) float32 in [0, 1]. Returns array bundle
    (xy, response, scale, angle, desc, mask) with capacity max_features.

    sampler: "xla" (linearized-gather sampling, 12x12/9x9 grids),
    "pallas" (window-DMA dense kernel, ops/pallas_sample.py), or "auto"
    (pallas on TPU — gathers are element-bound there — else xla)."""
    if sampler == "auto":
        sampler = "pallas" if jax.default_backend() == "tpu" else "xla"
    if upscale:
        img = jax.image.resize(img, (img.shape[0] * 2, img.shape[1] * 2),
                               "linear")
    h0, w0 = img.shape
    n_oct = num_octaves(h0, w0)
    sig_diff = math.sqrt(max(SIGMA0 ** 2 -
                             (2 * INIT_SIGMA if upscale else INIT_SIGMA) ** 2,
                             0.01))
    base = gaussian_blur_matmul(img, sig_diff)

    ori_offs = _patch_offsets(ORI_SAMPLES) * 2.0 * ORI_RADIUS_FCTR
    all_parts = []
    cur = base
    for o in range(n_oct):
        gauss = _gaussian_pyramid(cur)          # (S+3, h, w)
        sh, hh, wh = gauss.shape[0] - 1, gauss.shape[1], gauss.shape[2]
        dog = gauss[1:] - gauss[:-1]
        ext = _dog_extrema_mask(dog, contrast_threshold)

        cap = max(128, (max_features * 5 // 8) >> o)  # candidate budget: the
        # final global top-K keeps max_features across octaves, so per-
        # octave candidates can be tighter than max_features (descriptor
        # sampling cost scales directly with the candidate count)
        score = jnp.where(ext, jnp.abs(dog), 0.0).reshape(-1)
        k_cap = min(cap, score.shape[0])
        # TPU-native approximate partial top-k for candidate selection
        vals, idx = lax.approx_max_k(score, k_cap, recall_target=0.95)
        cand_ok = vals > 0.0
        sel_s = idx // (hh * wh)
        rem = idx % (hh * wh)
        sel_y = rem // wh
        sel_x = rem % wh

        xs, ys, ls, contrast, keep = _refine_candidates(
            dog, sel_s, sel_y, sel_x, contrast_threshold, edge_threshold)
        keep &= cand_ok

        scl_oct = SIGMA0 * jnp.exp2(ls / N_LAYERS)
        layer_idx = jnp.clip(jnp.round(ls).astype(jnp.int32), 1, N_LAYERS)
        # central differences as slice-diff + zero pad (zero borders keep
        # descriptor windows of near-border keypoints from sampling
        # opposite-edge pixels). Written pad-of-slices rather than
        # roll+border-set: lane-axis rolls force relayout copies on TPU.
        dx_stack = jnp.pad(
            0.5 * (gauss[:, :, 2:] - gauss[:, :, :-2]),
            ((0, 0), (0, 0), (1, 1)))
        dy_stack = jnp.pad(
            0.5 * (gauss[:, 2:, :] - gauss[:, :-2, :]),
            ((0, 0), (1, 1), (0, 0)))

        # reject keypoints whose descriptor support is mostly outside the
        # image: their zero-padded descriptors are non-distinctive and form
        # spurious ratio-test matches (ADVICE r1; OpenCV skips out-of-image
        # samples, and frame-edge keypoints rarely survive its border gates)
        rdesc = DESC_SCL_FCTR * (DESC_D + 1) * 0.5 * math.sqrt(2.0) * scl_oct
        keep &= (jnp.minimum(xs, wh - 1 - xs) >= 0.45 * rdesc) \
            & (jnp.minimum(ys, hh - 1 - ys) >= 0.45 * rdesc)

        # Compact candidates before sampling: refinement kills most
        # approx_max_k slots (measured ~13% survive on the bench images)
        # yet every slot costs a sampler grid step (pallas) or gather row
        # (xla) — empty grid steps alone were ~60% of detect time. Keep
        # the top half by refined contrast among survivors; an octave
        # with more valid keypoints than the compacted budget sheds its
        # weakest early — the same policy the global top-K applies
        # across octaves afterwards. (approx_max_k, not lax.top_k: exact
        # top-k is a measured dead end on TPU, CLAUDE.md.)
        cap_c = max(64, k_cap // 2)
        if cap_c < k_cap:
            cscore = jnp.where(keep, jnp.abs(contrast), 0.0)
            _, cidx = lax.approx_max_k(cscore, cap_c, recall_target=0.95)
            keep = keep[cidx] & (cscore[cidx] > 0.0)
            xs, ys, ls = xs[cidx], ys[cidx], ls[cidx]
            contrast = contrast[cidx]
            scl_oct = scl_oct[cidx]
            layer_idx = layer_idx[cidx]

        if sampler == "pallas":
            # window-DMA dense kernel: one DMA per keypoint, no gathers
            from tpu3drec.ops.pallas_sample import (
                ori_desc_windows, prep_meta, pad_dims)
            hp, wp = pad_dims(hh, wh)
            dxp, dyp = dx_stack, dy_stack
            if (hp, wp) != (hh, wh):
                dxp = jnp.pad(dxp, ((0, 0), (0, hp - hh), (0, wp - wh)))
                dyp = jnp.pad(dyp, ((0, 0), (0, hp - hh), (0, wp - wh)))
            imeta, dims = prep_meta(xs, ys, layer_idx, scl_oct,
                                    keep, hp, wp, hh, wh)
            angle, desc = ori_desc_windows(
                dxp.astype(jnp.bfloat16), dyp.astype(jnp.bfloat16),
                imeta, dims)
        else:
            # bf16 gradient storage: sampling is gather-bandwidth bound and
            # the orientation/descriptor histograms are insensitive to the
            # mantissa (verified: identical GT-warp match sets vs f32)
            grad_stack = jnp.stack([dx_stack, dy_stack],
                                   axis=0).astype(jnp.bfloat16)  # (2,S,H,W)

            # orientation
            px = xs[:, None] + ori_offs[None, :, 0] * scl_oct[:, None]
            py = ys[:, None] + ori_offs[None, :, 1] * scl_oct[:, None]
            gx, gy = _sample_gradients(grad_stack, layer_idx, px, py)
            angle = _orientation_from_samples(gx, gy, ori_offs)

            # descriptor
            ca, sa = jnp.cos(angle), jnp.sin(angle)
            pxd = xs[:, None] + (ca[:, None] * _DESC_OX[None]
                                 - sa[:, None] * _DESC_OY[None]) * scl_oct[:, None]
            pyd = ys[:, None] + (sa[:, None] * _DESC_OX[None]
                                 + ca[:, None] * _DESC_OY[None]) * scl_oct[:, None]
            gxd, gyd = _sample_gradients(grad_stack, layer_idx, pxd, pyd)
            desc = _descriptor_from_samples(gxd, gyd, angle)

        factor = (2.0 ** o) * (0.5 if upscale else 1.0)
        all_parts.append(dict(
            xy=jnp.stack([xs * factor, ys * factor], axis=1),
            response=jnp.abs(contrast),
            scale=scl_oct * factor * 2.0,
            angle=angle,
            desc=desc,
            mask=keep,
        ))
        if o + 1 < n_oct:
            cur = downsample2(gauss[N_LAYERS])

    merged = {k: jnp.concatenate([p[k] for p in all_parts], axis=0)
              for k in all_parts[0]}
    score = jnp.where(merged["mask"], merged["response"], -jnp.inf)
    # small images can yield fewer candidates than max_features (per-octave
    # budgets shrink with octave count) — keep the static-shape contract by
    # top-k'ing what exists and padding to capacity with mask=False rows
    k = min(max_features, score.shape[0])
    if k == score.shape[0]:
        # nothing to select — every candidate slot fits the feature
        # budget (the compacted per-octave caps usually sum below
        # max_features), so lax.top_k would be a full sort that keeps
        # everything. Downstream consumers are order-invariant (masked
        # reductions; Features.top_k re-sorts when a caller asks).
        out = dict(merged)
    else:
        _, order = lax.top_k(score, k)
        out = {key: v[order] for key, v in merged.items()}
        out["mask"] = out["mask"] & (score[order] > -jnp.inf)
    if k < max_features:
        pad = max_features - k
        out = {key: jnp.concatenate(
            [v, jnp.zeros((pad,) + v.shape[1:], v.dtype)], axis=0)
            for key, v in out.items()}
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


def _bilinear_many(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Bilinear sample of a (H, W) image at arbitrary-shaped x, y arrays
    (linearized 1-D gathers)."""
    h, w = img.shape
    flat = img.reshape(-1)
    x = jnp.clip(x, 0.0, w - 1.001)
    y = jnp.clip(y, 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    i00 = y0 * w + x0
    v00 = jnp.take(flat, i00, axis=0)
    v01 = jnp.take(flat, i00 + 1, axis=0)
    v10 = jnp.take(flat, i00 + w, axis=0)
    v11 = jnp.take(flat, i00 + w + 1, axis=0)
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


@functools.partial(jax.jit)
def describe_at_points(img: jnp.ndarray, xy: jnp.ndarray,
                       mask: jnp.ndarray, patch_scale: float = 2.0):
    """SIFT descriptors + orientations at given points at a fixed scale
    (used by Harris/GFTT, reference traditional_detectors.py:166-287).
    Returns (desc (K, 128), angle (K,))."""
    blur = gaussian_blur_matmul(img, SIGMA0)
    # slice-diff + zero pad (not roll: lane-axis rolls relayout on TPU;
    # also the old wraparound sampled opposite-edge pixels at the border)
    dx = jnp.pad(0.5 * (blur[:, 2:] - blur[:, :-2]), ((0, 0), (1, 1)))
    dy = jnp.pad(0.5 * (blur[2:, :] - blur[:-2, :]), ((1, 1), (0, 0)))
    scl = jnp.full((xy.shape[0],), patch_scale, jnp.float32)
    ori_offs = _patch_offsets(ORI_SAMPLES) * 2.0 * ORI_RADIUS_FCTR
    px = xy[:, 0:1] + ori_offs[None, :, 0] * scl[:, None]
    py = xy[:, 1:2] + ori_offs[None, :, 1] * scl[:, None]
    gx = _bilinear_many(dx, px, py)
    gy = _bilinear_many(dy, px, py)
    angle = _orientation_from_samples(gx, gy, ori_offs)
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    pxd = xy[:, 0:1] + (ca[:, None] * _DESC_OX[None]
                        - sa[:, None] * _DESC_OY[None]) * scl[:, None]
    pyd = xy[:, 1:2] + (sa[:, None] * _DESC_OX[None]
                        + ca[:, None] * _DESC_OY[None]) * scl[:, None]
    gxd = _bilinear_many(dx, pxd, pyd)
    gyd = _bilinear_many(dy, pxd, pyd)
    desc = _descriptor_from_samples(gxd, gyd, angle)
    return desc * mask[:, None], jnp.where(mask, angle, 0.0)
