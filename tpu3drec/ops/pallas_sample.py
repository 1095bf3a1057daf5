"""Pallas window-DMA orientation+descriptor kernel for SIFT.

The XLA sampling path (ops/sift.py:_sample_gradients) is bound by gather
element throughput (~150M elements/s on v5e): at 2K keypoints it fetches
~4.5M elements per image (~30 ms) for the orientation and descriptor
stages. This kernel replaces every gather with one window DMA per
keypoint, computing both stages densely over the window pixels — which is
OpenCV's own formulation (calcOrientationHist / calcSIFTDescriptor
iterate window *pixels*, not sample points; reference behavior:
traditional_detectors.py:16-52 via cv2.SIFT).

Design (hardware constraints shape everything — see CLAUDE.md):
  - HBM DMA slices must be tile-aligned: window origins are quantized
    to (8, 128) multiples and the DMA'd (96, 256) window is re-centred
    on the keypoint with an 8-aligned dynamic row slice + dynamic lane
    roll (f32 — rotate has no bf16 lowering), yielding an (88, 128)
    core with the keypoint at rows [40, 48), lane 64. Margins cover the
    max descriptor radius 10.6*scl at scl<=3.6 (+-39 px).
  - orientation: 36-bin histogram over a keypoint-centred 56-row band
    (its own aligned window read — a static core slice would miss
    edge-clipped keypoints); smoothing/argmax/parabola run as unrolled
    scalar chains.
  - descriptor: per-pixel orientation tents split the window into 8
    channels; each channel is 4x4 box-downsampled with two small MXU
    matmuls (iota-built 0/1 matrices); the 8 coarse (22, 32) channel
    grids are lane-packed into one (22, 256) tile so each of the 16
    spatial bins needs one elementwise product + one MXU segment matmul
    instead of 8 full-tile reductions.
  - per-keypoint scalars ride in FLAT 1-D SMEM prefetch arrays (2-D SMEM
    operands pad every row to 128 lanes and blow the 1 MB SMEM budget).
  - masked (invalid) keypoints skip DMA and compute entirely.
  - no atan2/atan lowering in Mosaic: minimax-polynomial atan2.
  - descriptor normalization and (rc, o) flattening run OUTSIDE the
    kernel in XLA (cheap, vectorized over keypoints).

Semantics track ops/sift.py's XLA path (same constants, histogram
smoothing, trilinear binning, normalization); the 12x12/9x9 sample grids
become the dense pixel formulation with 4x4 box prefilter.
`oracle_ori_desc` is the NumPy mirror used by the parity tests.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu3drec.ops.sift import (
    ORI_BINS, ORI_SIG_FCTR, ORI_RADIUS_FCTR,
    DESC_D, DESC_B, DESC_SCL_FCTR, DESC_MAG_THR,
    _OBIN_REV as _OBIN_REV_NP,
)

WIN_H = 96     # DMA window rows (multiple of 8)
WIN_W = 256    # DMA window lanes (multiple of 128)
# VMEM dynamic row reads must start at multiples of 8, so the core/band
# row offsets are 8-quantized and the keypoint lands at core row
# [40, 48) / band row [28, 36); heights leave >=40 / >=20 px margins,
# covering the max descriptor radius 10.6*scl (+-39 px at scl<=3.6) and
# orientation radius 4.5*scl (+-17 px)
CORE_H = 88    # compute core rows
CORE_W = 128   # compute core lanes; keypoint always at lane 64
ORI_R0 = 12    # oracle-side band offset (keypoint at oracle core row 40)
ORI_H = 56     # band height (multiple of 8)
CELL = 4       # box-downsample factor for the descriptor grid
CH, CW = CORE_H // CELL, CORE_W // CELL  # coarse grid (22, 32)


def _atan2_poly(y, x, np_=jnp):
    """atan2 via odd minimax polynomial (no Mosaic atan lowering); max
    error ~1.4e-5 rad, far below the 10 deg orientation bin width."""
    ax = np_.abs(x)
    ay = np_.abs(y)
    den = np_.maximum(np_.maximum(ax, ay), 1e-30)
    z = np_.minimum(ax, ay) / den
    z2 = z * z
    r = z * (0.99997726 + z2 * (-0.33262347 + z2 * (0.19354346
             + z2 * (-0.11643287 + z2 * (0.05265332 + z2 * -0.01172120)))))
    r = np_.where(ay > ax, 0.5 * math.pi - r, r)
    r = np_.where(x < 0, math.pi - r, r)
    return np_.where(y < 0, -r, r)


# ---------------------------------------------------------------------
# NumPy oracle (defines the math; the kernel mirrors it step for step)
# ---------------------------------------------------------------------

def _row_starts(ryi: int, hp: int):
    """Kernel-identical 8-quantized window/core/band row starts."""
    y0 = min(max(((ryi - 44) // 8) * 8, 0), hp - WIN_H)
    yoff = ryi - y0
    row0 = min(max(((yoff - 40) // 8) * 8, 0), WIN_H - CORE_H)
    row0b = min(max(((yoff - ORI_H // 2) // 8) * 8, 0), WIN_H - ORI_H)
    return y0 + row0, y0 + row0b


def _window(img: np.ndarray, xs0: int, ys0: int, rows: int):
    """(rows, 128) slab, zero-padded outside the image."""
    h, w = img.shape
    out = np.zeros((rows, CORE_W), np.float32)
    for i in range(rows):
        yy = ys0 + i
        if 0 <= yy < h:
            xlo, xhi = max(0, xs0), min(w, xs0 + CORE_W)
            if xlo < xhi:
                out[i, xlo - xs0:xhi - xs0] = img[yy, xlo:xhi]
    return out


def oracle_ori_desc(dx_img: np.ndarray, dy_img: np.ndarray,
                    x: float, y: float, scl: float,
                    hp: int = 1 << 20):
    """Dense orientation + descriptor for ONE keypoint from full-res
    (H, W) f32 gradient images. Returns (angle, desc[128]). `hp` is the
    padded stack height (affects edge-clipped row quantization only)."""
    rxi, ryi = int(round(x)), int(round(y))
    ys0, _ = _row_starts(ryi, hp)
    xs0 = rxi - 64
    dx = _window(dx_img, xs0, ys0, CORE_H)
    dy = _window(dy_img, xs0, ys0, CORE_H)

    ii, jj = np.mgrid[0:CORE_H, 0:CORE_W].astype(np.float32)
    rx = (xs0 + jj) - x
    ry = (ys0 + ii) - y
    mag = np.sqrt(dx * dx + dy * dy)
    theta = _atan2_poly(dy, dx, np_=np)

    # --- orientation histogram over the keypoint-centred band
    b0r = _row_starts(ryi, hp)[1] - ys0
    band = slice(b0r, b0r + ORI_H)
    u = rx[band] / scl
    v = ry[band] / scl
    m = (np.abs(u) <= ORI_RADIUS_FCTR) & (np.abs(v) <= ORI_RADIUS_FCTR)
    wgt = np.exp(-(u * u + v * v) / (2.0 * ORI_SIG_FCTR ** 2)) * m
    binf = (theta[band] / (2 * np.pi) + 0.5) * ORI_BINS
    b0 = np.floor(binf)
    frac = binf - b0
    b0 = b0.astype(np.int64) % ORI_BINS
    w_all = mag[band] * wgt
    hist = np.zeros(ORI_BINS, np.float32)
    np.add.at(hist, b0, w_all * (1 - frac))
    np.add.at(hist, (b0 + 1) % ORI_BINS, w_all * frac)

    def smooth(hh):
        return (6 * hh + 4 * (np.roll(hh, 1) + np.roll(hh, -1))
                + (np.roll(hh, 2) + np.roll(hh, -2))) / 16.0

    hist = smooth(smooth(hist))
    pk = int(np.argmax(hist))
    hl, hc, hr = hist[(pk - 1) % ORI_BINS], hist[pk], hist[(pk + 1) % ORI_BINS]
    denom = hl - 2 * hc + hr
    dbin = 0.5 * (hl - hr) / denom if abs(denom) > 1e-12 else 0.0
    angle = (((pk + dbin) % ORI_BINS) / ORI_BINS - 0.5) * 2 * np.pi

    # --- descriptor: 8 orientation channels, 4x4 box cells, tent binning
    ca, sa = np.cos(angle), np.sin(angle)
    hw = DESC_SCL_FCTR * scl
    ud = (ca * rx + sa * ry) / hw
    vd = (-sa * rx + ca * ry) / hw
    wd = np.exp(-(ud * ud + vd * vd) / (2 * (0.5 * DESC_D) ** 2))
    okb = (vd + 1.5 > -1) & (vd + 1.5 < DESC_D) \
        & (ud + 1.5 > -1) & (ud + 1.5 < DESC_D)
    trot = theta - angle
    obin = (trot / (2 * np.pi) % 1.0) * DESC_B
    magw = mag * wd * okb

    chans = np.zeros((DESC_B, CORE_H, CORE_W), np.float32)
    for o in range(DESC_B):
        d = np.abs(obin - o)
        chans[o] = magw * np.maximum(0.0, 1.0 - np.minimum(d, DESC_B - d))
    # 4x4 box downsample
    coarse = chans.reshape(DESC_B, CH, CELL, CW, CELL).sum(axis=(2, 4))

    # cell-centre bins
    icc, jcc = np.mgrid[0:CH, 0:CW].astype(np.float32)
    rx_c = (xs0 + CELL * jcc + 0.5 * (CELL - 1)) - x
    ry_c = (ys0 + CELL * icc + 0.5 * (CELL - 1)) - y
    ud_c = (ca * rx_c + sa * ry_c) / hw
    vd_c = (-sa * rx_c + ca * ry_c) / hw
    rbin = vd_c + DESC_D / 2 - 0.5
    cbin = ud_c + DESC_D / 2 - 0.5

    desc = np.zeros((DESC_D * DESC_D, DESC_B), np.float32)
    for r in range(DESC_D):
        tr = np.maximum(0.0, 1.0 - np.abs(rbin - r))
        for c in range(DESC_D):
            tc = np.maximum(0.0, 1.0 - np.abs(cbin - c))
            for o in range(DESC_B):
                desc[r * DESC_D + c, o] = np.sum(tr * tc * coarse[o])
    desc = desc[:, _OBIN_REV_NP].reshape(-1)   # cv2 bin direction
    desc = desc / max(np.linalg.norm(desc), 1e-12)
    desc = np.minimum(desc, DESC_MAG_THR)
    desc = 512.0 * desc / max(np.linalg.norm(desc), 1e-12)
    return float(angle), desc.astype(np.float32)


# ---------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------

_STAGES = "all"  # trace-time knob for perf bisection: all|ori|desc|dma
_DMA_MODE = "dyn"  # dyn | static (fixed origin) | none (skip DMA)
GROUP = 8  # keypoints per grid step — amortizes the ~0.7 us/step grid
           # overhead that dominated at realistic ~13% slot validity


def frac_bits(hp: int, wp: int) -> int:
    """Static fixed-point fraction bits for the 16-bit (x, y) meta pack:
    the largest fb <= 6 with 2**(16-fb) >= max(hp, wp), so every coord in
    the padded stack fits losslessly (ADVICE r2: a fixed fb=6 silently
    saturated coords at 1023.98 px on >1024-px images). Resolution stays
    >= 1/2 px up to 32K-px images — far below the detector's ~0.1 px
    subpixel accuracy for any realistic size."""
    m = max(hp, wp)
    if m > 32768:
        raise ValueError(f"image dim {m} exceeds the 16-bit meta pack")
    return max(1, min(6, 16 - (m - 1).bit_length()))


def _dcb_matrix() -> np.ndarray:
    """Block-diagonal lane-downsample matrix kron(I_8, Dc): (8*CORE_W,
    8*CW) f32, built ONCE in numpy and passed to the kernel as a
    VMEM-resident input (constant index map -> fetched once) — an
    iota build inside the kernel would cost ~1.3M VPU ops per grid
    step with no guarantee Mosaic hoists it."""
    ac = np.arange(DESC_B * CORE_W)[:, None]
    bc = np.arange(DESC_B * CW)[None, :]
    return ((ac // CORE_W == bc // CW)
            & (ac % CORE_W // CELL == bc % CW)).astype(np.float32)


_DCB_NP = _dcb_matrix()


def _ori_desc_kernel(fb, imeta_ref, dims_ref, dxs_ref, dys_ref, dcb_ref,
                     angle_ref, desc_ref, win_ref, sem_ref):
    # meta arrays ride flattened (2-D SMEM operands are padded to 128
    # lanes per row) and SLIM: [lv | sclq << 16, xy_pack] two int32 =
    # 8 B per keypoint (scale rides as 1/1024 fixed point in the high
    # half-word — r2 #7: the f32 scale array was the blocker for batch
    # 96, which needs <= 8.5 B/kpt to fit the 1 MB SMEM budget that
    # counts ALL prefetch operands together). Window origins are
    # re-derived in-kernel from the fixed-point (x, y) — scalar ALU is
    # free next to the DMA it gates. `fb` is the static per-shape-bucket
    # fraction-bit count (frac_bits).
    g = pl.program_id(0)
    ng = pl.num_programs(0)
    _, hp, wp = dxs_ref.shape
    half = 1 << (fb - 1)
    inv_scale = 1.0 / (1 << fb)
    slot = jax.lax.rem(g, 2)

    def _coords(j):
        """(xq, yq) 1/2**fb-px fixed-point coords of keypoint j."""
        pack = imeta_ref[2 * j + 1]
        xq = pack & 0xFFFF
        yq = (pack >> 16) & 0xFFFF
        return xq, yq

    def _origin(j):
        """8/128-aligned window origin for keypoint j (prep_meta math)."""
        xq, yq = _coords(j)
        rxi_j = (xq + half) >> fb     # round(x)
        ryi_j = (yq + half) >> fb
        x0j = pl.multiple_of(
            jnp.clip(((rxi_j - 64) // 128) * 128, 0, wp - WIN_W), 128)
        y0j = pl.multiple_of(
            jnp.clip(((ryi_j - 44) // 8) * 8, 0, hp - WIN_H), 8)
        return x0j, y0j

    def _dma_pair(j, s, u):
        """The two window copies for keypoint j into slot s, lane u."""
        if _DMA_MODE == "static":
            layj = 0
            y0j = 0
            x0j = 0
        else:
            x0j, y0j = _origin(j)
            layj = (imeta_ref[2 * j] & 0xFFFF) - 1
        src = (dxs_ref.at[layj, pl.ds(y0j, WIN_H), pl.ds(x0j, WIN_W)],
               dys_ref.at[layj, pl.ds(y0j, WIN_H), pl.ds(x0j, WIN_W)])
        return [pltpu.make_async_copy(src[ch], win_ref.at[s, u, ch],
                                      sem_ref.at[s, u, ch])
                for ch in (0, 1)]

    if _DMA_MODE != "none":
        # double buffering at GROUP granularity: step g-1 already
        # started slot g%2 for this group; we start slot (g+1)%2 for
        # group g+1 before computing, so the next GROUP windows stream
        # in under our compute. Nested pl.when guards keep every SMEM
        # read in-bounds (ADVICE r2: traced & has no short-circuit).
        @pl.when(g == 0)
        def _():
            for u0 in range(GROUP):
                @pl.when((imeta_ref[2 * u0] & 0xFFFF) > 0)
                def _(u0=u0):
                    for cp in _dma_pair(u0, 0, u0):
                        cp.start()

        @pl.when(g + 1 < ng)
        def _():
            s_nxt = jax.lax.rem(g + 1, 2)
            for u0 in range(GROUP):
                idx = (g + 1) * GROUP + u0
                look = jnp.minimum(2 * idx, 2 * ng * GROUP - 2)

                @pl.when(imeta_ref[look] > 0)
                def _(u0=u0, idx=idx):
                    for cp in _dma_pair(idx, s_nxt, u0):
                        cp.start()

    angle_ref[...] = jnp.zeros_like(angle_ref)
    desc_ref[...] = jnp.zeros_like(desc_ref)


    for u in range(GROUP):
        k = g * GROUP + u          # keypoint index; in-bounds (K padded)
        meta0 = imeta_ref[2 * k]
        valid = meta0 & 0xFFFF

        @pl.when(valid > 0)
        def _(u=u, k=k, meta0=meta0):
            x0, y0 = _origin(k)
            xq, yq = _coords(k)
            x = xq.astype(jnp.float32) * inv_scale
            y = yq.astype(jnp.float32) * inv_scale
            scl = ((meta0 >> 16) & 0xFFFF).astype(jnp.float32) * (1.0 / 1024.0)
            w_real = dims_ref[0]
            h_real = dims_ref[1]

            if _DMA_MODE != "none":
                for cp in _dma_pair(k, slot, u):
                    cp.wait()

            # same fixed-point rounding as _origin (jnp.round's half-even
            # could disagree by 1 at exact half-pixels)
            rxi_i = (xq + half) >> fb
            ryi_i = (yq + half) >> fb
            rxi = rxi_i.astype(jnp.float32)
            ryi = ryi_i.astype(jnp.float32)
            # keypoint offset inside the DMA window
            xoff = rxi_i - x0
            yoff = ryi_i - y0
            # 8-quantized so the dynamic VMEM row read is provably aligned
            row0 = pl.multiple_of(
                jnp.clip(((yoff - 40) // 8) * 8, 0, WIN_H - CORE_H), 8)
            lshift = xoff - 64  # lanes to rotate left

            def center(ch):
                rows = win_ref[slot, u, ch, pl.ds(row0, CORE_H), :]  # (88, 256)
                # dynamic rotate is 32-bit only: widen before rolling
                rolled = pltpu.roll(rows.astype(jnp.float32), -lshift, 1)
                return rolled[:, :CORE_W]                         # (88, 128)

            dx = center(0)
            dy = center(1)

            ii = lax.broadcasted_iota(jnp.int32, (CORE_H, CORE_W), 0)
            jj = lax.broadcasted_iota(jnp.int32, (CORE_H, CORE_W), 1)
            # absolute original-image coords; when the window origin was
            # clipped at an image edge the keypoint is NOT at (40, 64), so
            # every coordinate derives from y0+row0 / the roll, and masks
            # cover clipping, lane wrap and zero padding alike
            pxi = rxi.astype(jnp.int32) + (jj - 64)
            pyi = y0 + row0 + ii
            inside = ((pxi >= 0) & (pxi.astype(jnp.float32) < w_real)
                      & (pyi >= 0) & (pyi.astype(jnp.float32) < h_real))
            rx = pxi.astype(jnp.float32) - x
            ry = pyi.astype(jnp.float32) - y

            mag = jnp.sqrt(dx * dx + dy * dy) * inside.astype(jnp.float32)
            theta = _atan2_poly(dy, dx)

            # ---- orientation histogram: its own keypoint-centred band read
            # (a static slice of the core would miss edge-clipped keypoints)
            if _STAGES == "dma":
                angle_ref[u, :, :] = jnp.full((1, 128), jnp.sum(dx) + jnp.sum(dy), jnp.float32)
                return
            if _STAGES == "desc":
                angle = jnp.float32(0.3)
            else:
                row0b = pl.multiple_of(
                    jnp.clip(((yoff - ORI_H // 2) // 8) * 8, 0, WIN_H - ORI_H), 8)

                def center_band(ch):
                    rows = win_ref[slot, u, ch, pl.ds(row0b, ORI_H), :]
                    rolled = pltpu.roll(rows.astype(jnp.float32), -lshift, 1)
                    return rolled[:, :CORE_W]

                bdx = center_band(0)
                bdy = center_band(1)
                iib = lax.broadcasted_iota(jnp.int32, (ORI_H, CORE_W), 0)
                jjb = lax.broadcasted_iota(jnp.int32, (ORI_H, CORE_W), 1)
                pxb = rxi.astype(jnp.int32) + (jjb - 64)
                pyb = y0 + row0b + iib
                insideb = ((pxb >= 0) & (pxb.astype(jnp.float32) < w_real)
                           & (pyb >= 0) & (pyb.astype(jnp.float32) < h_real))
                magb = jnp.sqrt(bdx * bdx + bdy * bdy) * insideb.astype(jnp.float32)
                thetab = _atan2_poly(bdy, bdx)

                inv_scl = 1.0 / scl
                ub = (pxb.astype(jnp.float32) - x) * inv_scl
                vb = (pyb.astype(jnp.float32) - y) * inv_scl
                mb = ((jnp.abs(ub) <= ORI_RADIUS_FCTR)
                      & (jnp.abs(vb) <= ORI_RADIUS_FCTR)).astype(jnp.float32)
                wgt = jnp.exp(-(ub * ub + vb * vb)
                              / (2.0 * ORI_SIG_FCTR ** 2)) * mb
                binf = (thetab / (2 * math.pi) + 0.5) * ORI_BINS
                b0f = jnp.floor(binf)
                b0 = b0f.astype(jnp.int32) % ORI_BINS
                frac = binf - b0f
                w_all = magb * wgt
                w_lo = w_all * (1.0 - frac)
                w_hi = w_all * frac
                b1 = (b0 + 1) % ORI_BINS

                hist = []
                for j in range(ORI_BINS):
                    hist.append(jnp.sum(jnp.where(b0 == j, w_lo, 0.0)
                                        + jnp.where(b1 == j, w_hi, 0.0)))

                def smooth(hh):
                    n = ORI_BINS
                    return [(6 * hh[j] + 4 * (hh[(j - 1) % n] + hh[(j + 1) % n])
                             + hh[(j - 2) % n] + hh[(j + 2) % n]) / 16.0
                            for j in range(n)]

                hist = smooth(smooth(hist))

                best = hist[0]
                pk = jnp.int32(0)
                for j in range(1, ORI_BINS):
                    take = hist[j] > best
                    best = jnp.where(take, hist[j], best)
                    pk = jnp.where(take, jnp.int32(j), pk)
                hl = jnp.float32(0.0)
                hc = jnp.float32(0.0)
                hr = jnp.float32(0.0)
                for j in range(ORI_BINS):
                    sel = pk == j
                    hl = jnp.where(sel, hist[(j - 1) % ORI_BINS], hl)
                    hc = jnp.where(sel, hist[j], hc)
                    hr = jnp.where(sel, hist[(j + 1) % ORI_BINS], hr)
                denom = hl - 2 * hc + hr
                safe = jnp.abs(denom) > 1e-12
                dbin = jnp.where(safe,
                                 0.5 * (hl - hr) / jnp.where(safe, denom, 1.0), 0.0)
                angle = (((pk.astype(jnp.float32) + dbin) % ORI_BINS) / ORI_BINS
                         - 0.5) * 2 * math.pi
            if _STAGES == "ori":
                angle_ref[u, :, :] = jnp.full((1, 128), angle, jnp.float32)
                return

            # ---- descriptor
            ca = jnp.cos(angle)
            sa = jnp.sin(angle)
            inv_hw = 1.0 / (DESC_SCL_FCTR * scl)
            ud = (ca * rx + sa * ry) * inv_hw
            vd = (-sa * rx + ca * ry) * inv_hw
            wd = jnp.exp(-(ud * ud + vd * vd) / (2 * (0.5 * DESC_D) ** 2))
            okb = ((vd + 1.5 > -1) & (vd + 1.5 < DESC_D)
                   & (ud + 1.5 > -1) & (ud + 1.5 < DESC_D)).astype(jnp.float32)
            trot = theta - angle
            obin = (trot / (2 * math.pi) % 1.0) * DESC_B
            magw = mag * wd * okb

            # 8 orientation channels, lane-packed from the start: tile the
            # (88, 128) window 8x across lanes, one tent pass over (88, 1024)
            # with the channel id derived from the lane group, then TWO
            # matmuls box-downsample every channel at once — 2 MXU issues
            # instead of 8 tent passes + 16 tiny matmuls (the desc stage was
            # 60% of kernel time; op-issue count, not FLOPs, was the cost).
            # Dr (CH, CORE_H) and the block-diagonal DcB (8*CORE_W, 8*CW)
            # are iota-built 0/1 matrices.
            ar = lax.broadcasted_iota(jnp.int32, (CH, CORE_H), 0)
            br = lax.broadcasted_iota(jnp.int32, (CH, CORE_H), 1)
            Dr = (br // CELL == ar).astype(jnp.float32)
            WL = DESC_B * CORE_W
            och = lax.broadcasted_iota(jnp.int32, (CORE_H, WL), 1) // CORE_W
            obin_t = jnp.concatenate([obin] * DESC_B, axis=1)     # (88, 1024)
            magw_t = jnp.concatenate([magw] * DESC_B, axis=1)
            d = jnp.abs(obin_t - och.astype(jnp.float32))
            tent = jnp.maximum(0.0, 1.0 - jnp.minimum(d, DESC_B - d))
            X = magw_t * tent                                     # (88, 1024)
            c1 = jnp.dot(Dr, X, preferred_element_type=jnp.float32)
            packed = jnp.dot(c1, dcb_ref[...],
                             preferred_element_type=jnp.float32)

            # cell-centre spatial bins (same for every channel)
            icc = lax.broadcasted_iota(jnp.int32, (CH, DESC_B * CW), 0) \
                .astype(jnp.float32)
            jcc = (lax.broadcasted_iota(jnp.int32, (CH, DESC_B * CW), 1)
                   % CW).astype(jnp.float32)
            xbase = (rxi - 64.0)
            ybase = (y0 + row0).astype(jnp.float32)
            rx_c = (xbase + CELL * jcc + 0.5 * (CELL - 1)) - x
            ry_c = (ybase + CELL * icc + 0.5 * (CELL - 1)) - y
            ud_c = (ca * rx_c + sa * ry_c) * inv_hw
            vd_c = (-sa * rx_c + ca * ry_c) * inv_hw
            rbin = vd_c + (DESC_D / 2 - 0.5)
            cbin = ud_c + (DESC_D / 2 - 0.5)

            # segment matmul: (CH, 8*CW) @ (8*CW, 8) sums each channel's lanes
            sc = lax.broadcasted_iota(jnp.int32, (DESC_B * CW, DESC_B), 0)
            so = lax.broadcasted_iota(jnp.int32, (DESC_B * CW, DESC_B), 1)
            Seg = (sc // CW == so).astype(jnp.float32)

            # All 16 (r, c) spatial bins ride ONE stacked matmul: 16
            # separate (CH, 8*CW) @ (8*CW, 8) products were 32 tiny MXU
            # issues per keypoint (latency-, not FLOP-bound). The
            # row-group sum over CH is a second 0/1 segment matmul.
            prods = []
            for r in range(DESC_D):
                tr = jnp.maximum(0.0, 1.0 - jnp.abs(rbin - r))
                pr = packed * tr                                 # hoisted over c
                for c in range(DESC_D):
                    tc = jnp.maximum(0.0, 1.0 - jnp.abs(cbin - c))
                    prods.append(pr * tc)                        # (CH, 8*CW)
            big = jnp.concatenate(prods, axis=0)                 # (16*CH, 8*CW)
            per_ch = jnp.dot(big, Seg,
                             preferred_element_type=jnp.float32)  # (16*CH, 8)
            gr = lax.broadcasted_iota(jnp.int32, (DESC_D * DESC_D,
                                                  DESC_D * DESC_D * CH), 0)
            gc = lax.broadcasted_iota(jnp.int32, (DESC_D * DESC_D,
                                                  DESC_D * DESC_D * CH), 1)
            SegR = (gc // CH == gr).astype(jnp.float32)
            raw = jnp.dot(SegR, per_ch,
                          preferred_element_type=jnp.float32)    # (16, 8)

            desc_ref[u, :, :DESC_B] = raw
            angle_ref[u, :, :] = jnp.full((1, 128), angle, jnp.float32)


@jax.custom_batching.custom_vmap
def ori_desc_windows(dxs: jnp.ndarray, dys: jnp.ndarray,
                     imeta: jnp.ndarray, dims: jnp.ndarray):
    """Orientation + descriptor for K keypoints via window DMA.

    dxs, dys: (S, Hp, Wp) bf16 gradient stacks; Hp % 8 == 0, Hp >= WIN_H,
    Wp % 128 == 0, Wp >= WIN_W (zero-padded beyond the real image).
    imeta: (K, 2) int32 [lv | sclq << 16, xy_pack]:
           lv = layer+1 in the low half-word (0 = invalid slot, whole
           word 0 so the `> 0` DMA gates stay one compare); sclq =
           round(scale * 1024) (<= 32767 keeps the word positive);
           xy_pack = round(x * 2**fb) | (round(y * 2**fb) << 16) with
           fb = frac_bits(Hp, Wp) — static per shape bucket, 1/64 px up
           to 1024-px stacks, coarser (still >= 1/2 px) above so big
           images never saturate the 16-bit fields. Aligned window
           origins are re-derived in-kernel. 8 B per keypoint total
           (r2 #7), so batch 96 at 1280 candidates fits the 1 MB SMEM
           budget.
    dims:  (2,) f32 [w_real, h_real] — shared by every keypoint.
    Returns (angle (K,), desc (K, 128)) f32; descriptors are normalized
    here in XLA (clip at 0.2, renorm to 512 — result_types.py parity).

    Under vmap the batch is flattened into the layer/keypoint axes (one
    kernel launch for the whole pair batch) instead of lifting pallas_call
    through the batching rule.
    """
    interpret = jax.default_backend() != "tpu"
    K = imeta.shape[0]
    # pad the keypoint axis to the group size: each grid step processes
    # GROUP keypoints to amortize the ~0.7 us/step grid overhead
    # (measured: empty steps over invalid candidate slots dominated the
    # kernel's wall time at realistic ~13% validity)
    Kg = (K + GROUP - 1) // GROUP * GROUP
    imeta_flat = imeta.reshape(-1)
    if Kg != K:
        imeta_flat = jnp.concatenate(
            [imeta_flat, jnp.zeros(2 * (Kg - K), imeta.dtype)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Kg // GROUP,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            # lane-downsample constant: whole-array block, constant index
            # map -> DMA'd into VMEM once, reused by every grid step
            pl.BlockSpec(_DCB_NP.shape, lambda k, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((GROUP, 1, 128), lambda k, *_: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, 16, 128), lambda k, *_: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            # (slot, kpt-in-group, channel, rows, lanes): double-buffered
            # window groups
            pltpu.VMEM((2, GROUP, 2, WIN_H, WIN_W), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, GROUP, 2)),
        ],
    )
    _, hp_s, wp_s = dxs.shape
    angle, raw = pl.pallas_call(
        functools.partial(_ori_desc_kernel, frac_bits(hp_s, wp_s)),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Kg, 1, 128), jnp.float32),
            jax.ShapeDtypeStruct((Kg, 16, 128), jnp.float32),
        ],
        interpret=interpret,
    )(imeta_flat, dims, dxs, dys, jnp.asarray(_DCB_NP))
    angle = angle[:K]
    raw = raw[:K]
    # (rc major, o minor); orientation bins reversed to cv2's direction
    # (sift._OBIN_REV — see the rationale there)
    desc = raw[:, :, :DESC_B][:, :, _OBIN_REV_NP].reshape(K, 128)
    norm = jnp.linalg.norm(desc, axis=1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-12)
    desc = jnp.minimum(desc, DESC_MAG_THR)
    norm = jnp.linalg.norm(desc, axis=1, keepdims=True)
    desc = 512.0 * desc / jnp.maximum(norm, 1e-12)
    return angle[:, 0, 0], desc


@ori_desc_windows.def_vmap
def _ori_desc_vmap_rule(axis_size, in_batched, dxs, dys, imeta, dims):
    """Batch by flattening: (B,S,Hp,Wp) stacks -> (B*S,Hp,Wp), keypoints
    -> (B*K,) with layer indices offset per batch element. `dims` is the
    same for every batch element (static image shape) and stays (2,)."""
    def bcast(x, batched):
        return x if batched else jnp.broadcast_to(
            x[None], (axis_size,) + x.shape)

    dxs = bcast(dxs, in_batched[0])
    dys = bcast(dys, in_batched[1])
    imeta = bcast(imeta, in_batched[2])
    if in_batched[3]:
        dims = dims[0]
    B, S, Hp, Wp = dxs.shape
    K = imeta.shape[1]
    layer_off = (jnp.arange(B, dtype=imeta.dtype) * S)[:, None]
    # offset the lv half-word only; the 0 sentinel (whole word) must
    # stay 0 through the batch offset
    word = imeta[:, :, 0]
    lv = word & 0xFFFF
    imeta = imeta.at[:, :, 0].set(
        jnp.where(lv > 0, word + layer_off, 0))
    angle, desc = ori_desc_windows(
        dxs.reshape(B * S, Hp, Wp), dys.reshape(B * S, Hp, Wp),
        imeta.reshape(B * K, 2), dims)
    return (angle.reshape(B, K), desc.reshape(B, K, 128)), (True, True)


def pad_dims(h: int, w: int):
    """Padded gradient-stack dims satisfying the DMA tiling contract."""
    hp = max(WIN_H, (h + 7) // 8 * 8)
    wp = max(WIN_W, (w + 127) // 128 * 128)
    return hp, wp


def prep_meta(xs, ys, ls_layer, scl, keep, hp: int, wp: int,
              h_real: int, w_real: int):
    """Slim meta arrays for ori_desc_windows (8 B/keypoint). Window
    origins are derived in-kernel (keypoint lane offset in [64, 192) /
    row offset in [44, 52) when unclipped); hp/wp come from the
    gradient-stack shape; (x, y) ride as 1/2**frac_bits(hp, wp)-px fixed
    point (the kernel derives the same fb from the static stack shape);
    scale rides as 1/1024 fixed point in the high half-word of the
    lv field (r2 #7: 8 B/kpt unlocks the batch-96 SMEM budget)."""
    scale = float(1 << frac_bits(hp, wp))
    xq = jnp.clip(jnp.round(xs * scale), 0, 65535).astype(jnp.int32)
    yq = jnp.clip(jnp.round(ys * scale), 0, 65535).astype(jnp.int32)
    pack = xq | (yq << 16)
    sclq = jnp.clip(jnp.round(jnp.asarray(scl, jnp.float32) * 1024.0),
                    0, 32767).astype(jnp.int32)
    lv = jnp.where(keep,
                   (ls_layer.astype(jnp.int32) + 1) | (sclq << 16), 0)
    imeta = jnp.stack([lv, pack], axis=1)
    dims = jnp.array([float(w_real), float(h_real)], jnp.float32)
    return imeta, dims
