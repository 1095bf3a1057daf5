"""Pallas SGM aggregation kernel: the whole DP recurrence in one
pallas_call per axis.

The XLA form (ops/stereo.py:_sgm_scan) is a lax.scan whose per-step
body is tiny VPU work on an (streams, Y, D) carry — step-dispatch
overhead and the scan's stacked-output materialization are the cost,
not FLOPs. Here the scan becomes the KERNEL GRID: grid=(X,), one cost
column per step streamed HBM->VMEM, the DP carry living in a VMEM
scratch that persists across the sequentially-executed grid steps
(TPU Pallas grids run in order), and the aggregated column written
straight back out. No per-step XLA loop machinery, no carry traffic
to HBM, no concat of forward/backward stacks.

Both scan directions of an axis run in the same grid step (the forward
stream reads column i, the backward stream column X-1-i), and all B
volumes of a batch ride along the stream axis — the full 4-direction x
B-volume aggregation is TWO pallas_calls.

Mosaic constraints honoured (CLAUDE.md round-2/3 lessons): blocks are
3-D with the last-two block dims equal to the array dims; lane shifts
use static pltpu-friendly rolls via jnp.concatenate on the 64-lane
logical axis; P1/P2 are static python floats; no traced constants are
captured.

DEFAULT ON TPU since the round-4 measurement: dense stage 2.547 MP/s
via this kernel vs 2.244 MP/s via the XLA scan (median of 3, bench.py
BENCH_STAGES=dense). TPU3DREC_PALLAS_SGM=0 restores the XLA form;
=1 forces the kernel off-TPU (interpret mode). Interpret-mode parity
with the XLA form is asserted in tests/test_pallas_sgm.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# max stream rows per kernel block: 2048*128 lanes*4 B = 1 MB/buffer,
# ~7 buffers (multi-buffered in+out+carry) stays well under the 16 MB
# scoped-VMEM limit
_MAX_BLOCK_ROWS = 2048


def _dp_step(prev: jnp.ndarray, c: jnp.ndarray, p1: float,
             p2: float) -> jnp.ndarray:
    """One SGM DP step on (S, D): out = c + best(prev) - min(prev)."""
    m = jnp.min(prev, axis=-1, keepdims=True)
    up = jnp.concatenate([prev[:, :1], prev[:, :-1]], axis=1)
    dn = jnp.concatenate([prev[:, 1:], prev[:, -1:]], axis=1)
    best = jnp.minimum(jnp.minimum(prev, up + p1),
                       jnp.minimum(dn + p1, m + p2))
    return c + best - m


def _sgm_kernel(v_ref, out_ref, carry_ref, *, p1: float, p2: float):
    """grid=(nc, X) — X innermost. v_ref block (1, chunk, D): a chunk of
    stream rows of column i; rows in [:S] of the full array are the
    forward stream (column i), rows in [S:] the backward stream (column
    X-1-i; the caller pre-concatenates v with v reversed along X).
    carry (chunk, D) persists across the X steps of one row-chunk and is
    reset at i == 0 (each chunk is an independent set of DP streams)."""
    i = pl.program_id(1)
    c = v_ref[0]

    @pl.when(i == 0)
    def _():
        carry_ref[:] = c
        out_ref[0] = c

    @pl.when(i > 0)
    def _():
        out = _dp_step(carry_ref[:], c, p1, p2)
        carry_ref[:] = out
        out_ref[0] = out


@functools.partial(jax.jit,
                   static_argnames=("p1x100", "p2x100", "interpret"))
def _sgm_axis_pallas(v: jnp.ndarray, p1x100: int, p2x100: int,
                     interpret: bool = False) -> jnp.ndarray:
    """Bidirectional DP over axis 0 of (X, S, D): returns the summed
    forward+backward aggregation, same contract as ops/stereo._sgm_bidir
    with the (X, B, Y, D) batch axes flattened into S."""
    X, S, D = v.shape
    p1, p2 = p1x100 / 100.0, p2x100 / 100.0
    both = jnp.concatenate([v, v[::-1]], axis=1)       # (X, 2S, D)
    # Chunk the stream axis as the OUTER grid dim so per-block VMEM is
    # bounded no matter how many volumes share the call: D=64 pads to
    # 128 lanes, so a (1, rows, D) f32 block costs rows*128*4 bytes per
    # buffer and the compiler multi-buffers in+out+carry — an unchunked
    # 8-volume batch (rows=10240) blew the 16 MB scoped-VMEM limit
    # (measured: "19.95M > 16.00M" at rows=5120 with 2 pairs).
    rows = 2 * S
    nc = max(1, -(-rows // _MAX_BLOCK_ROWS))
    chunk = ((-(-rows // nc)) + 7) // 8 * 8            # %8 sublanes
    pad = nc * chunk - rows
    if pad:
        both = jnp.pad(both, ((0, 0), (0, pad), (0, 0)))
    agg = pl.pallas_call(
        functools.partial(_sgm_kernel, p1=p1, p2=p2),
        grid=(nc, X),
        in_specs=[pl.BlockSpec((1, chunk, D), lambda j, i: (i, j, 0))],
        out_specs=pl.BlockSpec((1, chunk, D), lambda j, i: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((X, nc * chunk, D), v.dtype),
        scratch_shapes=[pltpu.VMEM((chunk, D), jnp.float32)],
        interpret=interpret,
    )(both)
    agg = agg[:, :rows]
    return agg[:, :S] + agg[:, S:][::-1]


@functools.partial(jax.jit, static_argnames=("p1x100", "p2x100",
                                             "interpret"))
def sgm_aggregate_batch_pallas(volumes: jnp.ndarray, p1x100: int = 15,
                               p2x100: int = 90,
                               interpret: bool = False) -> jnp.ndarray:
    """4-direction SGM aggregation of (B, D, H, W) cost volumes in two
    pallas_calls. Drop-in for ops/stereo.sgm_aggregate_batch."""
    B, D, H, W = volumes.shape
    v = jnp.transpose(volumes, (3, 0, 2, 1)).reshape(W, B * H, D)
    agg_h = _sgm_axis_pallas(v, p1x100, p2x100, interpret)
    agg_h = agg_h.reshape(W, B, H, D)
    vt = jnp.transpose(volumes, (2, 0, 3, 1)).reshape(H, B * W, D)
    agg_v = _sgm_axis_pallas(vt, p1x100, p2x100, interpret)
    agg_v = agg_v.reshape(H, B, W, D)
    return (jnp.transpose(agg_h, (1, 3, 2, 0))
            + jnp.transpose(agg_v, (1, 3, 0, 2)))
