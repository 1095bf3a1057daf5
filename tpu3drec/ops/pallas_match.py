"""Pallas TPU kernel: fused descriptor distance + top-2 reduction.

The north-star matching op (SURVEY §2.6: "tiled matmul + top-2 reduction
kernel"). The XLA path (ops/match.py) materializes the full (N, M)
distance matrix in HBM (2048^2 f32 = 16 MB per pair) and reads it back
twice for the two min-reductions; this kernel streams desc2 in VMEM-sized
column blocks through the MXU and keeps a running top-2 (value, index)
carry in VMEM scratch — the distance matrix never leaves the chip, so HBM
traffic drops from O(N*M) to O((N+M)*D + N).

Grid: (N/BN, M/BM) with the j axis innermost; Pallas double-buffers the
desc2 block DMA against the matmul automatically. The carry is initialized
at j == 0 and the result written at the last j (the standard revisited-
output pipeline pattern).

Distances computed are squared-L2 shifted by the per-row |d1|^2 term
(constant per row, so the top-2 selection is unaffected); the caller adds
it back and takes the sqrt. Binary (+-1) descriptors reuse the same kernel:
hamming = (D - dot)/2 is a monotone transform of -dot = (d2_sq/2 shifted).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# plain python float: a jnp scalar would be captured as a traced constant
# by the pallas kernel, which pallas_call rejects
_BIG = 3.4e38


def _match_kernel(d1_ref, d2_ref, m2_ref, out_val_ref, out_idx_ref,
                  best_ref, second_ref, bidx_ref):
    # all operands/outputs are 2-D: Mosaic rejects 1-D f32 operands whose
    # XLA tiling (T(1024)) disagrees with its own (T(512))
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    bm = d2_ref.shape[0]

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, _BIG)
        second_ref[:] = jnp.full_like(second_ref, _BIG)
        bidx_ref[:] = jnp.zeros_like(bidx_ref)

    d1 = d1_ref[:]                      # (BN, D)
    d2 = d2_ref[:]                      # (BM, D)
    sq2 = jnp.sum(d2 * d2, axis=1)      # (BM,)
    # squared distance minus the row-constant |d1|^2 term
    dist = sq2[None, :] - 2.0 * jnp.dot(
        d1, d2.T, preferred_element_type=jnp.float32)   # (BN, BM)
    valid = m2_ref[:, 0] > 0
    dist = jnp.where(valid[None, :], dist, _BIG)

    # block top-2 (keep everything (BN, 1)-shaped)
    i1 = jnp.argmin(dist, axis=1, keepdims=True)       # (BN, 1)
    v1 = jnp.min(dist, axis=1, keepdims=True)
    col = lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    masked = jnp.where(col == i1, _BIG, dist)
    v2 = jnp.min(masked, axis=1, keepdims=True)
    gidx = (j * bm + i1).astype(jnp.int32)

    # merge with carry
    b = best_ref[:]
    s = second_ref[:]
    bi = bidx_ref[:]
    new_best = jnp.minimum(b, v1)
    new_bidx = jnp.where(v1 < b, gidx, bi)
    # second-smallest of {b, s, v1, v2}: the loser of best-vs-v1 competes
    # with the two seconds (s >= b and v2 >= v1 by construction)
    new_second = jnp.minimum(jnp.maximum(b, v1), jnp.minimum(s, v2))
    best_ref[:] = new_best
    second_ref[:] = new_second
    bidx_ref[:] = new_bidx

    @pl.when(j == n_j - 1)
    def _():
        out_val_ref[:] = jnp.concatenate([best_ref[:], second_ref[:]],
                                         axis=1)
        out_idx_ref[:] = bidx_ref[:]


@functools.partial(jax.jit, static_argnames=("block_n", "block_m",
                                             "interpret"))
def fused_knn2(desc1: jnp.ndarray, desc2: jnp.ndarray,
               mask2: jnp.ndarray,
               block_n: int = 256, block_m: int = 512,
               interpret: bool = False
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(N, D), (M, D), (M,) -> (best_idx (N,), d1 (N,), d2 (N,)) where
    d1/d2 are the two smallest L2 distances (not squared).

    N must be a multiple of block_n and M of block_m (pad with masked rows).
    """
    n, d = desc1.shape
    m = desc2.shape[0]
    assert n % block_n == 0 and m % block_m == 0, (n, m)
    grid = (n // block_n, m // block_m)

    out_val, out_idx = pl.pallas_call(
        _match_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_n, 2), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 2), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_n, 1), jnp.float32),
            pltpu.VMEM((block_n, 1), jnp.float32),
            pltpu.VMEM((block_n, 1), jnp.int32),
        ],
        interpret=interpret,
    )(desc1, desc2, mask2.astype(jnp.float32)[:, None])

    sq1 = jnp.sum(desc1 * desc1, axis=1)
    vals = jnp.sqrt(jnp.maximum(out_val + sq1[:, None], 0.0))
    vals = jnp.where(out_val >= _BIG * 0.5, _BIG, vals)
    return out_idx[:, 0], vals[:, 0], vals[:, 1]


def pallas_available() -> bool:
    import jax
    return jax.default_backend() == "tpu"


def knn2_best(desc1, desc2, mask1, mask2, interpret: bool = False):
    """Drop-in for ops.match ratio-test matching: returns
    (best_idx, d1, d2) using the fused kernel, with automatic padding."""
    n, d = desc1.shape
    m = desc2.shape[0]
    bn = 256 if n >= 256 else 8
    bm = 512 if m >= 512 else 128
    pn = (-n) % bn
    pm = (-m) % bm
    d1p = jnp.pad(desc1, ((0, pn), (0, 0)))
    d2p = jnp.pad(desc2, ((0, pm), (0, 0)))
    m2p = jnp.pad(mask2, (0, pm))
    idx, v1, v2 = fused_knn2(d1p, d2p, m2p, block_n=bn, block_m=bm,
                             interpret=interpret)
    return idx[:n], v1[:n], v2[:n]
