"""Data-parallel dense stereo over a device mesh.

Multi-chip coverage for the third pipeline stage (SURVEY §2.7): the
per-neighbour stereo pairs of a multi-view scene are sharded one pair
per device along the mesh data axis and each device runs the UNBATCHED
pair program (rectify -> SGM -> depth, ops/stereo.py:stereo_depth_pair).

Why not vmap over views? Measured dead end (CLAUDE.md): under vmap the
rectification warp's linearized takes become batched general gathers —
7x slower — and one partitioning crashed XLA's fusion emitter. shard_map
with exactly one pair per shard keeps every device on the fast
unbatched gather form; parallelism comes from the mesh, not the batch
dimension. Pairs are padded to a full mesh row and masked out on the
host afterwards.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from tpu3drec.parallel.mesh import DATA_AXIS
from tpu3drec.ops.stereo import stereo_depth_pair


def make_sharded_stereo_step(mesh: Mesh, num_disparities: int = 64):
    """Build step(imgs1 (B,H,W), imgs2, K1 (B,3,3), K2, R (B,3,3),
    t (B,3)) -> dict of per-pair (B, ...) outputs, with B == the mesh's
    data-axis size (one pair per dp slot; tp rows replicate the work of
    their dp slot — geometry programs are not tensor-sharded).
    """
    dp = int(mesh.shape[DATA_AXIS])

    def shard_fn(i1, i2, k1, k2, r, t):
        # leading axis is 1 on each shard: run the UNBATCHED pair
        # program (no vmap -> no batched-gather slowdown)
        out = stereo_depth_pair(i1[0], i2[0], k1[0], k2[0], r[0], t[0],
                                num_disparities=num_disparities)
        keep = {k: out[k] for k in
                ("depth", "disparity", "valid", "baseline")}
        return {k: v[None] for k, v in keep.items()}

    spec = P(DATA_AXIS)
    step = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(spec,) * 6,
        out_specs={"depth": spec, "disparity": spec, "valid": spec,
                   "baseline": spec},
        check_vma=False)

    jitted = jax.jit(step)

    def run(imgs1, imgs2, K1, K2, R, t):
        B = imgs1.shape[0]
        if B != dp:
            raise ValueError(f"batch {B} != mesh dp size {dp}; pad the "
                             "pair list to a full mesh row")
        return jitted(imgs1, imgs2, K1, K2, R, t)

    return run


def sharded_pairwise_stereo(mesh: Mesh,
                            img_ref: np.ndarray,
                            neighbours: List[Tuple[np.ndarray, np.ndarray,
                                                   np.ndarray, np.ndarray,
                                                   np.ndarray]],
                            K_ref: np.ndarray,
                            num_disparities: int = 64) -> List[Dict]:
    """All (reference, neighbour) pairs of one scene in ceil(n/dp)
    sharded dispatches. neighbours: list of (img, K2, R_rel, t_rel,
    _unused) tuples; returns one dict per REAL pair (padding dropped).
    """
    dp = int(mesh.shape[DATA_AXIS])
    step = make_sharded_stereo_step(mesh, num_disparities)
    n = len(neighbours)
    outs: List[Dict] = []
    for s in range(0, n, dp):
        chunk = neighbours[s:s + dp]
        pad = dp - len(chunk)
        chunk = chunk + [chunk[-1]] * pad
        i1 = jnp.asarray(np.stack([np.asarray(img_ref, np.float32)] * dp))
        i2 = jnp.asarray(np.stack([np.asarray(c[0], np.float32)
                                   for c in chunk]))
        k1 = jnp.asarray(np.stack([np.asarray(K_ref, np.float32)] * dp))
        k2 = jnp.asarray(np.stack([np.asarray(c[1], np.float32)
                                   for c in chunk]))
        r = jnp.asarray(np.stack([np.asarray(c[2], np.float32)
                                  for c in chunk]))
        t = jnp.asarray(np.stack([np.asarray(c[3], np.float32)
                                  for c in chunk]))
        res = step(i1, i2, k1, k2, r, t)
        for j in range(len(neighbours[s:s + dp])):
            outs.append({k: np.asarray(v[j]) for k, v in res.items()})
    return outs
