"""Data/tensor-parallel pair processing over a device mesh.

TPU-native replacement for the reference's serial pair loop
(FME/pipeline.py:538-678): a batch of image pairs is sharded along the mesh
data axis (`dp`) and processed with `shard_map`; inside each data shard the
descriptor distance matrix is sharded along the model axis (`tp`) — each tp
rank scores its slice of image-2 descriptors and the global 2-NN is reduced
with an `all_gather` over tp, so large-N matching rides the ICI instead of
duplicating the O(N^2 D) matmul.

For the very-large-N regime where even one side's full descriptor set
should not be replicated, `ring_knn2` rotates desc2 shards around the tp
ring with `lax.ppermute` (the ring-attention analogue, SURVEY §5) while
desc1 rows stay resident — peak memory one (N/tp, M/tp) block, exact.

Collectives used: all_gather (tp top-2 merge), ppermute (ring rotation),
psum (dp global statistics).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tpu3drec.parallel.mesh import DATA_AXIS, MODEL_AXIS, batch_sharding
from tpu3drec.ops.match import distance_matrix
from tpu3drec.ops.geometry import find_homography

_INF = jnp.float32(3.4e38)


def tp_knn2(desc1: jnp.ndarray, desc2_shard: jnp.ndarray,
            mask1: jnp.ndarray, mask2_shard: jnp.ndarray,
            axis_name: str = MODEL_AXIS,
            metric: str = "l2") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """2-NN where desc2 is sharded along `axis_name` (call inside shard_map).

    Each rank computes its local (N, M/tp) distance block and local top-2;
    an all_gather of the (idx, dist) candidate pairs (2 per rank) followed
    by a tiny reduction yields the exact global top-2. Communication is
    O(N * tp * 2), vs O(N * M) to replicate the distance matrix.
    """
    m_local = desc2_shard.shape[0]
    rank = lax.axis_index(axis_name)
    dist = distance_matrix(desc1, desc2_shard, metric)
    dist = jnp.where(mask2_shard[None, :], dist, _INF)
    # local top-2 via iota compare-mask, not .at[rows, i1].set: scatter
    # lowers to a full-matrix rewrite on TPU (ops/match.py:_top2_min)
    i1 = jnp.argmin(dist, axis=1)
    v1 = jnp.min(dist, axis=1)
    cols_l = lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    masked = jnp.where(cols_l == i1[:, None], _INF, dist)
    i2 = jnp.argmin(masked, axis=1)
    v2 = jnp.min(masked, axis=1)
    local_idx = jnp.stack([i1, i2], axis=1) + rank * m_local  # global ids
    local_val = jnp.stack([v1, v2], axis=1)
    # gather 2 candidates per rank and reduce to global top-2
    all_val = lax.all_gather(local_val, axis_name, axis=1, tiled=True)  # (N, 2*tp)
    all_idx = lax.all_gather(local_idx, axis_name, axis=1, tiled=True)
    j1 = jnp.argmin(all_val, axis=1)
    g1 = jnp.take_along_axis(all_val, j1[:, None], axis=1)[:, 0]
    gi1 = jnp.take_along_axis(all_idx, j1[:, None], axis=1)[:, 0]
    # iota compare-mask, not .at[rows, j1].set: scatter lowers to a
    # full-matrix rewrite on TPU (ops/match.py:_top2_min)
    cols = lax.broadcasted_iota(jnp.int32, all_val.shape, 1)
    masked2 = jnp.where(cols == j1[:, None], _INF, all_val)
    j2 = jnp.argmin(masked2, axis=1)
    g2 = jnp.take_along_axis(masked2, j2[:, None], axis=1)[:, 0]
    gi2 = jnp.take_along_axis(all_idx, j2[:, None], axis=1)[:, 0]
    return jnp.stack([gi1, gi2], axis=1), jnp.stack([g1, g2], axis=1)


def ring_knn2(desc1_shard: jnp.ndarray, desc2_shard: jnp.ndarray,
              mask1_shard: jnp.ndarray, mask2_shard: jnp.ndarray,
              axis_name: str = MODEL_AXIS,
              metric: str = "l2") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ring-partitioned exact 2-NN: BOTH descriptor sets sharded.

    The SURVEY §5 "ring-attention analogue" for matching: desc1 rows stay
    resident on their rank while desc2 shards rotate around the ring via
    `lax.ppermute` (one hop per step, tp steps total). Each step scores
    one (N/tp, M/tp) block and folds it into a running top-2, so peak
    memory is one block instead of the (N, M) matrix and communication
    is O(M * D) total per rank, all on ICI neighbour links. Exact up to
    tie-breaking: the same winning *distances* as a single-device 2-NN;
    when two candidates are at exactly equal distance the index chosen
    depends on fold order (single-device argmin picks the lowest index).

    Call inside shard_map with desc1/desc2 sharded along `axis_name`.
    Returns (idx (N/tp, 2) GLOBAL desc2 ids, dist (N/tp, 2)).
    """
    tp = lax.axis_size(axis_name)
    rank = lax.axis_index(axis_name)
    m_local = desc2_shard.shape[0]
    n_local = desc1_shard.shape[0]
    perm = [(i, (i + 1) % tp) for i in range(tp)]

    def fold(best_val, best_idx, dist, owner):
        # merge one block's top-2 into the running top-2; iota
        # compare-masks instead of .at[rows, i].set scatters (which
        # rewrite the whole matrix on TPU — ops/match.py:_top2_min)
        i1 = jnp.argmin(dist, axis=1)
        v1 = jnp.min(dist, axis=1)
        cols = lax.broadcasted_iota(jnp.int32, dist.shape, 1)
        masked = jnp.where(cols == i1[:, None], _INF, dist)
        i2 = jnp.argmin(masked, axis=1)
        v2 = jnp.min(masked, axis=1)
        cand_val = jnp.concatenate(
            [best_val, jnp.stack([v1, v2], axis=1)], axis=1)   # (N, 4)
        cand_idx = jnp.concatenate(
            [best_idx, jnp.stack([i1, i2], axis=1) + owner * m_local],
            axis=1)
        j1 = jnp.argmin(cand_val, axis=1)
        g1 = jnp.min(cand_val, axis=1)
        gi1 = jnp.take_along_axis(cand_idx, j1[:, None], axis=1)[:, 0]
        cols4 = lax.broadcasted_iota(jnp.int32, cand_val.shape, 1)
        masked2 = jnp.where(cols4 == j1[:, None], _INF, cand_val)
        j2 = jnp.argmin(masked2, axis=1)
        g2 = jnp.min(masked2, axis=1)
        gi2 = jnp.take_along_axis(cand_idx, j2[:, None], axis=1)[:, 0]
        return (jnp.stack([g1, g2], axis=1).astype(jnp.float32),
                jnp.stack([gi1, gi2], axis=1))

    def step(carry, _):
        block, bmask, owner, best_val, best_idx = carry
        dist = distance_matrix(desc1_shard, block, metric)
        dist = jnp.where(bmask[None, :], dist, _INF)
        best_val, best_idx = fold(best_val, best_idx, dist, owner)
        # rotate: receive the next shard from the ring neighbour
        block = lax.ppermute(block, axis_name, perm)
        bmask = lax.ppermute(bmask, axis_name, perm)
        owner = lax.ppermute(owner, axis_name, perm)
        return (block, bmask, owner, best_val, best_idx), None

    init = (desc2_shard, mask2_shard, rank,
            jnp.full((n_local, 2), _INF, jnp.float32),
            jnp.zeros((n_local, 2), jnp.int32))
    (_, _, _, best_val, best_idx), _ = lax.scan(
        step, init, None, length=tp)
    best_val = jnp.where(mask1_shard[:, None], best_val, _INF)
    return best_idx, best_val


def make_batched_pair_step(mesh: Mesh, detect_fn: Callable,
                           ratio: float = 0.75,
                           ransac_threshold: float = 4.0,
                           num_hypotheses: int = 256) -> Callable:
    """Build the jitted multi-chip pair-processing step.

    detect_fn(img) -> (xy (N,2), response (N,), desc (N,D), mask (N,)) —
    a raw-tuple detector (Features static fields don't pass through
    shard_map closures cleanly, so the step works on plain arrays).

    Returns step(imgs1 (B,H,W), imgs2 (B,H,W), keys (B,2)) ->
      dict of per-pair stats (num_matches, num_inliers, inlier_ratio,
      mean_reproj) plus 'total_matches' (dp-psum'd global count, replicated).
    """

    def per_pair(img1, img2, key):
        xy1, r1, d1, m1 = detect_fn(img1)
        xy2, r2, d2, m2 = detect_fn(img2)
        # tp-sharded exact 2-NN: slice this rank's desc2 rows
        tp = lax.axis_size(MODEL_AXIS)
        n2 = d2.shape[0]
        shard = n2 // tp
        rank = lax.axis_index(MODEL_AXIS)
        d2_local = lax.dynamic_slice_in_dim(d2, rank * shard, shard, 0)
        m2_local = lax.dynamic_slice_in_dim(m2, rank * shard, shard, 0)
        nn_idx, nn_dist = tp_knn2(d1, d2_local, m1, m2_local)
        best = nn_idx[:, 0]
        ok = (nn_dist[:, 0] < ratio * jnp.maximum(nn_dist[:, 1], 1e-12)) \
            & m1 & (nn_dist[:, 0] < _INF)
        p1 = xy1
        p2 = xy2[best]
        rr = find_homography(p1, p2, mask=ok, threshold=ransac_threshold,
                             num_hypotheses=num_hypotheses, key=key,
                             refit=False)
        n_match = jnp.sum(ok.astype(jnp.int32))
        return {
            "num_matches": n_match,
            "num_inliers": rr.num_inliers,
            "inlier_ratio": rr.inlier_ratio,
            "success": rr.success,
        }

    def step_shard(imgs1, imgs2, keys):
        stats = jax.vmap(per_pair)(imgs1, imgs2, keys)
        total = lax.psum(jnp.sum(stats["num_matches"]), DATA_AXIS)
        stats["total_matches"] = jnp.broadcast_to(total, imgs1.shape[:1])
        return stats

    in_spec = P(DATA_AXIS)
    step = shard_map(
        step_shard, mesh=mesh,
        in_specs=(in_spec, in_spec, in_spec),
        out_specs={"num_matches": in_spec, "num_inliers": in_spec,
                   "inlier_ratio": in_spec, "success": in_spec,
                   "total_matches": in_spec},
        check_vma=False,
    )
    return jax.jit(step)


def sharded_pair_stats(mesh: Mesh, stats: Dict[str, jnp.ndarray]) -> Dict[str, float]:
    """Host-side summary of a sharded step's output."""
    return {k: float(jnp.sum(v) if v.dtype != bool else jnp.sum(v))
            for k, v in stats.items()}
