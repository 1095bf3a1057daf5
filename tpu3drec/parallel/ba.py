"""Sharded bundle adjustment over a device mesh.

The SURVEY §5 long-context analogue for BA scale — "number of
cameras/points in BA: Schur complement + sharded point blocks"
(SURVEY.md:471-474) — and the multi-chip counterpart of the reference's
single-process `GlobalBundleAdjuster`
(CameraPoseEstimation/bundle_adjusment.py:414-502).

Decomposition: cameras are few and replicated; points and their
observations are many and sharded along the mesh data axis. Each shard
owns a contiguous block of points plus exactly the observations of those
points, so every point-indexed quantity (V blocks, gp, the CG matvec's
z = W^T x, the dp back-substitution) is shard-local with zero
communication. The only cross-shard reductions are the camera-indexed
accumulations — U, gc, the Schur matvec's back term, the block-Jacobi
diagonal, and the scalar Huber cost — each a `lax.psum` of a (C, 10)-ish
array (a few KB on the ICI per CG iteration). All shards therefore march
through an identical replicated LM/CG state while the O(M) observation
work scales 1/n_shards.

The actual solver is `ops.ba.bundle_adjust(axis_name=...)` — one code
path, collectives gated on the axis — this module only partitions the
global problem, runs the shard_map, and reassembles the points.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from tpu3drec.ops.ba import BAProblem, BAConfig, BAResult, bundle_adjust
from tpu3drec.parallel.mesh import DATA_AXIS


def shard_ba_problem(prob: BAProblem, n_shards: int
                     ) -> Tuple[BAProblem, int, int]:
    """Partition a global BAProblem into per-shard blocks (host-side).

    Points are padded to a multiple of n_shards and split into contiguous
    blocks; each observation is routed to the shard owning its point and
    per-shard observation lists are padded to the max count (static
    shapes). Returns (stacked_prob, pts_per_shard, obs_per_shard) where
    every array in stacked_prob has a leading dimension divisible by
    n_shards, ready to shard along the mesh data axis — obs_pt holds
    LOCAL point indices.
    """
    cam = np.asarray(prob.cam_params)
    pts = np.asarray(prob.points)
    obs_cam = np.asarray(prob.obs_cam)
    obs_pt = np.asarray(prob.obs_pt)
    obs_uv = np.asarray(prob.obs_uv)
    obs_mask = np.asarray(prob.obs_mask)
    pt_mask = np.asarray(prob.point_mask)

    n_pts = pts.shape[0]
    pl = -(-n_pts // n_shards)           # points per shard
    p_pad = pl * n_shards
    if p_pad != n_pts:
        pts = np.concatenate(
            [pts, np.zeros((p_pad - n_pts, 3), pts.dtype)])
        pt_mask = np.concatenate(
            [pt_mask, np.zeros(p_pad - n_pts, bool)])

    shard_of = obs_pt // pl              # routing by point block
    # dead observations (mask False) still need a home: keep their shard,
    # they are masked out inside the solver anyway
    counts = np.bincount(shard_of, minlength=n_shards)
    ms = max(int(counts.max()), 1)

    s_cam = np.zeros((n_shards, ms), np.int32)
    s_pt = np.zeros((n_shards, ms), np.int32)
    s_uv = np.zeros((n_shards, ms, 2), obs_uv.dtype)
    s_mask = np.zeros((n_shards, ms), bool)
    for s in range(n_shards):
        sel = np.nonzero(shard_of == s)[0]
        k = sel.size
        s_cam[s, :k] = obs_cam[sel]
        s_pt[s, :k] = obs_pt[sel] - s * pl   # LOCAL point ids
        s_uv[s, :k] = obs_uv[sel]
        s_mask[s, :k] = obs_mask[sel]

    stacked = BAProblem(
        cam_params=jnp.asarray(cam),
        points=jnp.asarray(pts),
        obs_cam=jnp.asarray(s_cam.reshape(-1)),
        obs_pt=jnp.asarray(s_pt.reshape(-1)),
        obs_uv=jnp.asarray(s_uv.reshape(-1, 2)),
        obs_mask=jnp.asarray(s_mask.reshape(-1)),
        param_mask=prob.param_mask,
        point_mask=jnp.asarray(pt_mask),
    )
    return stacked, pl, ms


def sharded_bundle_adjust(prob: BAProblem,
                          mesh: Mesh,
                          config: BAConfig = BAConfig(schur_solver="cg"),
                          axis: str = DATA_AXIS) -> BAResult:
    """Run bundle_adjust with points/observations sharded over `mesh`.

    Drop-in for `bundle_adjust` at global-BA scale: same BAProblem in
    (global point ids), same BAResult out (points reassembled in the
    original order). Requires schur_solver='cg' (dense materializes the
    point-global W tensor). Numerics match the single-device solve up to
    f32 reduction-order effects — asserted to tolerance in
    tests/test_ba_sharded.py.
    """
    if config.schur_solver == "auto":
        config = config._replace(schur_solver="cg")
    n_shards = int(mesh.shape[axis])
    n_pts = prob.points.shape[0]
    stacked, pl, ms = shard_ba_problem(prob, n_shards)

    def run(cam_params, param_mask, points, point_mask,
            obs_cam, obs_pt, obs_uv, obs_mask):
        local = BAProblem(cam_params=cam_params, param_mask=param_mask,
                          points=points, point_mask=point_mask,
                          obs_cam=obs_cam, obs_pt=obs_pt,
                          obs_uv=obs_uv, obs_mask=obs_mask)
        res = bundle_adjust(local, config, axis_name=axis)
        return (res.cam_params, res.points, res.cost_initial,
                res.cost_final, res.iterations, res.mean_reproj_px,
                res.stats[4], res.stats[5])

    sharded = P(axis)
    rep = P()
    fn = shard_map(
        run, mesh=mesh,
        in_specs=(rep, rep, sharded, sharded,
                  sharded, sharded, sharded, sharded),
        out_specs=(rep, sharded, rep, rep, rep, rep, rep, rep),
        check_vma=False,
    )
    cams, pts, c0, c1, iters, mpx, lam, mr0 = jax.jit(fn)(
        stacked.cam_params, stacked.param_mask,
        stacked.points, stacked.point_mask,
        stacked.obs_cam, stacked.obs_pt, stacked.obs_uv, stacked.obs_mask)
    return BAResult(cam_params=cams, points=pts[:n_pts],
                    cost_initial=c0, cost_final=c1, iterations=iters,
                    mean_reproj_px=mpx,
                    stats=jnp.stack([c0, c1,
                                     iters.astype(jnp.float32), mpx, lam,
                                     mr0]))
