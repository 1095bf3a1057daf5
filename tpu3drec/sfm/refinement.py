"""Iterative two-view refinement: alternating essential-matrix estimation,
triangulation, and bounded intrinsics refinement with a relaxation schedule.

Rebuild of the reference IterativeRefinementPipeline
(CameraPoseEstimation/iterative_refinement_for_camera.py:15-565): up to
`max_iters` outer rounds of (E-RANSAC at a relaxing threshold ->
pose recovery -> filtered triangulation -> joint two-camera bundle step
with free intrinsics, focal clamped to [focal_min, focal_max] and the
principal point to within `pp_range` of the image center :433-512) with
convergence on relative quality improvement (:48-215) and the best
iterate returned with its history.

This is the machinery pipeline2.py:288-339 wires into two-view init; the
SfM pipeline exposes it via SfMConfig(use_iterative_refinement=True).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class RefinementConfig:
    """iterative_refinement_for_camera.py:15-37."""
    max_iters: int = 6
    threshold_start_px: float = 3.0     # relaxation schedule start
    threshold_end_px: float = 1.0
    focal_min: float = 100.0
    focal_max: float = 5000.0
    pp_range: float = 0.3               # pp within 30% of center
    convergence_rtol: float = 0.01
    ba_iters: int = 10


@dataclasses.dataclass
class RefinementResult:
    K1: np.ndarray
    K2: np.ndarray
    R: np.ndarray
    t: np.ndarray
    points: np.ndarray
    point_mask: np.ndarray
    inliers: np.ndarray
    quality: float
    history: List[Dict]


def _clamp_K(K: np.ndarray, size: Tuple[int, int],
             cfg: RefinementConfig) -> np.ndarray:
    """Bounded intrinsics (:433-512): focal and principal-point boxes."""
    w, h = size
    K = K.copy()
    K[0, 0] = np.clip(K[0, 0], cfg.focal_min, cfg.focal_max)
    K[1, 1] = np.clip(K[1, 1], cfg.focal_min, cfg.focal_max)
    K[0, 2] = np.clip(K[0, 2], w / 2 * (1 - cfg.pp_range),
                      w / 2 * (1 + cfg.pp_range))
    K[1, 2] = np.clip(K[1, 2], h / 2 * (1 - cfg.pp_range),
                      h / 2 * (1 + cfg.pp_range))
    return K


def iterative_refinement(pts1: np.ndarray, pts2: np.ndarray,
                         K1: np.ndarray, K2: np.ndarray,
                         size1: Tuple[int, int], size2: Tuple[int, int],
                         config: Optional[RefinementConfig] = None
                         ) -> Optional[RefinementResult]:
    """iterative_refinement_with_relaxation (:48-215)."""
    import jax
    import jax.numpy as jnp
    from tpu3drec.ops.epipolar import find_essential, recover_pose
    from tpu3drec.ops.triangulate import triangulate_two_view, TriangulationConfig
    from tpu3drec.ops.ba import (
        BAProblem, BAConfig, bundle_adjust, make_cam_params,
        unpack_cam_params,
    )
    from tpu3drec.ops.lie import log_so3, exp_so3

    cfg = config or RefinementConfig()
    K1, K2 = np.asarray(K1, np.float64), np.asarray(K2, np.float64)
    n = len(pts1)
    p1j = jnp.asarray(np.asarray(pts1, np.float32))
    p2j = jnp.asarray(np.asarray(pts2, np.float32))

    best: Optional[RefinementResult] = None
    history: List[Dict] = []
    prev_quality = -np.inf

    for it in range(cfg.max_iters):
        frac = it / max(cfg.max_iters - 1, 1)
        thr = cfg.threshold_start_px * (1 - frac) + cfg.threshold_end_px * frac

        eres = find_essential(p1j, p2j,
                              jnp.asarray(K1.astype(np.float32)),
                              jnp.asarray(K2.astype(np.float32)),
                              threshold_px=float(thr),
                              key=jax.random.PRNGKey(it))
        if not bool(eres.success):
            history.append({"iter": it, "status": "essential_failed"})
            continue
        R, t, _ = recover_pose(eres.E, p1j, p2j,
                               jnp.asarray(K1.astype(np.float32)),
                               jnp.asarray(K2.astype(np.float32)),
                               mask=eres.inliers)
        tri = triangulate_two_view(
            p1j, p2j, jnp.asarray(K1.astype(np.float32)),
            jnp.asarray(K2.astype(np.float32)),
            jnp.eye(3), jnp.zeros(3), R, t, mask=eres.inliers,
            config=TriangulationConfig(max_reproj_px=float(thr) * 2))
        n_pts = int(tri.mask.sum())
        if n_pts < 16:
            history.append({"iter": it, "status": "too_few_points",
                            "points": n_pts})
            continue

        # joint bounded refinement: 2 cameras, free intrinsics, points free
        cam0 = make_cam_params(np.zeros(3), np.zeros(3), K1)
        cam1 = make_cam_params(np.asarray(log_so3(R)), np.asarray(t), K2)
        pm = np.ones((2, 10), np.float32)
        pm[0, :6] = 0.0          # camera 1 pose fixed (gauge)
        pm[1, 3] = 0.0           # fix scale
        obs_cam = np.concatenate([np.zeros(n, np.int32),
                                  np.ones(n, np.int32)])
        obs_pt = np.tile(np.arange(n, dtype=np.int32), 2)
        obs_uv = np.concatenate([np.asarray(pts1, np.float32),
                                 np.asarray(pts2, np.float32)])
        obs_mask = np.tile(np.asarray(tri.mask), 2)
        prob = BAProblem(
            cam_params=jnp.asarray(np.stack([cam0, cam1])),
            points=tri.points,
            obs_cam=jnp.asarray(obs_cam), obs_pt=jnp.asarray(obs_pt),
            obs_uv=jnp.asarray(obs_uv), obs_mask=jnp.asarray(obs_mask),
            param_mask=jnp.asarray(pm), point_mask=tri.mask)
        res = bundle_adjust(prob, BAConfig(max_iters=cfg.ba_iters,
                                           optimize_intrinsics=True))
        _, _, K1j = unpack_cam_params(res.cam_params[0])
        rv, tv, K2j = unpack_cam_params(res.cam_params[1])
        K1 = _clamp_K(np.asarray(K1j, np.float64), size1, cfg)
        K2 = _clamp_K(np.asarray(K2j, np.float64), size2, cfg)
        R_new = np.asarray(exp_so3(rv), np.float64)
        t_new = np.asarray(tv, np.float64)

        reproj = float(res.mean_reproj_px)
        quality = n_pts / max(n, 1) - 0.2 * reproj  # _evaluate_quality (:513)
        history.append({"iter": it, "threshold_px": thr,
                        "inliers": int(eres.num_inliers),
                        "points": n_pts, "mean_reproj_px": reproj,
                        "quality": quality,
                        "focal1": float(K1[0, 0]), "focal2": float(K2[0, 0])})
        if best is None or quality > best.quality:
            best = RefinementResult(
                K1=K1, K2=K2, R=R_new, t=t_new,
                points=np.asarray(res.points),
                point_mask=np.asarray(tri.mask),
                inliers=np.asarray(eres.inliers),
                quality=quality, history=history)
        if prev_quality > -np.inf and \
                abs(quality - prev_quality) < cfg.convergence_rtol * abs(prev_quality):
            break
        prev_quality = quality

    if best is not None:
        best.history = history
    return best
