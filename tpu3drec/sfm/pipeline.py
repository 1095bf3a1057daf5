"""Incremental SfM pipeline: two-view init -> incremental view addition
with PnP -> global bundle adjustment -> export.

Rebuild of the reference MainPosePipeline
(CameraPoseEstimation/pipeline.py:218-2709, pipeline2.py):

  Phase 1 (:265-592): best-pair selection, essential RANSAC, pose recovery,
    camera 1 at origin, filtered two-view triangulation, bundle adjustment,
    relaxed re-triangulation of rejected points (:421-507).
  Phase 2 (:912-966): connectivity-ranked next view, 2D-3D correspondence
    mining against the existing cloud (:1985-2187), PnP, triangulation of
    new points, incremental BA over the last <=3 cameras + all points
    (bundle_adjusment.py:49-113).
  Phase 3 (:1585-1611): global BA (all cameras, first fixed).
  Phase 4 (:1666-1721): pickle + JSON + COLMAP + summary report export.

All geometry runs on device through the batched ops; correspondence arrays
are padded to power-of-two buckets so the jitted programs are reused across
views instead of recompiling per correspondence count.
"""

from __future__ import annotations

import dataclasses
import json
import pickle
import time
import zlib
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from tpu3drec.sfm.reconstruction import Camera, Reconstruction
from tpu3drec.sfm.pair_selector import InitializationPairSelector, ScoringConfig
from tpu3drec.sfm.correspondence import min_dists as _min_dists
from tpu3drec.sfm.intrinsics import ProgressiveIntrinsicsEstimator, heuristic_K


@dataclasses.dataclass
class SfMConfig:
    min_init_inliers: int = 30          # essential_estimation.py:160-170
    min_init_inlier_ratio: float = 0.4
    essential_threshold_px: float = 1.5  # MatrixEstimationConfig
    # reference default path is 5-point RANSAC (essential_estimation.py:
    # 117-147 via cv2.findEssentialMat); ops/five_point.py Nister solver
    essential_method: str = "5point"
    min_pnp_correspondences: int = 15    # CPE/pipeline.py:2010
    pnp_threshold_px: float = 4.0
    max_reproj_px: float = 2.0           # TriangulationConfig
    relaxed_reproj_px: float = 4.0       # re-triangulation relaxation (:421-507)
    min_angle_deg: float = 2.0
    relaxed_angle_deg: float = 1.0
    # 2D-3D mining tolerance fallback ladder (correspondence_manager.py:
    # 375-555, CPE/pipeline.py:1985-2187): widen the pixel gate until
    # enough correspondences are found
    mine_tolerance_ladder: Tuple[float, ...] = (2.0, 4.0, 8.0)
    incremental_ba_window: int = 3       # last <=3 cameras (:1327-1341)
    # windowed BA solves the REDUCED local problem (window points + their
    # anchoring observations) instead of freezing most of a full-map pack
    # — per-view BA stays ~constant instead of growing with the map
    use_local_ba: bool = True
    # final global BA polish shards point blocks over the device mesh
    # when >1 device is visible and the problem is big enough to beat
    # the shard_map overhead (parallel/ba.py)
    use_sharded_global_ba: bool = True
    sharded_ba_min_obs: int = 20_000
    ba_max_iters: int = 20
    global_ba_max_iters: int = 30
    # per-view (incremental) BA convergence: 1e-4 measured to stop 2 LM
    # iterations earlier at identical final mean reprojection (the
    # global polish still runs at the tight 1e-6 default)
    incremental_ba_ftol: float = 1e-4
    # skip the per-view BA solve entirely (0 LM iterations) when the
    # local window's initial mean reprojection is already below this
    # (px) — the check runs inside the BA program; the final global
    # polish cleans up residual drift. 0 disables. (VERDICT r4 #3)
    incremental_ba_skip_px: float = 0.5
    # adaptive part of the gate: also skip when the initial mean
    # reprojection is within this many px of the trailing converged
    # value — measured per-view solves past the first few improve mre
    # by <=0.02 px while burning 4-6 LM iterations; the gate
    # self-regulates (skipping pauses the EWMA, drift eventually
    # crosses the margin and triggers a real solve)
    incremental_ba_skip_margin_px: float = 0.08
    # carry the previous incremental solve's final LM damping into the
    # next solve instead of re-walking from lambda_init
    warm_start_lambda: bool = True
    optimize_intrinsics: bool = False
    post_ba_max_reproj_px: float = 4.0   # point re-validation (:594-746)
    # pipeline2 variant: joint E+K iterative refinement in two-view init
    # (reference pipeline2.py:288-339 wiring IterativeRefinementPipeline)
    use_iterative_refinement: bool = False
    # progressive triangulation with unprocessed images + rough-pose
    # bootstrap (triangulation.py:439-729, CPE/pipeline.py:535-572,
    # 1138-1265, 1410-1571) and track extension (:795-855)
    enable_progressive: bool = True
    enable_track_extension: bool = True
    progressive_tolerance_px: float = 4.0
    # an unprocessed image that already holds this many pending 2D-3D
    # links is not re-bootstrapped: progressive triangulation otherwise
    # re-scans EVERY unprocessed image after EVERY registered view
    # (O(V^2) over a folder; measured 21% of steady per-view cost) for
    # links those images mostly already have. 0 restores the exhaustive
    # reference behaviour (CPE/pipeline.py:1138-1265).
    progressive_min_pending: int = 30
    track_extension_tolerance_px: float = 2.0
    max_points_per_pair: int = 150       # TriangulationConfig caps
    max_bootstrap_points_per_anchor: int = 200
    # background compile prewarm: a worker thread traces + compiles +
    # loads the predictable-shape programs (PnP/triangulation buckets up
    # front, BA buckets one rung ahead of each realized solve) on dummy
    # inputs while the pipeline works, so cold-start view additions hit
    # a warm executable cache (sfm/prewarm.py; a cold 50-view folder
    # spends ~120 of 155 s in first-trace + remote compile/load).
    # None = auto: on for non-CPU backends (XLA:CPU compiles are fast
    # and the single-core test machine would only lose to contention).
    prewarm_compile: Optional[bool] = None

    @property
    def mine_tolerance_px(self) -> float:  # backwards compat
        return self.mine_tolerance_ladder[0]


def _bucket(n: int, minimum: int = 512, factor: int = 4) -> int:
    """Pad-capacity bucket. Coarse buckets (512, 2048, 8192, ...) on
    purpose: every distinct capacity costs a fresh trace + remote
    compile/load of the RANSAC programs (~15-35 s each for the 5-point
    solver even with a warm compile cache); padding waste is millisecond
    noise next to that."""
    b = minimum
    while b < n:
        b *= factor
    return b


def _pad2(a: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros((n,) + a.shape[1:], a.dtype)
    out[:len(a)] = a
    return out


def _split_packed(packed, prob):
    """Split BAResult.packed (ONE tunnel pull) back into
    (cam_params (C,10), points (P,3), stats (5,)) numpy arrays —
    separate np.asarray of the three fields costs three ~30-80 ms round
    trips per incremental solve."""
    C = prob.cam_params.shape[0]
    P = prob.points.shape[0]
    flat = np.asarray(packed)
    return (flat[:C * 10].reshape(C, 10),
            flat[C * 10:C * 10 + P * 3].reshape(P, 3),
            flat[C * 10 + P * 3:])


_PPB_JIT = None   # single jitted instance so the trace cache persists
# guards the lazy builds below: the compile-prewarm worker thread
# (sfm/prewarm.py) calls these wrappers concurrently with the pipeline,
# and a double build would split the executable cache across two jit
# instances (the warm would then be wasted)
_LAZY_JIT_LOCK = __import__("threading").Lock()


def _progressive_pair_batch(P1, P2, K_a, K_bs, R_a, t_a, M, seeds,
                            threshold_px: float, method: str, tri_cfg):
    """One vmapped program for a group of (anchor, unprocessed) pairs:
    essential RANSAC -> pose recovery -> two-view triangulation, fused so
    the progressive-triangulation loop costs one device dispatch per
    capacity bucket instead of three per pair."""
    global _PPB_JIT
    with _LAZY_JIT_LOCK:
        _build_ppb_jit()
    return _PPB_JIT(P1, P2, K_a, K_bs, R_a, t_a, M, seeds,
                    threshold_px, method, tri_cfg)


def _build_ppb_jit():
    global _PPB_JIT
    if _PPB_JIT is None:
        import functools
        import jax
        import jax.numpy as jnp
        from tpu3drec.ops.epipolar import find_essential, recover_pose
        from tpu3drec.ops.triangulate import triangulate_two_view

        @functools.partial(jax.jit,
                           static_argnames=("threshold_px", "method",
                                            "tri_cfg"))
        def batch(P1, P2, K_a, K_bs, R_a, t_a, M, seeds, threshold_px,
                  method, tri_cfg):
            def one(p1, p2, K_b, mask, seed):
                key = jax.random.PRNGKey(seed)
                eres = find_essential(p1, p2, K_a, K_b, mask=mask,
                                      threshold_px=threshold_px,
                                      method=method, key=key)
                R_rel, t_rel, _ = recover_pose(eres.E, p1, p2, K_a, K_b,
                                               mask=eres.inliers)
                R_b = R_rel @ R_a
                t_b = R_rel @ t_a + t_rel  # unit-norm baseline (s = 1)
                tri = triangulate_two_view(p1, p2, K_a, K_b, R_a, t_a,
                                           R_b, t_b, mask=eres.inliers,
                                           config=tri_cfg)
                # ONE flat row per pair [pts.ravel() | mask | success,
                # n_inliers]: the caller pulls the whole chunk in a
                # single tunnel round trip instead of four
                return jnp.concatenate([
                    tri.points.ravel(),
                    tri.mask.astype(jnp.float32),
                    jnp.stack([eres.success.astype(jnp.float32),
                               eres.num_inliers.astype(jnp.float32)]),
                ])

            return jax.vmap(one)(P1, P2, K_bs, M, seeds)

        _PPB_JIT = batch


_LTB_JIT = None   # single jitted instance so the trace cache persists


def _leftover_tri_batch(PN, PO, K_new, R_new, t_new, K_os, R_os, t_os,
                        M, tri_cfg):
    """One vmapped two-view triangulation over a bucket of neighbours of
    a freshly registered camera (the new camera's K/R/t broadcast)."""
    global _LTB_JIT
    with _LAZY_JIT_LOCK:
        _build_ltb_jit()
    return _LTB_JIT(PN, PO, K_new, R_new, t_new, K_os, R_os, t_os, M,
                    tri_cfg)


def _build_ltb_jit():
    global _LTB_JIT
    if _LTB_JIT is None:
        import functools as _ft
        import jax
        from tpu3drec.ops.triangulate import triangulate_two_view

        @_ft.partial(jax.jit, static_argnames=("tri_cfg",))
        def batch(PN, PO, K_new, R_new, t_new, K_os, R_os, t_os, M,
                  tri_cfg):
            import jax.numpy as jnp

            def one(pn, po, K_o, R_o, t_o, mask):
                tri = triangulate_two_view(pn, po, K_new, K_o,
                                           R_new, t_new, R_o, t_o,
                                           mask=mask, config=tri_cfg)
                # [points | mask] packed so the caller pulls ONE array
                return jnp.concatenate(
                    [tri.points,
                     tri.mask.astype(jnp.float32)[:, None]], axis=1)

            return jax.vmap(one)(PN, PO, K_os, R_os, t_os, M)

        _LTB_JIT = batch


class SfMPipeline:
    """MainPosePipeline equivalent (CPE/pipeline.py:218)."""

    def __init__(self, config: Optional[SfMConfig] = None):
        self.config = config or SfMConfig()
        self.selector = InitializationPairSelector(ScoringConfig())
        self.intrinsics = ProgressiveIntrinsicsEstimator()
        self.history: List[Dict] = []
        self._view_timings: Dict[str, float] = {}
        # warm-start LM damping carried across incremental BA solves
        self._ba_lambda: Optional[float] = None
        # last converged mean-reprojection of an incremental solve —
        # the adaptive skip threshold's noise-floor estimate (an EWMA
        # lags the natural creep of the noise floor as the map grows
        # and never fires; measured 2026-08-19)
        self._ba_mre_last: Optional[float] = None
        # 2D-3D links pre-established for images that are not cameras yet
        # (track extension + bootstrap, reference triangulation.py:795-855):
        # image name -> list of (point_id, uv). Consumed by _mine_2d3d when
        # the image registers.
        self.pending_obs: Dict[str, List[Tuple[int, np.ndarray]]] = {}
        # background compile prewarmer (sfm/prewarm.py); live only while
        # reconstruct() runs
        self._prewarmer = None

    # ------------------------------------------------------------------
    def reconstruct(self, matches_data: Dict, image_info: Optional[Dict] = None,
                    output_dir=None, chosen_images: Optional[List[str]] = None,
                    checkpoint_dir=None, resume: bool = True
                    ) -> Reconstruction:
        """process_monument_reconstruction equivalent (CPE/pipeline.py:231).

        checkpoint_dir enables the reference's crash-safe SfM checkpointing
        (saved_variable.pkl, CPE/pipeline.py:529-533): full state is saved
        after two-view init and every registered view, and `resume=True`
        restarts from it.
        """
        try:
            return self._reconstruct(matches_data, image_info, output_dir,
                                     chosen_images, checkpoint_dir, resume)
        finally:
            if self._prewarmer is not None:
                self._prewarmer.close()
                # bound the one in-flight warm so no worker is left
                # inside an XLA call at interpreter shutdown
                self._prewarmer.join(30.0)
                self._prewarmer = None

    def _reconstruct(self, matches_data, image_info, output_dir,
                     chosen_images, checkpoint_dir, resume) -> Reconstruction:
        image_info = image_info or {}
        if chosen_images:
            matches_data = {k: v for k, v in matches_data.items()
                            if k[0] in chosen_images and k[1] in chosen_images}

        ckpt_path = None
        if checkpoint_dir is not None:
            Path(checkpoint_dir).mkdir(parents=True, exist_ok=True)
            ckpt_path = Path(checkpoint_dir) / "sfm_checkpoint.pkl"

        self.pending_obs = {}
        self._start_prewarm(matches_data)
        recon = Reconstruction()
        resumed = False
        if resume and ckpt_path is not None and ckpt_path.exists():
            try:
                recon = Reconstruction.load_state(ckpt_path)
                resumed = recon.num_cameras >= 2
            except Exception:
                recon = Reconstruction()
        if resumed:
            self.history.append({"phase": "resume",
                                 "cameras": recon.num_cameras,
                                 "points": recon.num_points})

        # ---- Phase 1: two-view initialization -------------------------
        if not resumed:
            t0 = time.perf_counter()
            init = self._initialize_two_view(recon, matches_data, image_info)
            if init is None:
                raise RuntimeError(
                    "two-view initialization failed: no usable pair")
            self.history.append({"phase": "init", **init,
                                 "time_s": time.perf_counter() - t0})
            # bootstrap progressive triangulation with unprocessed images
            # (CPE/pipeline.py:535-572, 1138-1265) + post-bootstrap BA
            if self.config.enable_progressive:
                n_boot = self._progressive_triangulate(
                    recon, list(recon.cameras), matches_data, image_info)
                if n_boot > 50:
                    self._run_ba(recon,
                                 optimize_cams=list(recon.cameras)[1:],
                                 max_iters=self.config.ba_max_iters)
                self.history.append({"phase": "bootstrap",
                                     "points_added": n_boot})
            if self.config.enable_track_extension:
                n_ext = self._extend_tracks(recon, matches_data)
                self.history.append({"phase": "track_extension",
                                     "links_added": n_ext})
            if ckpt_path is not None:
                recon.save_state(ckpt_path)

        # ---- Phase 2: incremental view addition ------------------------
        all_images = {n for pair in matches_data for n in pair}
        remaining = sorted(all_images - set(recon.cameras))
        while remaining:
            # 2D-3D-visibility-aware ordering against the growing cloud
            # (CPE/pipeline.py:1723-1984; VERDICT r2 #4)
            t_rank = time.perf_counter()
            ranked = self.selector.rank_next_views(
                remaining, list(recon.cameras), matches_data, recon=recon)
            t_rank = time.perf_counter() - t_rank
            if not ranked or ranked[0][1] <= 0:
                break
            name = ranked[0][0]
            t0 = time.perf_counter()
            self._view_timings = {}
            added = self._add_view(recon, name, matches_data, image_info)
            remaining.remove(name)
            # global-polish warm lead time: the warm takes ~13 s in the
            # background vs ~2.5-4 s/view cold — 4 views out gives it
            # room; the 8% growth margin in _prewarm_global_ba covers
            # the extra map drift
            if self._prewarmer is not None and 0 < len(remaining) <= 4:
                self._prewarm_global_ba(recon, n_total=len(all_images))
            self.history.append({"phase": "add_view", "image": name,
                                 "success": added,
                                 "time_s": time.perf_counter() - t0,
                                 "rank_s": t_rank,
                                 **self._view_timings})
            if added and ckpt_path is not None:
                recon.save_state(ckpt_path)  # checkpoint after every view

        # ---- Phase 3: global optimization ------------------------------
        t0 = time.perf_counter()
        stats = self._global_ba(recon)
        self._validate_points(recon)
        self.history.append({"phase": "global_ba", **stats,
                             "time_s": time.perf_counter() - t0})

        # ---- Phase 4: export --------------------------------------------
        if output_dir is not None:
            self.export(recon, output_dir)
        return recon

    # ------------------------------------------------------------------
    def _image_size(self, name: str, image_info: Dict,
                    corr: Optional[np.ndarray] = None) -> Tuple[int, int]:
        info = image_info.get(name, {})
        w, h = info.get("width", 0), info.get("height", 0)
        if w and h:
            return int(w), int(h)
        if corr is not None and len(corr):
            return (int(corr[:, 0].max()) + 1, int(corr[:, 1].max()) + 1)
        return (640, 480)

    def _initialize_two_view(self, recon: Reconstruction,
                             matches_data: Dict, image_info: Dict
                             ) -> Optional[Dict]:
        """CPE/pipeline.py:265-592."""
        import jax
        import jax.numpy as jnp
        from tpu3drec.ops.epipolar import find_essential, recover_pose
        from tpu3drec.ops.triangulate import (
            triangulate_two_view, TriangulationConfig,
        )
        from tpu3drec.ops.ba import bundle_adjust, BAConfig

        from tpu3drec.sfm.pair_selector import validate_correspondences

        best = self.selector.get_best_pair(matches_data, image_info)
        if best is None:
            return None
        # standalone correspondence-validation gate on the candidate init
        # pairs (essential_estimation.py:276-381): structurally invalid
        # pairs fall through to the next ranked candidate
        ranked = sorted(self.selector.scores.items(),
                        key=lambda kv: -kv[1]["total"])
        chosen = None
        for (name1, name2), score in ranked[:8]:
            if score["total"] <= 0:
                break
            corr = np.asarray(
                matches_data[(name1, name2)]["correspondences"], np.float32)
            size1 = self._image_size(name1, image_info, corr[:, :2])
            val = validate_correspondences(
                corr[:, :2], corr[:, 2:], size1,
                min_points=self.config.min_init_inliers)
            if val["valid"]:
                chosen = ((name1, name2), score, corr, val)
                break
        if chosen is None:
            return None
        (name1, name2), score, corr, val = chosen
        self.history.append({"phase": "init_validation",
                             "pair": (name1, name2),
                             "quality_level": val["quality_level"],
                             "warnings": val["warnings"]})
        size1 = self._image_size(name1, image_info, corr[:, :2])
        size2 = self._image_size(name2, image_info, corr[:, 2:])
        K1 = self.intrinsics.estimate(*size1)
        K2 = self.intrinsics.estimate(*size2)

        if self.config.use_iterative_refinement:
            # pipeline2 path: refine K1/K2 jointly with the two-view
            # geometry before the main init (pipeline2.py:288-339);
            # falls back to the heuristic Ks on failure (:300-310)
            from tpu3drec.sfm.refinement import (
                iterative_refinement, RefinementConfig,
            )
            ref = iterative_refinement(corr[:, :2], corr[:, 2:], K1, K2,
                                       size1, size2, RefinementConfig())
            if ref is not None:
                K1, K2 = ref.K1, ref.K2

        n = len(corr)
        cap = _bucket(n)
        p1 = jnp.asarray(_pad2(corr[:, :2], cap))
        p2 = jnp.asarray(_pad2(corr[:, 2:], cap))
        mask = jnp.asarray(np.arange(cap) < n)

        eres = find_essential(p1, p2, jnp.asarray(K1.astype(np.float32)),
                              jnp.asarray(K2.astype(np.float32)), mask=mask,
                              threshold_px=self.config.essential_threshold_px,
                              method=self.config.essential_method,
                              key=jax.random.PRNGKey(0))
        num_inl = int(eres.num_inliers)
        if (not bool(eres.success) or num_inl < self.config.min_init_inliers
                or float(eres.inlier_ratio) < self.config.min_init_inlier_ratio):
            return None
        R, t, _ = recover_pose(eres.E, p1, p2,
                               jnp.asarray(K1.astype(np.float32)),
                               jnp.asarray(K2.astype(np.float32)),
                               mask=eres.inliers)

        recon.add_camera(Camera(name1, np.eye(3), np.zeros(3), K1, size1))
        recon.add_camera(Camera(name2, np.asarray(R, np.float64),
                                np.asarray(t, np.float64), K2, size2))

        tri_cfg = TriangulationConfig(
            min_angle_deg=self.config.min_angle_deg,
            max_reproj_px=self.config.max_reproj_px)
        tri = triangulate_two_view(
            p1, p2, jnp.asarray(K1.astype(np.float32)),
            jnp.asarray(K2.astype(np.float32)),
            jnp.eye(3), jnp.zeros(3), R, t,
            mask=eres.inliers, config=tri_cfg)
        ok = np.asarray(tri.mask)
        pts = np.asarray(tri.points)
        p1n, p2n = np.asarray(p1), np.asarray(p2)
        sel = np.where(ok)[0]
        ids = recon.add_points_batch(pts[sel])
        recon.add_observations_batch(name1, ids, p1n[sel])
        recon.add_observations_batch(name2, ids, p2n[sel])
        n_first = len(sel)

        # BA over the two views (fix cam1, fix scale via cam2 translation norm
        # being free -> instead freeze one translation coordinate)
        self._run_ba(recon, optimize_cams=[name2],
                     max_iters=self.config.ba_max_iters)

        # relaxed re-triangulation of rejected inlier correspondences
        # (CPE/pipeline.py:421-507): retry with wider reproj/angle gates and
        # depth bounds adapted to the accepted cloud
        rej = np.asarray(eres.inliers) & ~ok & np.asarray(mask)
        n_rescued = 0
        if rej.any() and n_first > 0:
            depths = np.asarray(tri.depths1)[ok]
            lo, hi = np.percentile(depths, [2, 98])
            relaxed = TriangulationConfig(
                min_angle_deg=self.config.relaxed_angle_deg,
                max_reproj_px=self.config.relaxed_reproj_px)
            cam2 = recon.cameras[name2]
            tri2 = triangulate_two_view(
                p1, p2, jnp.asarray(recon.cameras[name1].K.astype(np.float32)),
                jnp.asarray(cam2.K.astype(np.float32)),
                jnp.eye(3), jnp.zeros(3),
                jnp.asarray(cam2.R.astype(np.float32)),
                jnp.asarray(cam2.t.astype(np.float32)),
                mask=jnp.asarray(rej), config=relaxed,
                # adaptive depth bounds ride as traced scalars — static
                # config fields would recompile per reconstruction
                depth_bounds=(jnp.float32(max(lo * 0.5, 1e-3)),
                              jnp.float32(hi * 2.0)))
            sel2 = np.where(np.asarray(tri2.mask))[0]
            ids2 = recon.add_points_batch(np.asarray(tri2.points)[sel2])
            recon.add_observations_batch(name1, ids2, p1n[sel2])
            recon.add_observations_batch(name2, ids2, p2n[sel2])
            n_rescued = len(sel2)

        self.intrinsics.learn(recon.cameras[name1].K, *size1)
        self.intrinsics.learn(recon.cameras[name2].K, *size2)
        return {"pair": (name1, name2), "pair_score": score["total"],
                "essential_inliers": num_inl,
                "points_initial": n_first, "points_rescued": n_rescued}

    # ------------------------------------------------------------------
    def _mine_at_tolerance(self, recon: Reconstruction, new_name: str,
                           matches_data: Dict, tol: float, seen: set
                           ) -> Tuple[List, List, List]:
        uv_new, pids, leftovers = [], [], []
        seen_points = set(seen)
        for pair, pd in matches_data.items():
            if "error" in pd or new_name not in pair:
                continue
            other = pair[0] if pair[1] == new_name else pair[1]
            if other not in recon.cameras:
                continue
            corr = np.asarray(pd.get("correspondences", []), np.float64)
            if len(corr) == 0:
                continue
            if pair[0] == new_name:
                new_xy, other_xy = corr[:, :2], corr[:, 2:]
            else:
                new_xy, other_xy = corr[:, 2:], corr[:, :2]
            obs_pid, obs_uv = recon.camera_obs_arrays(other)
            if len(obs_pid) == 0:
                leftovers.append((other, new_xy, other_xy,
                                  np.ones(len(corr), bool)))
                continue
            dist, j = _min_dists(other_xy, obs_uv)
            hit = dist <= tol
            # vectorized dedup: first hit per point id, minus points
            # already claimed this view (the per-hit python loop scaled
            # with hits x pairs at reference scale)
            hi = np.where(hit)[0]
            cand = obs_pid[j[hi]].astype(int)
            first = np.unique(cand, return_index=True)[1]
            for k in np.sort(first):
                pid = int(cand[k])
                if pid not in seen_points:
                    seen_points.add(pid)
                    uv_new.append(new_xy[hi[k]])
                    pids.append(pid)
            leftovers.append((other, new_xy, other_xy, ~hit))
        return uv_new, pids, leftovers

    def _mine_2d3d(self, recon: Reconstruction, new_name: str,
                   matches_data: Dict) -> Tuple[np.ndarray, np.ndarray, List]:
        """2D-3D correspondence mining with tolerance fallback ladder
        (CPE/pipeline.py:1985-2187, correspondence_manager.py:375-555).

        Pre-established links from track extension / bootstrap
        (self.pending_obs) are consumed first; the ladder widens the pixel
        gate until min_pnp_correspondences are found. Also returns the
        leftover 2D-2D correspondences for later triangulation.
        """
        pend = self.pending_obs.get(new_name, [])
        n_pts = recon.num_points
        base_pids = []
        base_uv = []
        seen = set()
        for pid, uv in pend:
            pid = int(pid)
            if pid < n_pts and pid not in seen:
                seen.add(pid)
                base_pids.append(pid)
                base_uv.append(np.asarray(uv, np.float64))

        need = self.config.min_pnp_correspondences
        uv_new, pids, leftovers = [], [], []
        for tol in self.config.mine_tolerance_ladder:
            uv_new, pids, leftovers = self._mine_at_tolerance(
                recon, new_name, matches_data, tol, seen)
            if len(uv_new) + len(base_uv) >= need:
                break

        all_uv = base_uv + uv_new
        all_pids = base_pids + pids
        if not all_uv:
            return np.zeros((0, 2)), np.zeros(0, int), leftovers
        return np.stack(all_uv), np.asarray(all_pids, int), leftovers

    def _add_view(self, recon: Reconstruction, name: str,
                  matches_data: Dict, image_info: Dict) -> bool:
        """CPE/pipeline.py:912-966 + helpers."""
        import jax
        import jax.numpy as jnp
        from tpu3drec.ops.pnp import solve_pnp_ransac
        from tpu3drec.ops.triangulate import TriangulationConfig

        # per-phase wall timings land in the add_view history entry so a
        # TPU run can say which program dominates the per-view cost
        tdetail = self._view_timings = {}
        t0 = time.perf_counter()
        uv, pids, leftovers = self._mine_2d3d(recon, name, matches_data)
        tdetail["mine_s"] = time.perf_counter() - t0
        if len(uv) < self.config.min_pnp_correspondences:
            return False
        size = self._image_size(name, image_info, uv)
        K = self.intrinsics.estimate(*size)

        n = len(uv)
        cap = _bucket(n)
        if self._prewarmer is not None:
            self._prewarmer.mark(("pnp", cap))
        X = _pad2(recon.points_array()[pids].astype(np.float32), cap)
        uv_p = _pad2(uv.astype(np.float32), cap)
        mask = np.arange(cap) < n
        t0 = time.perf_counter()
        res = solve_pnp_ransac(jnp.asarray(X), jnp.asarray(uv_p),
                               jnp.asarray(K.astype(np.float32)),
                               mask=jnp.asarray(mask),
                               threshold_px=self.config.pnp_threshold_px,
                               key=jax.random.PRNGKey(len(recon.cameras)))
        # whole PnP result in ONE pull (success/num_inliers/R/t/inliers
        # as separate np.asarray calls cost ~5 tunnel round trips)
        flat = np.asarray(res.packed)
        success = flat[0] > 0.5
        num_inliers = int(flat[1])
        tdetail["pnp_s"] = time.perf_counter() - t0
        if not success or \
                num_inliers < self.config.min_pnp_correspondences:
            return False

        R = flat[4:13].reshape(3, 3).astype(np.float64)
        t = flat[13:16].astype(np.float64)
        recon.add_camera(Camera(name, R, t, K, size))
        inl = np.where(flat[16:16 + n] > 0.5)[0]
        recon.add_observations_batch(name, pids[inl], uv[inl])
        self.pending_obs.pop(name, None)

        # triangulate brand-new points against each processed neighbour
        # — ONE vmapped dispatch per capacity bucket instead of one
        # dispatch + two host pulls per neighbour (each round trip is
        # ~25-30 ms over the tunnel; tri_s measured ~125 ms/view serial)
        tri_cfg = TriangulationConfig(
            min_angle_deg=self.config.min_angle_deg,
            max_reproj_px=self.config.max_reproj_px)
        n_new = 0
        t0 = time.perf_counter()
        by_cap: Dict[int, list] = {}
        for other, new_xy, other_xy, left in leftovers:
            idx = np.where(left)[0]
            if len(idx) < 8:
                continue
            by_cap.setdefault(_bucket(len(idx)), []).append(
                (other, new_xy, other_xy, idx))
        # dispatch every capacity bucket FIRST, pull afterwards: jax
        # dispatch is async on this backend (only np.asarray blocks), so
        # queueing all bucket programs overlaps device execution and
        # result transfer across buckets instead of paying a full
        # dispatch+exec+pull tunnel round trip per bucket
        pending = []
        for cap2, items in by_cap.items():
            if self._prewarmer is not None:
                n_pad_k = 1 << max(0, len(items) - 1).bit_length()
                self._prewarmer.mark(("ltri", n_pad_k, cap2, tri_cfg))
            # pad the ITEM count to a power of 2 as well: the vmapped
            # program's shape is (n_items, cap2), and an unbucketed
            # leading dim would cost a fresh trace + remote load per
            # distinct neighbour count (ADVICE r4 #2); padded slots are
            # all-masked dummies
            n_pad = 1 << max(0, len(items) - 1).bit_length()
            PN = np.stack([_pad2(it[1][it[3]].astype(np.float32), cap2)
                           for it in items]
                          + [np.zeros((cap2, 2), np.float32)]
                          * (n_pad - len(items)))
            PO = np.stack([_pad2(it[2][it[3]].astype(np.float32), cap2)
                           for it in items]
                          + [np.zeros((cap2, 2), np.float32)]
                          * (n_pad - len(items)))
            MM = np.stack([np.arange(cap2) < len(it[3]) for it in items]
                          + [np.zeros(cap2, bool)] * (n_pad - len(items)))
            eye = np.eye(3, dtype=np.float32)
            K_os = np.stack([recon.cameras[it[0]].K.astype(np.float32)
                             for it in items]
                            + [eye] * (n_pad - len(items)))
            R_os = np.stack([recon.cameras[it[0]].R.astype(np.float32)
                             for it in items]
                            + [eye] * (n_pad - len(items)))
            t_os = np.stack([recon.cameras[it[0]].t.astype(np.float32)
                             for it in items]
                            + [np.ones(3, np.float32)]
                            * (n_pad - len(items)))
            dev_b = _leftover_tri_batch(
                jnp.asarray(PN), jnp.asarray(PO),
                jnp.asarray(K.astype(np.float32)),
                jnp.asarray(R.astype(np.float32)),
                jnp.asarray(t.astype(np.float32)),
                jnp.asarray(K_os), jnp.asarray(R_os), jnp.asarray(t_os),
                jnp.asarray(MM), tri_cfg)     # (n_pad, cap2, 4)
            pending.append((items, dev_b))
        for items, dev_b in pending:
            packed_b = np.asarray(dev_b)      # 1 pull per bucket
            pts_b = packed_b[..., :3]
            mask_b = packed_b[..., 3] > 0.5
            for (other, new_xy, other_xy, idx), pts_i, m_i in zip(
                    items, pts_b, mask_b):
                sel = np.where(m_i)[0]
                ids = recon.add_points_batch(pts_i[sel])
                recon.add_observations_batch(name, ids, new_xy[idx[sel]])
                recon.add_observations_batch(other, ids, other_xy[idx[sel]])
                n_new += len(sel)

        tdetail["tri_s"] = time.perf_counter() - t0

        # progressive triangulation of the new camera against unprocessed
        # images + track extension (triangulation.py:439-729, 795-855)
        t0 = time.perf_counter()
        if self.config.enable_progressive:
            self._progressive_triangulate(recon, [name], matches_data,
                                          image_info)
        tdetail["prog_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        if self.config.enable_track_extension:
            self._extend_tracks(recon, matches_data, only_camera=name)
        tdetail["ext_s"] = time.perf_counter() - t0

        # incremental BA: last <=window cameras free, all points free
        # (dict preserves insertion order = processing order)
        t0 = time.perf_counter()
        recent = list(recon.cameras)[-self.config.incremental_ba_window:]
        out = self._run_ba(recon, optimize_cams=recent,
                           max_iters=self.config.ba_max_iters,
                           ftol=self.config.incremental_ba_ftol,
                           skip_if_below_px=self.config
                           .incremental_ba_skip_px,
                           warm_start=self.config.warm_start_lambda)
        tdetail["ba_s"] = time.perf_counter() - t0
        tdetail["ba_iters"] = out.get("iterations", 0)
        tdetail["ba_mre0"] = out.get("initial_mean_reproj_px", -1.0)
        tdetail["ba_mre"] = out.get("mean_reproj_px", -1.0)
        self.intrinsics.learn(recon.cameras[name].K, *size)
        return True

    # ------------------------------------------------------------------
    def _progressive_triangulate(self, recon: Reconstruction,
                                 anchors: List[str], matches_data: Dict,
                                 image_info: Dict) -> int:
        """Progressive triangulation with *unprocessed* images
        (triangulation.py:439-729, CPE/pipeline.py:1138-1265).

        For each anchor camera x unprocessed image with enough fresh
        matches: estimate a rough pose for the unprocessed image (essential
        RANSAC + cheirality, the reference's rough-pose estimation
        :1410-1571), triangulate, and resolve the unknown baseline scale by
        rescaling the new points about the anchor center so their median
        anchor-frame depth matches the anchor's existing cloud (the
        reference instead clamps to a conservative 0.5..20 range —
        scale-consistent rescaling keeps bootstrap points compatible with
        BA). New points get a real observation in the anchor and a pending
        observation for the unprocessed image.
        """
        import jax
        import jax.numpy as jnp
        from tpu3drec.ops.epipolar import find_essential, recover_pose
        from tpu3drec.ops.triangulate import (
            triangulate_two_view, TriangulationConfig,
        )
        from tpu3drec.sfm.correspondence import lookup_pair

        cfg = self.config
        all_images = {n for pair in matches_data for n in pair}
        unprocessed = sorted(all_images - set(recon.cameras))
        if not unprocessed:
            return 0
        tri_cfg = TriangulationConfig(min_angle_deg=cfg.min_angle_deg,
                                      max_reproj_px=cfg.relaxed_reproj_px)
        total = 0
        for anchor in anchors:
            cam_a = recon.cameras[anchor]
            K_a = jnp.asarray(cam_a.K.astype(np.float32))
            obs_pid_a, obs_uv_a = recon.camera_obs_arrays(anchor)
            # scale prior: median anchor-frame depth of the existing cloud
            pts_all = np.asarray(recon.points)
            if len(pts_all) == 0:
                continue
            ref_ids = (obs_pid_a if len(obs_pid_a)
                       else np.arange(len(pts_all)))
            X = pts_all[ref_ids]
            depth_a = (cam_a.R @ X.T + cam_a.t[:, None])[2]
            pos = depth_a[depth_a > 0]
            if len(pos) == 0:
                continue
            target_depth = float(np.median(pos))
            # gather every eligible boot pair, then run the whole
            # essential -> pose -> triangulate chain as ONE vmapped
            # program per capacity bucket (the serial loop cost 3 device
            # dispatches per pair through the remote tunnel)
            cands = []
            for boot in unprocessed:
                if (cfg.progressive_min_pending > 0
                        and len(self.pending_obs.get(boot, []))
                        >= cfg.progressive_min_pending):
                    continue   # already richly linked; skip re-bootstrap
                corr = lookup_pair(matches_data, anchor, boot)
                if corr is None or len(corr) < 8:
                    continue
                a_xy, b_xy = corr[:, :2], corr[:, 2:]
                if len(obs_uv_a):
                    dist, _ = _min_dists(a_xy, obs_uv_a)
                    fresh = dist > cfg.progressive_tolerance_px
                else:
                    fresh = np.ones(len(corr), bool)
                if fresh.sum() < 8:
                    continue
                a_f = a_xy[fresh].astype(np.float32)
                b_f = b_xy[fresh].astype(np.float32)
                size_b = self._image_size(boot, image_info, b_f)
                K_b = self.intrinsics.estimate(*size_b)
                cands.append((boot, a_f, b_f, K_b))

            results = {}
            by_cap: Dict[int, list] = {}
            for c in cands:
                by_cap.setdefault(_bucket(len(c[1])), []).append(c)
            R_aj = jnp.asarray(cam_a.R.astype(np.float32))
            t_aj = jnp.asarray(cam_a.t.astype(np.float32))
            # the group axis runs in FIXED-size chunks (dummy rows have
            # mask all-False and are sliced away): one traced program per
            # correspondence-capacity bucket, regardless of how many
            # boot pairs a folder produces
            CHUNK = 4
            # dispatch every (bucket, chunk) program FIRST, pull after:
            # dispatch is async on this backend (np.asarray is the only
            # sync point), so queueing the whole view's programs overlaps
            # device execution and result transfer across groups instead
            # of paying a serial dispatch+exec+pull round trip per group
            pending = []
            for cap, group in sorted(by_cap.items()):
                if self._prewarmer is not None:
                    self._prewarmer.mark(
                        ("prog", cap, cfg.essential_threshold_px,
                         cfg.essential_method, tri_cfg))
                for s in range(0, len(group), CHUNK):
                    part = group[s:s + CHUNK]
                    P1 = np.zeros((CHUNK, cap, 2), np.float32)
                    P2 = np.zeros((CHUNK, cap, 2), np.float32)
                    M = np.zeros((CHUNK, cap), bool)
                    Kbs = np.tile(np.eye(3, dtype=np.float32),
                                  (CHUNK, 1, 1))
                    seeds = [0] * CHUNK
                    for g, (boot, a_f, b_f, K_b) in enumerate(part):
                        P1[g, :len(a_f)] = a_f
                        P2[g, :len(b_f)] = b_f
                        M[g, :len(a_f)] = True
                        Kbs[g] = K_b
                        # crc32, not hash(): python string hashes are
                        # salted per process and would make
                        # reconstructions non-deterministic across runs
                        seeds[g] = zlib.crc32(boot.encode()) & 0x7FFFFFFF
                    out = _progressive_pair_batch(
                        jnp.asarray(P1), jnp.asarray(P2), K_a,
                        jnp.asarray(Kbs), R_aj, t_aj, jnp.asarray(M),
                        jnp.asarray(np.asarray(seeds, np.uint32)),
                        cfg.essential_threshold_px, cfg.essential_method,
                        tri_cfg)
                    pending.append((cap, part, out))
            for cap, part, out in pending:
                flat = np.asarray(out)            # (CHUNK, cap*4 + 2)
                pts_g = flat[:, :cap * 3].reshape(
                    len(flat), cap, 3).astype(np.float64)
                mask_g = flat[:, cap * 3:cap * 4] > 0.5
                ok_g = flat[:, cap * 4] > 0.5
                ninl_g = flat[:, cap * 4 + 1].astype(np.int64)
                for g, (boot, a_f, b_f, K_b) in enumerate(part):
                    results[boot] = (pts_g[g], mask_g[g],
                                     bool(ok_g[g]), int(ninl_g[g]),
                                     a_f, b_f)

            added_anchor = 0
            for boot in unprocessed:
                if added_anchor >= cfg.max_bootstrap_points_per_anchor:
                    break
                if boot not in results:
                    continue
                pts_all_b, tri_mask, ok, ninl, a_f, b_f = results[boot]
                if not ok or ninl < 15:
                    continue
                sel = np.where(tri_mask)[0]
                if len(sel) == 0:
                    continue
                pts = pts_all_b[sel]
                # resolve scale about the anchor center
                depths = (cam_a.R @ pts.T + cam_a.t[:, None])[2]
                med = float(np.median(depths))
                if med <= 1e-9:
                    continue
                s = target_depth / med
                C_a = cam_a.center
                pts = C_a[None] + s * (pts - C_a[None])
                budget = min(cfg.max_points_per_pair,
                             cfg.max_bootstrap_points_per_anchor
                             - added_anchor)
                if len(sel) > budget:
                    sel = sel[:budget]
                    pts = pts[:budget]
                ids = recon.add_points_batch(pts)
                recon.add_observations_batch(anchor, ids, a_f[sel])
                pend = self.pending_obs.setdefault(boot, [])
                pend.extend(zip(ids, b_f[sel]))
                added_anchor += len(sel)
                total += len(sel)
        return total

    def _extend_tracks(self, recon: Reconstruction, matches_data: Dict,
                       only_camera: Optional[str] = None) -> int:
        """Track extension to unprocessed images (triangulation.py:795-855):
        pre-link existing 3D points to not-yet-registered images via their
        matches with registered cameras; consumed by _mine_2d3d at
        registration time (feeds PnP directly)."""
        from tpu3drec.sfm.correspondence import lookup_pair

        cfg = self.config
        all_images = {n for pair in matches_data for n in pair}
        cams = [only_camera] if only_camera else list(recon.cameras)
        count = 0
        for boot in sorted(all_images - set(recon.cameras)):
            pend = self.pending_obs.setdefault(boot, [])
            have = {int(p) for p, _ in pend}
            for cam_name in cams:
                if cam_name not in recon.cameras:
                    continue
                corr = lookup_pair(matches_data, boot, cam_name)
                if corr is None:
                    continue
                obs_pid, obs_uv = recon.camera_obs_arrays(cam_name)
                if len(obs_pid) == 0:
                    continue
                dist, j = _min_dists(corr[:, 2:], obs_uv)
                hi = np.where(dist <= cfg.track_extension_tolerance_px)[0]
                cand = obs_pid[j[hi]].astype(int)
                first = np.unique(cand, return_index=True)[1]
                for k in first:
                    pid = int(cand[k])
                    if pid not in have:
                        have.add(pid)
                        pend.append((pid, corr[hi[k], :2].copy()))
                        count += 1
        return count

    # ------------------------------------------------------------------
    # -- background compile prewarm (sfm/prewarm.py) --------------------
    def _start_prewarm(self, matches_data: Dict) -> None:
        """Start the worker and submit the up-front warm list: every
        program shape here is derivable from matches_data pair sizes
        before any of them runs (measured first-trace costs: PnP 16.6 s,
        progressive batch 8.7 s, leftover-triangulation 1-3 s each)."""
        enabled = self.config.prewarm_compile
        if enabled is None:
            import jax
            enabled = jax.default_backend() != "cpu"
        if not enabled or not matches_data:
            return
        from tpu3drec.ops.triangulate import TriangulationConfig
        from tpu3drec.sfm.prewarm import (
            CompilePrewarmer, warm_pnp, warm_progressive, warm_leftover_tri)
        cfg = self.config

        def _pair_len(v) -> int:
            # matches_data values are {"correspondences": (N, 4), ...}
            # dicts (io/batch_pickle.py schema) but raw (N, 4) arrays are
            # accepted everywhere lookup_pair is, so accept both here
            if v is None:
                return 0
            if isinstance(v, dict):
                c = v.get("correspondences")
                return 0 if c is None else len(c)
            return len(v)

        sizes = [n for n in map(_pair_len, matches_data.values())
                 if n >= 8]
        if not sizes:
            return
        import os
        from tpu3drec.sfm.prewarm import warm_ba, ba_key
        pw = self._prewarmer = CompilePrewarmer(
            workers=int(os.environ.get("TPU3DREC_PREWARM_WORKERS", "1")))
        # Submit in critical-path order (the queue drains in order even
        # with several workers): progressive triangulation is needed at
        # bootstrap (~seconds in), PnP + the early-BA configs from view
        # 3, incremental-BA rungs and leftover-tri after that.
        # progressive-triangulation caps: fresh counts <= pair size;
        # warm each realized pair bucket and the rung below it (fresh
        # subsets shrink), most-frequent bucket first
        tri_prog = TriangulationConfig(min_angle_deg=cfg.min_angle_deg,
                                       max_reproj_px=cfg.relaxed_reproj_px)
        freq: Dict[int, int] = {}
        for s in sizes:
            b = _bucket(s)
            freq[b] = freq.get(b, 0) + 1
            if b > 512:
                freq.setdefault(b // 4, 0)
        for cap in sorted(freq, key=lambda b: -freq[b]):
            pw.submit(("prog", cap, cfg.essential_threshold_px,
                       cfg.essential_method, tri_prog),
                      warm_progressive(cap, cfg.essential_threshold_px,
                                       cfg.essential_method, tri_prog))
        # PnP caps: the 2D-3D mining count is bounded by an image's total
        # matches across pairs; warm ladder rungs a mining count could
        # land in (n in (cap/4, cap]), most-likely first
        totals: Dict[str, int] = {}
        for (a, b), v in matches_data.items():
            n = _pair_len(v)
            if not n:
                continue
            totals[a] = totals.get(a, 0) + n
            totals[b] = totals.get(b, 0) + n
        max_tot = max(totals.values())
        for cap in (2048, 8192, 512, 32768):
            if cap == 512 or max_tot > cap // 4:
                pw.submit(("pnp", cap),
                          warm_pnp(cap, cfg.pnp_threshold_px))
        # bottom BA rungs for BOTH pipeline configs: the post-two-view /
        # post-bootstrap solves (ftol 1e-6, ungated semantics) and the
        # first incremental solves (gated) all land in the ladder's
        # lowest buckets (local problems: C<=8 window+anchor cams, P
        # through 1024/4096, M through 4096/16384) — without these the
        # FIRST solve of each config pays trace+load on the critical path
        bcfg = self._ba_cfg(cfg.ba_max_iters, 1e-6, 0.0)
        icfg = self._ba_cfg(cfg.ba_max_iters, cfg.incremental_ba_ftol,
                            cfg.incremental_ba_skip_px)
        for c, p, m in ((8, 1024, 4096), (8, 4096, 16384),
                        (8, 4096, 4096), (8, 1024, 16384)):
            pw.submit(ba_key(bcfg, c, p, m), warm_ba(bcfg, c, p, m))
            pw.submit(ba_key(icfg, c, p, m), warm_ba(icfg, c, p, m))
        # leftover-triangulation (n_pad, cap) grid: leftover counts are
        # small subsets of pair matches; the realized combos live in the
        # bottom rungs
        tri_left = TriangulationConfig(min_angle_deg=cfg.min_angle_deg,
                                       max_reproj_px=cfg.max_reproj_px)
        for cap in (512, 2048):
            if cap > 512 and max(sizes) <= cap // 4:
                continue
            for n_pad in (1, 2, 4, 8):
                pw.submit(("ltri", n_pad, cap, tri_left),
                          warm_leftover_tri(n_pad, cap, tri_left))

    def _prewarm_ba_rungs(self, ba_cfg, prob, rungs: bool) -> None:
        """Mark the realized BA shape; for the per-view (incremental)
        config also warm one rung ahead on each bucket axis so the next
        crossing hits a loaded executable. Wrong-rung warms only cost
        background time (the gated dummy solve is one residual pass)."""
        pw = self._prewarmer
        if pw is None:
            return
        from tpu3drec.sfm.prewarm import warm_ba, ba_key
        from tpu3drec.sfm.reconstruction import ba_bucket_next
        Cp = prob.cam_params.shape[0]
        Pp = prob.points.shape[0]
        Mp = prob.obs_cam.shape[0]
        pw.mark(ba_key(ba_cfg, Cp, Pp, Mp))
        if not rungs:
            return
        nC = ba_bucket_next(Cp, "cams")
        nP = ba_bucket_next(Pp, "points")
        nM = ba_bucket_next(Mp, "obs")
        # front=True: the crossing lands within a few views (~2-4 s/view)
        # — these must not wait behind the up-front list (measured
        # 2026-08-19: 14.9/10.9/9.4 s cold BA spikes while rung warms sat
        # mid-queue). Submitted least- to most-likely so the LIKELIEST
        # crossing ((Cp, Pp, nM): obs grow fastest) ends up frontmost.
        for c, p, m in ((nC, nP, nM), (nC, Pp, nM), (Cp, nP, Mp),
                        (Cp, nP, nM), (Cp, Pp, nM)):
            pw.submit(ba_key(ba_cfg, c, p, m), warm_ba(ba_cfg, c, p, m),
                      front=True)

    def _prewarm_global_ba(self, recon: Reconstruction,
                           n_total: int) -> None:
        """Near the end of view addition, warm the final global-polish
        program at the projected full-map buckets (the map grows a few
        percent more at most, so the current bucket — plus the next rung
        when within 8% of a boundary — covers the final shape)."""
        pw = self._prewarmer
        if pw is None:
            return
        import jax
        if (self.config.use_sharded_global_ba and len(jax.devices()) > 1
                and recon.num_observations >= self.config.sharded_ba_min_obs):
            return  # the sharded path runs instead (parallel/ba.py)
        from tpu3drec.sfm.prewarm import warm_ba, ba_key
        from tpu3drec.sfm.reconstruction import (
            ba_bucket_cams, ba_bucket_points, ba_bucket_obs)
        gcfg = self._ba_cfg(self.config.global_ba_max_iters, 1e-6, 0.0)
        Cp = ba_bucket_cams(n_total)
        for p in {ba_bucket_points(recon.num_points),
                  ba_bucket_points(int(recon.num_points * 1.08))}:
            for m in {ba_bucket_obs(recon.num_observations),
                      ba_bucket_obs(int(recon.num_observations * 1.08))}:
                pw.submit(ba_key(gcfg, Cp, p, m), warm_ba(gcfg, Cp, p, m),
                          front=True)

    def _ba_cfg(self, max_iters: int, ftol: float,
                skip_if_below_px: float):
        """BAConfig for a pipeline solve. Every config is GATED
        (skip_if_below_px > 0) so the compile prewarmer's dummy solves
        exit after one residual pass instead of running max_iters LM
        iterations; a traced skip_below_px of 0.0 keeps the ungated
        semantics exactly (the initial mean reprojection is never < 0,
        and the gate's one residual pass is computed for stats anyway)."""
        from tpu3drec.ops.ba import BAConfig
        return BAConfig(max_iters=max_iters, ftol=ftol,
                        optimize_intrinsics=self.config.optimize_intrinsics,
                        skip_if_below_px=max(skip_if_below_px, 1e-12))

    def _run_ba(self, recon: Reconstruction,
                optimize_cams: Optional[List[str]] = None,
                max_iters: int = 20, ftol: float = 1e-6,
                skip_if_below_px: float = 0.0,
                warm_start: bool = False) -> Dict:
        from tpu3drec.ops.ba import bundle_adjust
        if recon.num_points == 0 or recon.num_observations < 10:
            return {"skipped": True}
        ocam_names = set(recon.cameras)
        window_has_obs = optimize_cams is not None and any(
            n in ocam_names and len(recon.camera_obs_arrays(n)[0])
            for n in optimize_cams)
        cfg = self._ba_cfg(max_iters, ftol, skip_if_below_px)
        # warm-start damping: lambda0 is always passed as a traced float
        # (one trace signature); cold solves just get lambda_init
        lam0 = (self._ba_lambda if (warm_start and
                                    self._ba_lambda is not None)
                else cfg.lambda_init)
        # adaptive skip threshold: a fixed pixel gate can't know the
        # scene's noise floor — once solves converge around some mean
        # reprojection, a new view whose initial error is already there
        # has nothing for LM to recover (the final global polish handles
        # residual drift). Floor = the config value.
        skip_thr = skip_if_below_px
        if skip_if_below_px > 0 and self._ba_mre_last is not None:
            skip_thr = max(skip_if_below_px,
                           self._ba_mre_last
                           + self.config.incremental_ba_skip_margin_px)
        if window_has_obs and self.config.use_local_ba:
            # windowed incremental BA on the REDUCED problem (points seen
            # by the window + all their anchoring observations) — the
            # full-map pack made per-view BA cost grow with the whole
            # reconstruction, O(V^2) over a folder
            prob, names, pids = recon.to_local_ba_problem(
                optimize_cams, fix_first=True,
                optimize_intrinsics=self.config.optimize_intrinsics)
            self._prewarm_ba_rungs(cfg, prob,
                                   rungs=skip_if_below_px > 0)
            res = bundle_adjust(prob, cfg, lambda0=lam0,
                                skip_below_px=skip_thr)
            cams_np, pts_np, stats = _split_packed(res.packed, prob)
            recon.update_from_local_ba(cams_np, pts_np, names, pids)
        else:
            prob, names = recon.to_ba_problem(
                optimize_cams=optimize_cams, fix_first=True,
                optimize_intrinsics=self.config.optimize_intrinsics)
            self._prewarm_ba_rungs(cfg, prob,
                                   rungs=skip_if_below_px > 0)
            res = bundle_adjust(prob, cfg, lambda0=lam0,
                                skip_below_px=skip_thr)
            cams_np, pts_np, stats = _split_packed(res.packed, prob)
            recon.update_from_ba(cams_np, pts_np, names)
        if warm_start and int(stats[2]) > 0:
            self._ba_lambda = float(stats[4])
        if skip_if_below_px > 0 and int(stats[2]) > 0:
            self._ba_mre_last = float(stats[3])
        return {"cost_initial": float(stats[0]),
                "cost_final": float(stats[1]),
                "iterations": int(stats[2]),
                "mean_reproj_px": float(stats[3]),
                "initial_mean_reproj_px": float(stats[5])}

    def _global_ba(self, recon: Reconstruction) -> Dict:
        """GlobalBundleAdjuster equivalent (bundle_adjusment.py:414-502).

        On a multi-device mesh the final global polish runs the SHARDED
        Schur-CG solve (parallel/ba.py): points/observations split over
        the data axis, cameras replicated — the reference has no
        distributed BA at all (SURVEY §2.7). Gated on problem size so
        tiny reconstructions skip the shard_map overhead.
        """
        import jax
        if (self.config.use_sharded_global_ba
                and len(jax.devices()) > 1
                and recon.num_observations
                >= self.config.sharded_ba_min_obs
                and recon.num_points >= 10
                and recon.num_observations >= 10):
            from tpu3drec.ops.ba import BAConfig
            from tpu3drec.parallel.ba import sharded_bundle_adjust
            from tpu3drec.parallel.mesh import make_mesh
            prob, names = recon.to_ba_problem(
                optimize_cams=None, fix_first=True,
                optimize_intrinsics=self.config.optimize_intrinsics)
            mesh = make_mesh(jax.devices(),
                             shape=(len(jax.devices()), 1))
            res = sharded_bundle_adjust(prob, mesh, BAConfig(
                max_iters=self.config.global_ba_max_iters,
                schur_solver="cg",
                optimize_intrinsics=self.config.optimize_intrinsics))
            recon.update_from_ba(np.asarray(res.cam_params),
                                 np.asarray(res.points), names)
            stats = np.asarray(res.stats)
            return {"cost_initial": float(stats[0]),
                    "cost_final": float(stats[1]),
                    "iterations": int(stats[2]),
                    "mean_reproj_px": float(stats[3]),
                    "sharded": len(jax.devices())}
        return self._run_ba(recon, optimize_cams=None,
                            max_iters=self.config.global_ba_max_iters)

    def _validate_points(self, recon: Reconstruction) -> int:
        """Post-BA point re-validation (CPE/pipeline.py:594-746): drop
        points with excessive reprojection error or negative depth.
        One batched projection over the observation arrays + bincount
        segment sums — no per-observation loop (VERDICT r2 weak #1)."""
        if recon.num_points == 0:
            return 0
        ocam, opid, ouv = recon.obs_arrays()
        P = recon.num_points
        bad = np.zeros(P, bool)
        if len(opid):
            names = recon.camera_names()
            R = np.stack([recon.cameras[n].R for n in names])
            t = np.stack([recon.cameras[n].t for n in names])
            K = np.stack([recon.cameras[n].K for n in names])
            pts = np.asarray(recon.points)
            Xc = np.einsum("nij,nj->ni", R[ocam], pts[opid]) + t[ocam]
            z = Xc[:, 2]
            behind = z <= 1e-6
            zs = np.where(behind, 1.0, z)
            proj = np.einsum("nij,nj->ni", K[ocam], Xc / zs[:, None])
            e = np.hypot(proj[:, 0] - ouv[:, 0], proj[:, 1] - ouv[:, 1])
            np.logical_or.at(bad, opid[behind], True)
            ok = ~behind
            errs = np.bincount(opid[ok], weights=e[ok], minlength=P)
            counts = np.bincount(opid[ok], minlength=P)
        else:
            errs = np.zeros(P)
            counts = np.zeros(P)
        mean_err = errs / np.maximum(counts, 1)
        bad |= mean_err > self.config.post_ba_max_reproj_px
        bad |= counts < 2
        if bad.any():
            recon.remove_points(np.where(bad)[0])
        return int(bad.sum())

    # ------------------------------------------------------------------
    def export(self, recon: Reconstruction, output_dir) -> Dict:
        """Phase 4 (CPE/pipeline.py:1666-1721): pickle + JSON + COLMAP +
        summary report."""
        out = Path(output_dir)
        out.mkdir(parents=True, exist_ok=True)
        legacy = recon.to_legacy_format()
        with open(out / "optimized_camera_poses.pkl", "wb") as f:
            pickle.dump(legacy, f)
        (out / "camera_poses.json").write_text(
            json.dumps(legacy["camera_poses"], indent=2))
        recon.export_colmap(out / "colmap")
        from tpu3drec.sfm.quality import assess_reconstruction_quality
        quality = assess_reconstruction_quality(recon)
        report = {
            "statistics": recon.stats(),
            "quality": quality,
            "history": self.history,
        }
        (out / "reconstruction_report.json").write_text(
            json.dumps(report, indent=2, default=str))
        return report


def reconstruct_scene(matches, image_info: Optional[Dict] = None,
                      output_dir=None,
                      config: Optional[SfMConfig] = None,
                      chosen_images: Optional[List[str]] = None
                      ) -> Reconstruction:
    """Public SfM entry point.

    `matches` is either the matches_data dict ({(img1, img2):
    {correspondences Nx4, ...}}), a path to batch pickles (reference glue,
    others/utils.py:116), or a path pattern.
    """
    if isinstance(matches, (str, Path)):
        from tpu3drec.io.batch_pickle import load_and_validate_pickle
        loaded = load_and_validate_pickle(str(matches))
        matches_data = loaded["matches_data"]
        image_info = image_info or loaded["image_info"]
    else:
        matches_data = matches
    pipe = SfMPipeline(config)
    return pipe.reconstruct(matches_data, image_info, output_dir,
                            chosen_images)
