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
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from tpu3drec.sfm.reconstruction import Camera, Reconstruction
from tpu3drec.sfm.pair_selector import InitializationPairSelector, ScoringConfig
from tpu3drec.sfm.intrinsics import ProgressiveIntrinsicsEstimator, heuristic_K


@dataclasses.dataclass
class SfMConfig:
    min_init_inliers: int = 30          # essential_estimation.py:160-170
    min_init_inlier_ratio: float = 0.4
    essential_threshold_px: float = 1.5  # MatrixEstimationConfig
    min_pnp_correspondences: int = 15    # CPE/pipeline.py:2010
    pnp_threshold_px: float = 4.0
    max_reproj_px: float = 2.0           # TriangulationConfig
    relaxed_reproj_px: float = 4.0       # re-triangulation relaxation (:421-507)
    min_angle_deg: float = 2.0
    relaxed_angle_deg: float = 1.0
    mine_tolerance_px: float = 2.0       # 2D-3D mining match tolerance
    incremental_ba_window: int = 3       # last <=3 cameras (:1327-1341)
    ba_max_iters: int = 20
    global_ba_max_iters: int = 30
    optimize_intrinsics: bool = False
    post_ba_max_reproj_px: float = 4.0   # point re-validation (:594-746)
    # pipeline2 variant: joint E+K iterative refinement in two-view init
    # (reference pipeline2.py:288-339 wiring IterativeRefinementPipeline)
    use_iterative_refinement: bool = False


def _bucket(n: int, minimum: int = 64) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def _pad2(a: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros((n,) + a.shape[1:], a.dtype)
    out[:len(a)] = a
    return out


class SfMPipeline:
    """MainPosePipeline equivalent (CPE/pipeline.py:218)."""

    def __init__(self, config: Optional[SfMConfig] = None):
        self.config = config or SfMConfig()
        self.selector = InitializationPairSelector(ScoringConfig())
        self.intrinsics = ProgressiveIntrinsicsEstimator()
        self.history: List[Dict] = []

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
        image_info = image_info or {}
        if chosen_images:
            matches_data = {k: v for k, v in matches_data.items()
                            if k[0] in chosen_images and k[1] in chosen_images}

        ckpt_path = None
        if checkpoint_dir is not None:
            Path(checkpoint_dir).mkdir(parents=True, exist_ok=True)
            ckpt_path = Path(checkpoint_dir) / "sfm_checkpoint.pkl"

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
            if ckpt_path is not None:
                recon.save_state(ckpt_path)

        # ---- Phase 2: incremental view addition ------------------------
        all_images = {n for pair in matches_data for n in pair}
        remaining = sorted(all_images - set(recon.cameras))
        while remaining:
            ranked = self.selector.rank_next_views(
                remaining, list(recon.cameras), matches_data)
            if not ranked or ranked[0][1] <= 0:
                break
            name = ranked[0][0]
            t0 = time.perf_counter()
            added = self._add_view(recon, name, matches_data, image_info)
            remaining.remove(name)
            self.history.append({"phase": "add_view", "image": name,
                                 "success": added,
                                 "time_s": time.perf_counter() - t0})
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

        best = self.selector.get_best_pair(matches_data, image_info)
        if best is None:
            return None
        (name1, name2), score = best
        corr = np.asarray(matches_data[(name1, name2)]["correspondences"],
                          np.float32)
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
        n_first = 0
        for i in np.where(ok)[0]:
            pid = recon.add_point(pts[i])
            recon.add_observation(name1, pid, p1n[i])
            recon.add_observation(name2, pid, p2n[i])
            n_first += 1

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
                max_reproj_px=self.config.relaxed_reproj_px,
                min_depth=float(max(lo * 0.5, 1e-3)),
                max_depth=float(hi * 2.0))
            cam2 = recon.cameras[name2]
            tri2 = triangulate_two_view(
                p1, p2, jnp.asarray(recon.cameras[name1].K.astype(np.float32)),
                jnp.asarray(cam2.K.astype(np.float32)),
                jnp.eye(3), jnp.zeros(3),
                jnp.asarray(cam2.R.astype(np.float32)),
                jnp.asarray(cam2.t.astype(np.float32)),
                mask=jnp.asarray(rej), config=relaxed)
            ok2 = np.asarray(tri2.mask)
            pts2 = np.asarray(tri2.points)
            for i in np.where(ok2)[0]:
                pid = recon.add_point(pts2[i])
                recon.add_observation(name1, pid, p1n[i])
                recon.add_observation(name2, pid, p2n[i])
                n_rescued += 1

        self.intrinsics.learn(recon.cameras[name1].K, *size1)
        self.intrinsics.learn(recon.cameras[name2].K, *size2)
        return {"pair": (name1, name2), "pair_score": score["total"],
                "essential_inliers": num_inl,
                "points_initial": n_first, "points_rescued": n_rescued}

    # ------------------------------------------------------------------
    def _mine_2d3d(self, recon: Reconstruction, new_name: str,
                   matches_data: Dict) -> Tuple[np.ndarray, np.ndarray, List]:
        """2D-3D correspondence mining (CPE/pipeline.py:1985-2187).

        For every pair (new, processed): the processed image's side of each
        correspondence is matched to that camera's existing observations by
        pixel distance (tolerance ladder in the reference; single 2px gate
        here since our exports are exact coordinates). Also returns the
        leftover 2D-2D correspondences for later triangulation.
        """
        uv_new, pids, leftovers = [], [], []
        seen_points = set()
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
            obs = recon.observations_of_camera(other)
            if not obs:
                leftovers.append((other, new_xy, other_xy,
                                  np.ones(len(corr), bool)))
                continue
            obs_uv = np.stack([uv for _, uv in obs])
            obs_pid = np.array([p for p, _ in obs])
            d = np.linalg.norm(other_xy[:, None, :] - obs_uv[None], axis=2)
            j = d.argmin(axis=1)
            dist = d[np.arange(len(corr)), j]
            hit = dist <= self.config.mine_tolerance_px
            for i in np.where(hit)[0]:
                pid = int(obs_pid[j[i]])
                if pid in seen_points:
                    continue
                seen_points.add(pid)
                uv_new.append(new_xy[i])
                pids.append(pid)
            leftovers.append((other, new_xy, other_xy, ~hit))
        if not uv_new:
            return np.zeros((0, 2)), np.zeros(0, int), leftovers
        return np.stack(uv_new), np.asarray(pids, int), leftovers

    def _add_view(self, recon: Reconstruction, name: str,
                  matches_data: Dict, image_info: Dict) -> bool:
        """CPE/pipeline.py:912-966 + helpers."""
        import jax
        import jax.numpy as jnp
        from tpu3drec.ops.pnp import solve_pnp_ransac
        from tpu3drec.ops.triangulate import (
            triangulate_two_view, TriangulationConfig,
        )

        uv, pids, leftovers = self._mine_2d3d(recon, name, matches_data)
        if len(uv) < self.config.min_pnp_correspondences:
            return False
        size = self._image_size(name, image_info, uv)
        K = self.intrinsics.estimate(*size)

        n = len(uv)
        cap = _bucket(n)
        X = _pad2(recon.points_array()[pids].astype(np.float32), cap)
        uv_p = _pad2(uv.astype(np.float32), cap)
        mask = np.arange(cap) < n
        res = solve_pnp_ransac(jnp.asarray(X), jnp.asarray(uv_p),
                               jnp.asarray(K.astype(np.float32)),
                               mask=jnp.asarray(mask),
                               threshold_px=self.config.pnp_threshold_px,
                               key=jax.random.PRNGKey(len(recon.cameras)))
        if not bool(res.success) or \
                int(res.num_inliers) < self.config.min_pnp_correspondences:
            return False

        R = np.asarray(res.R, np.float64)
        t = np.asarray(res.t, np.float64)
        recon.add_camera(Camera(name, R, t, K, size))
        inl = np.asarray(res.inliers)[:n]
        for i in np.where(inl)[0]:
            recon.add_observation(name, int(pids[i]), uv[i])

        # triangulate brand-new points against each processed neighbour
        tri_cfg = TriangulationConfig(
            min_angle_deg=self.config.min_angle_deg,
            max_reproj_px=self.config.max_reproj_px)
        n_new = 0
        for other, new_xy, other_xy, left in leftovers:
            idx = np.where(left)[0]
            if len(idx) < 8:
                continue
            cam_o = recon.cameras[other]
            m = len(idx)
            cap2 = _bucket(m)
            pn = _pad2(new_xy[idx].astype(np.float32), cap2)
            po = _pad2(other_xy[idx].astype(np.float32), cap2)
            mm = np.arange(cap2) < m
            tri = triangulate_two_view(
                jnp.asarray(pn), jnp.asarray(po),
                jnp.asarray(K.astype(np.float32)),
                jnp.asarray(cam_o.K.astype(np.float32)),
                jnp.asarray(R.astype(np.float32)),
                jnp.asarray(t.astype(np.float32)),
                jnp.asarray(cam_o.R.astype(np.float32)),
                jnp.asarray(cam_o.t.astype(np.float32)),
                mask=jnp.asarray(mm), config=tri_cfg)
            ok = np.asarray(tri.mask)
            pts = np.asarray(tri.points)
            for k in np.where(ok)[0]:
                pid = recon.add_point(pts[k])
                recon.add_observation(name, pid, new_xy[idx[k]])
                recon.add_observation(other, pid, other_xy[idx[k]])
                n_new += 1

        # incremental BA: last <=window cameras free, all points free
        # (dict preserves insertion order = processing order)
        recent = list(recon.cameras)[-self.config.incremental_ba_window:]
        self._run_ba(recon, optimize_cams=recent,
                     max_iters=self.config.ba_max_iters)
        self.intrinsics.learn(recon.cameras[name].K, *size)
        return True

    # ------------------------------------------------------------------
    def _run_ba(self, recon: Reconstruction,
                optimize_cams: Optional[List[str]] = None,
                max_iters: int = 20) -> Dict:
        from tpu3drec.ops.ba import bundle_adjust, BAConfig
        if recon.num_points == 0 or recon.num_observations < 10:
            return {"skipped": True}
        prob, names = recon.to_ba_problem(
            optimize_cams=optimize_cams, fix_first=True,
            optimize_intrinsics=self.config.optimize_intrinsics)
        res = bundle_adjust(prob, BAConfig(
            max_iters=max_iters,
            optimize_intrinsics=self.config.optimize_intrinsics))
        recon.update_from_ba(np.asarray(res.cam_params),
                             np.asarray(res.points), names)
        return {"cost_initial": float(res.cost_initial),
                "cost_final": float(res.cost_final),
                "iterations": int(res.iterations),
                "mean_reproj_px": float(res.mean_reproj_px)}

    def _global_ba(self, recon: Reconstruction) -> Dict:
        """GlobalBundleAdjuster equivalent (bundle_adjusment.py:414-502)."""
        return self._run_ba(recon, optimize_cams=None,
                            max_iters=self.config.global_ba_max_iters)

    def _validate_points(self, recon: Reconstruction) -> int:
        """Post-BA point re-validation (CPE/pipeline.py:594-746): drop
        points with excessive reprojection error or negative depth."""
        if recon.num_points == 0:
            return 0
        pts = recon.points_array()
        errs = np.zeros(len(pts))
        counts = np.zeros(len(pts))
        bad = np.zeros(len(pts), bool)
        for cam_name, pid, uv in recon.observations:
            cam = recon.cameras[cam_name]
            Xc = cam.R @ pts[pid] + cam.t
            if Xc[2] <= 1e-6:
                bad[pid] = True
                continue
            proj = cam.K @ (Xc / Xc[2])
            e = np.hypot(proj[0] - uv[0], proj[1] - uv[1])
            errs[pid] += e
            counts[pid] += 1
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
