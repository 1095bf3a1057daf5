"""SO(3)/SE(3) utilities: axis-angle <-> rotation matrix, projection.

TPU-native replacements for cv2.Rodrigues / cv2.projectPoints
(reference: pose_recovery.py:161, bundle_adjusment.py:293-360). All
functions are branch-free (Taylor fallbacks near theta=0), differentiable,
and vmap/jit friendly — they form the inner kernels of PnP and bundle
adjustment.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """(...,3) -> (...,3,3) skew-symmetric cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1),
    ], -2)


def exp_so3(rvec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (...,3) -> rotation matrix (...,3,3) (cv2.Rodrigues fwd).

    Branch-free Taylor fallback keeps gradients finite at theta -> 0.
    """
    theta2 = jnp.sum(rvec * rvec, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    small = theta2 < _EPS
    K = hat(rvec)
    K2 = K @ K
    sin_t = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    cos_t = jnp.where(small, 0.5 - theta2 / 24.0,
                      (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-24))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    return eye + sin_t * K + cos_t * K2


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (...,3,3) -> axis-angle (...,3) (cv2.Rodrigues inv)."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    w = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                   R[..., 0, 2] - R[..., 2, 0],
                   R[..., 1, 0] - R[..., 0, 1]], -1)
    sin_theta = jnp.sin(theta)
    small = jnp.abs(sin_theta) < 1e-6
    scale = jnp.where(small, 0.5 + theta ** 2 / 12.0,
                      theta / jnp.maximum(2.0 * sin_theta, 1e-24))
    # near theta = pi the formula above degrades; good enough for the
    # small-update regime BA/PnP operate in (documented limitation)
    return w * scale[..., None]


def project_points(X: jnp.ndarray, rvec: jnp.ndarray, tvec: jnp.ndarray,
                   K: jnp.ndarray) -> jnp.ndarray:
    """cv2.projectPoints equivalent, zero distortion.

    X (...,3) world points; rvec/tvec (3,) camera pose (world->cam);
    K (3,3). Returns (...,2) pixels.
    """
    R = exp_so3(rvec)
    Xc = X @ R.T + tvec
    z = jnp.maximum(jnp.abs(Xc[..., 2:3]), 1e-9) * jnp.sign(
        jnp.where(Xc[..., 2:3] == 0, 1.0, Xc[..., 2:3]))
    xn = Xc[..., :2] / z
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    return jnp.stack([xn[..., 0] * fx + cx, xn[..., 1] * fy + cy], -1)


def transform_points(X: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """World -> camera frame: R X + t."""
    return X @ R.T + t


def camera_center(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Camera center in world coords: -R^T t (reference CPE/pipeline.py:37)."""
    return -(R.T @ t)


def compose_projection(K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """P = K [R | t] (3, 4) (reference CPE/pipeline.py:32)."""
    return K @ jnp.concatenate([R, t[:, None]], axis=1)


# -- numpy twins (host-side bookkeeping) --------------------------------
# Incremental SfM packs/unpacks BAProblems every view; routing each tiny
# 3x3 log/exp through a device dispatch cost ~30-80 ms of tunnel latency
# PER CAMERA. These run the same math batched in numpy on the host.

def log_so3_np(R: "np.ndarray") -> "np.ndarray":
    """Batched (..., 3, 3) rotation matrices -> (..., 3) axis-angle."""
    import numpy as np
    R = np.asarray(R, np.float64)
    tr = np.trace(R, axis1=-2, axis2=-1)
    cos = np.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    th = np.arccos(cos)
    w = np.stack([R[..., 2, 1] - R[..., 1, 2],
                  R[..., 0, 2] - R[..., 2, 0],
                  R[..., 1, 0] - R[..., 0, 1]], axis=-1)
    small = th < 1e-6
    sin_th = np.where(small, 1.0, np.sin(th))
    scale = np.where(small, 0.5 + th * th / 12.0, th / (2.0 * sin_th))
    out = w * scale[..., None]
    # at theta ~= pi the off-diagonal difference vanishes: recover the
    # axis from a a^T = (R + I) / 2 with signs pinned by the largest
    # component. That identity only holds AT pi (error ~ pi - theta), so
    # the branch is reserved for where the standard formula's 1/sin(th)
    # truly degenerates in f64.
    near = np.argwhere(th > np.pi - 1e-6)
    flat_R = R.reshape(-1, 3, 3)
    flat_out = out.reshape(-1, 3)
    flat_th = th.reshape(-1)
    for (i,) in near.reshape(-1, 1):
        Ri = flat_R[i]
        a2 = np.clip(np.diag((Ri + np.eye(3)) / 2.0), 0.0, 1.0)
        k = int(np.argmax(a2))
        a = np.sqrt(a2)
        for j in range(3):
            if j != k and Ri[k, j] + Ri[j, k] < 0:
                a[j] = -a[j]
        flat_out[i] = a / max(np.linalg.norm(a), 1e-12) * flat_th[i]
    return flat_out.reshape(out.shape)


def exp_so3_np(rvec: "np.ndarray") -> "np.ndarray":
    """Batched (..., 3) axis-angle -> (..., 3, 3) (Rodrigues)."""
    import numpy as np
    w = np.asarray(rvec, np.float64)
    th = np.linalg.norm(w, axis=-1)
    small = th < 1e-8
    th_safe = np.where(small, 1.0, th)
    a = w / th_safe[..., None]
    zeros = np.zeros_like(th)
    K = np.stack([
        np.stack([zeros, -a[..., 2], a[..., 1]], -1),
        np.stack([a[..., 2], zeros, -a[..., 0]], -1),
        np.stack([-a[..., 1], a[..., 0], zeros], -1)], axis=-2)
    I = np.broadcast_to(np.eye(3), K.shape)
    s = np.where(small, 0.0, np.sin(th))[..., None, None]
    c = np.where(small, 0.0, 1.0 - np.cos(th))[..., None, None]
    R = I + s * K + c * (K @ K)
    # first-order fallback for tiny angles
    Ksmall = np.stack([
        np.stack([zeros, -w[..., 2], w[..., 1]], -1),
        np.stack([w[..., 2], zeros, -w[..., 0]], -1),
        np.stack([-w[..., 1], w[..., 0], zeros], -1)], axis=-2)
    return np.where(small[..., None, None], I + Ksmall, R)
