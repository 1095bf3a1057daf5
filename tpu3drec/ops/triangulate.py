"""Triangulation: batched DLT, epipolar (Sampson) correction, quality
filters, and per-point Gauss-Newton refinement.

TPU-native replacement for the reference TriangulationEngine
(CameraPoseEstimation/triangulation.py): the per-point Python loop over
4x4 SVDs (triangulation.py:880-893) becomes one vmapped 4x4 symmetric
eigensolve; the Hartley-Sturm optimal correction (:18-114, :1103-1160) is
implemented as the first-order (Sampson) projection onto the epipolar
constraint; the 4-stage filter (cheirality / angle / reprojection / depth,
:896-1024) is one fused masked pass; LM refinement (:1162-1253) is a
fixed-iteration vmapped Gauss-Newton on the 3 point coordinates.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from tpu3drec.ops.geometry import to_homogeneous
from tpu3drec.ops.lie import compose_projection


class TriangulationConfig(NamedTuple):
    """Reference TriangulationConfig defaults (triangulation.py:117-136)."""
    min_angle_deg: float = 2.0
    max_reproj_px: float = 2.0
    min_depth: float = 1e-3
    max_depth: float = 1e4
    # "hartley_sturm" = exact optimal correction (triangulation.py:18-114,
    # :1103-1160); "sampson" = first-order step; "none"
    correction: str = "hartley_sturm"
    use_sampson_correction: bool = True  # legacy master switch
    refine_iters: int = 3


def sampson_correct(pts1: jnp.ndarray, pts2: jnp.ndarray,
                    F: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """First-order optimal correction of correspondences onto x2' F x1 = 0.

    The closed-form first-order step of Hartley-Sturm's optimal triangulation
    (what the reference's _apply_hartley_sturm approximates iteratively).
    """
    x1 = to_homogeneous(pts1)
    x2 = to_homogeneous(pts2)
    Fx1 = x1 @ F.T
    Ftx2 = x2 @ F
    err = jnp.sum(x2 * Fx1, axis=-1)
    den = Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2 + Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2
    lam = err / jnp.maximum(den, 1e-12)
    d1 = lam[:, None] * Ftx2[:, :2]
    d2 = lam[:, None] * Fx1[:, :2]
    return pts1 - d1, pts2 - d2


def _hs_one(p1: jnp.ndarray, p2: jnp.ndarray, F: jnp.ndarray,
            e1g: jnp.ndarray, e2g: jnp.ndarray,
            n_grid: int = 64, n_bisect: int = 30):
    """Exact Hartley-Sturm optimal correction for ONE correspondence
    (Hartley & Zisserman 12.5.2; reference triangulation.py:18-114).

    The degree-6 polynomial g(t) is rooted with a tan-grid bracketing +
    bisection sweep instead of companion-matrix eigenvalues: TPU has no
    nonsymmetric eig, and the det-free bracketing was already the stable
    form for the 5-point solver (ops/five_point.py).

    e1g/e2g: the PAIR-GLOBAL epipoles (null(F), null(F^T)), computed once
    by the caller — the translated F's epipoles are just T e_g, so the
    two per-point 3x3 eigensolves (scalar loops on TPU, x N points)
    hoist out entirely. Translation inverses are written closed-form."""
    # translate both points to the origin; closed-form conjugation
    # Fm = T2^-T F T1^-1 with T = [[1,0,-p],[0,1,-q],[0,0,1]]
    inv_T1 = jnp.array([[1.0, 0, p1[0]], [0, 1.0, p1[1]], [0, 0, 1.0]])
    inv_T2t = jnp.array([[1.0, 0, 0], [0, 1.0, 0],
                         [p2[0], p2[1], 1.0]])
    Fm = inv_T2t @ F @ inv_T1

    # epipoles of Fm: Fm (T1 e1g) = T2^-T F e1g = 0
    e1 = jnp.array([e1g[0] - p1[0] * e1g[2],
                    e1g[1] - p1[1] * e1g[2], e1g[2]])
    e2 = jnp.array([e2g[0] - p2[0] * e2g[2],
                    e2g[1] - p2[1] * e2g[2], e2g[2]])
    e1 = e1 / jnp.maximum(jnp.sqrt(e1[0] ** 2 + e1[1] ** 2), 1e-12)
    e2 = e2 / jnp.maximum(jnp.sqrt(e2[0] ** 2 + e2[1] ** 2), 1e-12)
    R1 = jnp.array([[e1[0], e1[1], 0], [-e1[1], e1[0], 0], [0, 0, 1.0]])
    R2 = jnp.array([[e2[0], e2[1], 0], [-e2[1], e2[0], 0], [0, 0, 1.0]])
    Fr = R2 @ Fm @ R1.T
    f1 = e1[2]
    f2 = e2[2]
    a, b = Fr[1, 1], Fr[1, 2]
    c, d = Fr[2, 1], Fr[2, 2]

    def g(t):
        return (t * ((a * t + b) ** 2 + f2 ** 2 * (c * t + d) ** 2) ** 2
                - (a * d - b * c) * (1 + f1 ** 2 * t ** 2) ** 2
                * (a * t + b) * (c * t + d))

    def s_cost(t):
        return (t ** 2 / (1 + f1 ** 2 * t ** 2)
                + (c * t + d) ** 2
                / jnp.maximum((a * t + b) ** 2
                              + f2 ** 2 * (c * t + d) ** 2, 1e-30))

    # bracket sign changes of g on a tan grid, bisect each bracket
    theta = jnp.linspace(-jnp.pi / 2 + 1e-3, jnp.pi / 2 - 1e-3, n_grid)
    ts = jnp.tan(theta)
    gs = g(ts)
    sign_change = gs[:-1] * gs[1:] <= 0

    lo0, hi0 = ts[:-1], ts[1:]

    def bisect(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        gl = g(lo)
        gm = g(mid)
        left = gl * gm <= 0
        return (jnp.where(left, lo, mid), jnp.where(left, mid, hi))

    lo, hi = jax.lax.fori_loop(0, n_bisect, bisect, (lo0, hi0))
    roots = 0.5 * (lo + hi)
    costs = jnp.where(sign_change, s_cost(roots), jnp.inf)
    best = jnp.argmin(costs)
    t_best = roots[best]
    # compare with the t -> inf asymptote
    cost_inf = 1.0 / f1 ** 2 + c ** 2 / jnp.maximum(
        a ** 2 + f2 ** 2 * c ** 2, 1e-30)
    use_inf = cost_inf < jnp.min(costs)

    # closest points on the epipolar lines l1(t), l2(t)
    def closest_on_line(l):
        lam, mu, nu = l[0], l[1], l[2]
        return jnp.array([-lam * nu, -mu * nu, lam ** 2 + mu ** 2])

    l1 = jnp.where(use_inf,
                   jnp.array([f1, 0.0, -1.0]),
                   jnp.array([t_best * f1, 1.0, -t_best]))
    l2_t = jnp.array([-f2 * (c * t_best + d), a * t_best + b,
                      c * t_best + d])
    l2_inf = jnp.array([-f2 * c, a, c])
    l2 = jnp.where(use_inf, l2_inf, l2_t)
    x1h = closest_on_line(l1)
    x2h = closest_on_line(l2)
    # undo rotations and translations (closed-form translation inverse)
    x1h = inv_T1 @ (R1.T @ x1h)
    x2h = inv_T2t.T @ (R2.T @ x2h)
    w1 = jnp.where(jnp.abs(x1h[2]) > 1e-12, x1h[2], 1.0)
    w2 = jnp.where(jnp.abs(x2h[2]) > 1e-12, x2h[2], 1.0)
    return x1h[:2] / w1, x2h[:2] / w2


@functools.partial(jax.jit)
def hartley_sturm_correct(pts1: jnp.ndarray, pts2: jnp.ndarray,
                          F: jnp.ndarray
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact optimal correction of correspondences onto x2' F x1 = 0
    (batched). Falls back to the input when the geometry degenerates
    (zero epipolar error already)."""
    def null3(A):
        """Null direction of a rank-2 3x3, refined to f32 machine
        accuracy: the correction is sensitive to the epipole direction
        (computed once per pair, so precision here is cheap). Inverse
        iteration uses the closed-form 3x3 adjugate — no LU."""
        M = A.T @ A
        _, vecs = jnp.linalg.eigh(M)
        v = vecs[:, 0]
        B = M + (1e-12 + 1e-6 * jnp.trace(M)) * jnp.eye(3, dtype=M.dtype)

        def adj_mul(B, x):
            c0 = jnp.cross(B[:, 1], B[:, 2])
            c1 = jnp.cross(B[:, 2], B[:, 0])
            c2 = jnp.cross(B[:, 0], B[:, 1])
            adj = jnp.stack([c0, c1, c2], axis=0)   # adj(B) rows
            return adj @ x

        for _ in range(3):
            v = adj_mul(B, v)
            v = v / jnp.maximum(jnp.linalg.norm(v), 1e-30)
        return v

    e1g = null3(F)
    e2g = null3(F.T)
    c1, c2 = jax.vmap(_hs_one, in_axes=(0, 0, None, None, None))(
        pts1, pts2, F, e1g, e2g)
    # guard NaNs from degenerate configurations
    bad = (~jnp.isfinite(c1).all(axis=1)) | (~jnp.isfinite(c2).all(axis=1))
    c1 = jnp.where(bad[:, None], pts1, c1)
    c2 = jnp.where(bad[:, None], pts2, c2)
    return c1, c2


def _dlt_one(p1: jnp.ndarray, p2: jnp.ndarray,
             P1: jnp.ndarray, P2: jnp.ndarray) -> jnp.ndarray:
    """DLT for one point from two views -> (4,) homogeneous point."""
    A = jnp.stack([
        p1[0] * P1[2] - P1[0],
        p1[1] * P1[2] - P1[1],
        p2[0] * P2[2] - P2[0],
        p2[1] * P2[2] - P2[1],
    ])
    AtA = A.T @ A
    _, v = jnp.linalg.eigh(AtA)
    return v[:, 0]


@functools.partial(jax.jit)
def triangulate_points(pts1: jnp.ndarray, pts2: jnp.ndarray,
                       P1: jnp.ndarray, P2: jnp.ndarray) -> jnp.ndarray:
    """Batched two-view DLT: (N,2),(N,2),(3,4),(3,4) -> (N,3) world points.

    Replaces the per-point SVD loop at triangulation.py:880-893 with one
    vmapped 4x4 eigensolve.
    """
    Xh = jax.vmap(_dlt_one, in_axes=(0, 0, None, None))(pts1, pts2, P1, P2)
    w = Xh[:, 3:4]
    safe = jnp.abs(w) > 1e-12
    return Xh[:, :3] / jnp.where(safe, w, 1.0)


def triangulate_multiview(pts: jnp.ndarray, Ps: jnp.ndarray,
                          view_mask: jnp.ndarray) -> jnp.ndarray:
    """One point from V >= 2 masked views: (V,2),(V,3,4),(V,) -> (3,).

    vmap over points for batches. Masked views contribute zero rows.
    """
    a = pts[:, 0:1] * Ps[:, 2] - Ps[:, 0]  # (V, 4)
    b = pts[:, 1:2] * Ps[:, 2] - Ps[:, 1]
    A = jnp.concatenate([a, b], axis=0)    # (2V, 4)
    m = jnp.concatenate([view_mask, view_mask]).astype(A.dtype)[:, None]
    A = A * m
    AtA = A.T @ A
    _, v = jnp.linalg.eigh(AtA)
    Xh = v[:, 0]
    w = Xh[3]
    safe = jnp.abs(w) > 1e-12
    return Xh[:3] / jnp.where(safe, w, 1.0)


class TriangulationResult(NamedTuple):
    points: jnp.ndarray        # (N, 3)
    mask: jnp.ndarray          # (N,) passed all filters
    reproj_err: jnp.ndarray    # (N,) mean two-view reprojection error (px)
    angles_deg: jnp.ndarray    # (N,) triangulation angle
    depths1: jnp.ndarray       # (N,)
    depths2: jnp.ndarray       # (N,)


def _depths(X: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return (X @ R.T + t)[:, 2]


def _reproject(X: jnp.ndarray, P: jnp.ndarray) -> jnp.ndarray:
    Xh = to_homogeneous(X)
    p = Xh @ P.T
    z = p[:, 2:3]
    safe = jnp.abs(z) > 1e-12
    return p[:, :2] / jnp.where(safe, z, 1.0)


def triangulation_angles(X: jnp.ndarray, c1: jnp.ndarray,
                         c2: jnp.ndarray) -> jnp.ndarray:
    """(N,) angle between the two viewing rays, degrees."""
    r1 = X - c1
    r2 = X - c2
    cos = jnp.sum(r1 * r2, axis=1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=1) * jnp.linalg.norm(r2, axis=1), 1e-12)
    return jnp.degrees(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))


@functools.partial(jax.jit, static_argnames=("config",))
def triangulate_two_view(pts1: jnp.ndarray, pts2: jnp.ndarray,
                         K1: jnp.ndarray, K2: jnp.ndarray,
                         R1: jnp.ndarray, t1: jnp.ndarray,
                         R2: jnp.ndarray, t2: jnp.ndarray,
                         mask: Optional[jnp.ndarray] = None,
                         config: TriangulationConfig = TriangulationConfig(),
                         depth_bounds: Optional[Tuple[jnp.ndarray,
                                                      jnp.ndarray]] = None,
                         ) -> TriangulationResult:
    """Two-view triangulation with the reference's 4-stage filter
    (triangulate_initial_points, triangulation.py:184-254, 896-1024).

    depth_bounds optionally overrides (config.min_depth, config.max_depth)
    with TRACED scalars — the relaxed re-triangulation adapts bounds to
    the accepted cloud per run, and baking those into the static config
    would recompile the whole program every reconstruction."""
    n = pts1.shape[0]
    mask = jnp.ones((n,), bool) if mask is None else mask
    P1 = compose_projection(K1, R1, t1)
    P2 = compose_projection(K2, R2, t2)

    p1c, p2c = pts1, pts2
    if config.use_sampson_correction and config.correction != "none":
        # F = K2^-T [t]x R K1^-1 with relative pose (R, t) cam1 -> cam2
        R_rel = R2 @ R1.T
        t_rel = t2 - R_rel @ t1
        tx = jnp.array([[0, -t_rel[2], t_rel[1]],
                        [t_rel[2], 0, -t_rel[0]],
                        [-t_rel[1], t_rel[0], 0]], pts1.dtype)
        F = jnp.linalg.inv(K2).T @ tx @ R_rel @ jnp.linalg.inv(K1)
        if config.correction == "hartley_sturm":
            p1c, p2c = hartley_sturm_correct(pts1, pts2, F)
        else:
            p1c, p2c = sampson_correct(pts1, pts2, F)

    X = triangulate_points(p1c, p2c, P1, P2)

    if config.refine_iters > 0:
        X = refine_points_gn(X, p1c, p2c, P1, P2, iters=config.refine_iters)

    d1 = _depths(X, R1, t1)
    d2 = _depths(X, R2, t2)
    proj1 = _reproject(X, P1)
    proj2 = _reproject(X, P2)
    e1 = jnp.linalg.norm(proj1 - pts1, axis=1)
    e2 = jnp.linalg.norm(proj2 - pts2, axis=1)
    err = 0.5 * (e1 + e2)
    c1 = -(R1.T @ t1)
    c2 = -(R2.T @ t2)
    ang = triangulation_angles(X, c1, c2)

    lo, hi = ((jnp.float32(config.min_depth), jnp.float32(config.max_depth))
              if depth_bounds is None else depth_bounds)
    ok = mask
    ok &= (d1 > lo) & (d2 > lo)                                    # cheirality
    ok &= ang >= config.min_angle_deg                              # parallax
    ok &= jnp.maximum(e1, e2) <= config.max_reproj_px              # reproj
    ok &= (d1 < hi) & (d2 < hi)                                    # bounds
    ok &= jnp.all(jnp.isfinite(X), axis=1)
    return TriangulationResult(points=X, mask=ok, reproj_err=err,
                               angles_deg=ang, depths1=d1, depths2=d2)


def refine_points_gn(X: jnp.ndarray, pts1: jnp.ndarray, pts2: jnp.ndarray,
                     P1: jnp.ndarray, P2: jnp.ndarray,
                     iters: int = 3) -> jnp.ndarray:
    """Fixed-iteration Gauss-Newton on reprojection error per point
    (replaces scipy least_squares at triangulation.py:1162-1253)."""

    def residual(x, p1, p2):
        xh = jnp.concatenate([x, jnp.ones(1, x.dtype)])
        a = P1 @ xh
        b = P2 @ xh
        ra = a[:2] / jnp.where(jnp.abs(a[2]) > 1e-12, a[2], 1.0) - p1
        rb = b[:2] / jnp.where(jnp.abs(b[2]) > 1e-12, b[2], 1.0) - p2
        return jnp.concatenate([ra, rb])

    def refine_one(x0, p1, p2):
        def body(x, _):
            r = residual(x, p1, p2)
            J = jax.jacfwd(residual)(x, p1, p2)  # (4, 3)
            JtJ = J.T @ J + 1e-6 * jnp.eye(3, dtype=x.dtype)
            dx = jnp.linalg.solve(JtJ, -(J.T @ r))
            x_new = x + dx
            better = jnp.sum(residual(x_new, p1, p2) ** 2) < jnp.sum(r ** 2)
            return jnp.where(better, x_new, x), None
        x, _ = jax.lax.scan(body, x0, None, length=iters)
        return x

    return jax.vmap(refine_one)(X, pts1, pts2)
