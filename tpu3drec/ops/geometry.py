"""Two-view projective geometry: homography & fundamental-matrix estimation.

TPU-native replacements for cv2.findHomography (reference utils.py:118-153)
and cv2.findFundamentalMat (pair_selector.py:117-134): vmapped minimal
solvers (4-pt DLT homography, normalized 8-pt fundamental) plugged into the
batched RANSAC engine, plus masked weighted least-squares refits on inliers.

All solvers work on (N, 2) pixel coordinates with validity masks and return
3x3 matrices normalized so the largest-magnitude entry convention matches
OpenCV (H[2,2] = 1; ||F|| = 1 with rank-2 projection).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpu3drec.ops.ransac import ransac, RansacResult


# ---------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------

def to_homogeneous(pts: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


def normalize_points(pts: jnp.ndarray, mask: Optional[jnp.ndarray] = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hartley normalization: zero-mean, mean distance sqrt(2). Returns (pts_n, T)."""
    if mask is None:
        w = jnp.ones(pts.shape[:-1], pts.dtype)
    else:
        w = mask.astype(pts.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mean = jnp.sum(pts * w[..., None], axis=0) / wsum
    centered = pts - mean
    d = jnp.sqrt(jnp.sum(centered ** 2, axis=-1))
    mean_d = jnp.sum(d * w) / wsum
    s = jnp.sqrt(2.0) / jnp.maximum(mean_d, 1e-9)
    T = jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], pts.dtype)
    T = T.at[0, 0].set(s).at[1, 1].set(s)
    T = T.at[0, 2].set(-s * mean[0]).at[1, 2].set(-s * mean[1])
    return centered * s, T


def _nullvec_minimal_qr(A: jnp.ndarray) -> jnp.ndarray:
    """Exact unit right null vector of an (n-1, n) matrix.

    Householder QR of A^T = QR: A q = R^T Q^T Q e_n = R^T e_n = 0 since
    the last row of the (n, n-1) upper-triangular R is below every
    diagonal. Orthogonal transforms only (backward stable, no squared
    condition number), unrolled to fused vector ops — no eigh, no LU."""
    m, n = A.shape           # m == n - 1
    R = A.T                  # (n, m)
    vs = []
    for k in range(m):
        x = R[k:, k]
        nx = jnp.linalg.norm(x)
        e1 = jnp.zeros((n - k,), A.dtype).at[0].set(1.0)
        sgn = jnp.where(x[0] >= 0, 1.0, -1.0)
        v = x + sgn * nx * e1
        nv = jnp.linalg.norm(v)
        safe = nv > 1e-30
        # degenerate column: reflector degrades to a sign flip (still
        # orthogonal, QR remains valid up to column signs)
        v = jnp.where(safe, v / jnp.where(safe, nv, 1.0), e1)
        vs.append(v)
        R = R.at[k:, :].add(-2.0 * jnp.outer(v, v @ R[k:, :]))
    # q = Q e_n = H_1 (H_2 (... (H_m e_n)))
    q = jnp.zeros((n,), A.dtype).at[n - 1].set(1.0)
    for k in range(m - 1, -1, -1):
        coef = vs[k] @ q[k:]
        q = q.at[k:].add(-2.0 * coef * vs[k])
    return q


def _smallest_singular_vector(A: jnp.ndarray,
                              refine: bool = True) -> jnp.ndarray:
    """Right singular vector for the smallest singular value of A (m x n).

    Via eigh of A^T A — symmetric eigendecomposition is well-supported and
    fast on TPU (unlike general SVD of tall matrices under vmap). Forming
    A^T A squares the condition number, so two inverse-iteration steps
    refine the float32 eigenvector back to ~1e-6 relative accuracy.

    refine=False skips the inverse iterations: XLA lowers batched small
    linalg.solve to scalar LU loops on TPU, and RANSAC *hypothesis*
    models only need scoring accuracy (the winner is refit with full
    refinement afterwards).
    """
    m, n = A.shape
    if m == n - 1:
        # minimal sample: the right null vector is EXACT — Householder QR
        # of A^T and read off Q's last column. Pure unrolled vector math;
        # batched eigh of the n x n normal matrix lowers to scalar loops
        # on TPU and dominated the 8-point RANSAC hypothesis stage.
        return _nullvec_minimal_qr(A)
    AtA = A.T @ A
    _, vecs = jnp.linalg.eigh(AtA)  # ascending eigenvalues
    v = vecs[:, 0]
    if not refine:
        return v
    n = AtA.shape[0]
    ridge = 1e-7 * jnp.trace(AtA) / n
    M = AtA + ridge * jnp.eye(n, dtype=AtA.dtype)
    for _ in range(2):
        v = jnp.linalg.solve(M, v)
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-30)
    return v


# ---------------------------------------------------------------------
# homography
# ---------------------------------------------------------------------

def _similarity_inv(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a normalize_points similarity
    [[s,0,t0],[0,s,t1],[0,0,1]] — batched linalg.inv is scalar LU on TPU."""
    s = T[0, 0]
    inv_s = 1.0 / s
    return jnp.array([[1.0, 0.0, 0.0],
                      [0.0, 1.0, 0.0],
                      [0.0, 0.0, 1.0]], T.dtype) \
        .at[0, 0].set(inv_s).at[1, 1].set(inv_s) \
        .at[0, 2].set(-T[0, 2] * inv_s).at[1, 2].set(-T[1, 2] * inv_s)


def solve_homography_dlt(p1: jnp.ndarray, p2: jnp.ndarray,
                         w: Optional[jnp.ndarray] = None,
                         fast: bool = False,
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DLT homography from >=4 correspondences (p1 -> p2). Returns (H, valid).

    Works for the minimal 4-point case (RANSAC hypotheses) and the weighted
    overdetermined case (inlier refit) alike. fast=True skips the
    inverse-iteration eigenvector polish (per-hypothesis RANSAC path:
    scoring accuracy only; the winner is refit with fast=False).
    """
    n = p1.shape[0]
    p1n, T1 = normalize_points(p1, w)
    p2n, T2 = normalize_points(p2, w)
    x, y = p1n[:, 0], p1n[:, 1]
    u, v = p2n[:, 0], p2n[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    rows_a = jnp.stack([-x, -y, -one, zero, zero, zero, u * x, u * y, u], axis=1)
    rows_b = jnp.stack([zero, zero, zero, -x, -y, -one, v * x, v * y, v], axis=1)
    A = jnp.concatenate([rows_a, rows_b], axis=0)  # (2n, 9)
    if w is not None:
        ww = jnp.sqrt(jnp.concatenate([w, w], axis=0).astype(A.dtype))
        A = A * ww[:, None]
    h = _smallest_singular_vector(A, refine=not fast)
    Hn = h.reshape(3, 3)
    H = _similarity_inv(T2) @ Hn @ T1
    scale = H[2, 2]
    valid = jnp.abs(scale) > 1e-10
    H = H / jnp.where(valid, scale, 1.0)
    return H, valid & jnp.all(jnp.isfinite(H))


def homography_transfer_error(H: jnp.ndarray, pts1: jnp.ndarray,
                              pts2: jnp.ndarray) -> jnp.ndarray:
    """(N,) squared forward reprojection error |H p1 - p2|^2 (cv2 convention)."""
    p = to_homogeneous(pts1) @ H.T
    z = p[:, 2]
    bad = jnp.abs(z) < 1e-10
    proj = p[:, :2] / jnp.where(bad, 1.0, z)[:, None]
    err = jnp.sum((proj - pts2) ** 2, axis=1)
    return jnp.where(bad, 1e12, err)


def _adj3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form adjugate of a 3x3 (inverse up to 1/det — exactly what
    projective quantities need, with zero linalg ops)."""
    a, b, c = M[0, 0], M[0, 1], M[0, 2]
    d, e, f = M[1, 0], M[1, 1], M[1, 2]
    g, h, i = M[2, 0], M[2, 1], M[2, 2]
    return jnp.array([
        [e * i - f * h, c * h - b * i, b * f - c * e],
        [f * g - d * i, a * i - c * g, c * d - a * f],
        [d * h - e * g, b * g - a * h, a * e - b * d],
    ], M.dtype)


def _homography_4pt_closed(p1: jnp.ndarray, p2: jnp.ndarray
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact minimal 4-point homography via the projective-basis method:
    B maps the canonical basis e1,e2,e3,e1+e2+e3 to the 4 points
    (columns lambda_i * p_i with lambda = M^-1 p4), so H = B2 adj(B1).
    Pure closed form — the per-hypothesis eigh(9x9) of the DLT route
    dominated RANSAC on TPU."""

    p1n, T1 = normalize_points(p1)
    p2n, T2 = normalize_points(p2)

    def basis(p):
        ph = jnp.concatenate([p, jnp.ones((4, 1), p.dtype)], axis=1)
        M = ph[:3].T                          # (3, 3) columns p1..p3
        lam = _adj3(M) @ ph[3]                # ~ det(M) * M^-1 p4
        return M * lam[None, :], lam

    B1, lam1 = basis(p1n)
    B2, lam2 = basis(p2n)
    H = _similarity_inv(T2) @ (B2 @ _adj3(B1)) @ T1
    scale = H[2, 2]
    ok = (jnp.min(jnp.abs(lam1)) > 1e-12) & (jnp.min(jnp.abs(lam2)) > 1e-12) \
        & (jnp.abs(scale) > 1e-12)
    H = H / jnp.where(ok, scale, 1.0)
    return H, ok & jnp.all(jnp.isfinite(H))


def _homography_4pt_flat(p1: jnp.ndarray, p2: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """_homography_4pt_closed in struct-of-arrays form: returns (h (9,),
    valid) with NO 3x3 intermediates.

    Under the RANSAC double-vmap (batch x hypotheses), (K, 3, 3)
    intermediates tile each trailing 3x3 to a padded (8, 128) TPU tile
    and every tiny matmul lowers as a batched dot over those pads —
    measured 31.7 ms of the 65 ms find_homography block at 96x256.
    Expanding the projective-basis method to scalar formulas keeps every
    op a flat (K,) vector op that fuses on the VPU. Same math as
    _homography_4pt_closed (kept as the reference implementation /
    oracle, tests/test_geometry.py)."""
    x = p1[:, 0]
    y = p1[:, 1]
    u = p2[:, 0]
    v = p2[:, 1]

    def norm4(x, y):
        mx = 0.25 * jnp.sum(x)
        my = 0.25 * jnp.sum(y)
        cx = x - mx
        cy = y - my
        md = 0.25 * jnp.sum(jnp.sqrt(cx * cx + cy * cy))
        s = jnp.sqrt(2.0) / jnp.maximum(md, 1e-9)
        return cx * s, cy * s, s, mx, my

    x, y, s1, mx1, my1 = norm4(x, y)
    u, v, s2, mx2, my2 = norm4(u, v)

    def basis(px, py):
        """Columns c_i = lam_i * (px_i, py_i, 1), lam = adj(M) @ p4."""
        x1, x2, x3, x4 = px[0], px[1], px[2], px[3]
        y1, y2, y3, y4 = py[0], py[1], py[2], py[3]
        # adj of M = [[x1,x2,x3],[y1,y2,y3],[1,1,1]] applied to (x4,y4,1)
        l1 = (y2 - y3) * x4 + (x3 - x2) * y4 + (x2 * y3 - x3 * y2)
        l2 = (y3 - y1) * x4 + (x1 - x3) * y4 + (x3 * y1 - x1 * y3)
        l3 = (y1 - y2) * x4 + (x2 - x1) * y4 + (x1 * y2 - x2 * y1)
        # B = [[l1 x1, l2 x2, l3 x3], [l1 y1, l2 y2, l3 y3], [l1, l2, l3]]
        return (l1 * x1, l2 * x2, l3 * x3,
                l1 * y1, l2 * y2, l3 * y3,
                l1, l2, l3), (l1, l2, l3)

    B1, lam1 = basis(x, y)
    B2, lam2 = basis(u, v)
    a, b, c, d, e, f, g, h_, i = B1
    # adj(B1)
    A00 = e * i - f * h_
    A01 = c * h_ - b * i
    A02 = b * f - c * e
    A10 = f * g - d * i
    A11 = a * i - c * g
    A12 = c * d - a * f
    A20 = d * h_ - e * g
    A21 = b * g - a * h_
    A22 = a * e - b * d
    p, q, r, t, w, z, m, n, o = B2
    # Hn = B2 @ adj(B1)
    H00 = p * A00 + q * A10 + r * A20
    H01 = p * A01 + q * A11 + r * A21
    H02 = p * A02 + q * A12 + r * A22
    H10 = t * A00 + w * A10 + z * A20
    H11 = t * A01 + w * A11 + z * A21
    H12 = t * A02 + w * A12 + z * A22
    H20 = m * A00 + n * A10 + o * A20
    H21 = m * A01 + n * A11 + o * A21
    H22 = m * A02 + n * A12 + o * A22
    # T2^-1 @ Hn: T2^-1 = [[1/s2, 0, mx2], [0, 1/s2, my2], [0, 0, 1]]
    inv_s2 = 1.0 / s2
    G00 = H00 * inv_s2 + mx2 * H20
    G01 = H01 * inv_s2 + mx2 * H21
    G02 = H02 * inv_s2 + mx2 * H22
    G10 = H10 * inv_s2 + my2 * H20
    G11 = H11 * inv_s2 + my2 * H21
    G12 = H12 * inv_s2 + my2 * H22
    # (T2^-1 Hn) @ T1: T1 = [[s1, 0, -s1 mx1], [0, s1, -s1 my1], [0, 0, 1]]
    t02 = -s1 * mx1
    t12 = -s1 * my1
    F00 = G00 * s1
    F01 = G01 * s1
    F02 = G00 * t02 + G01 * t12 + G02
    F10 = G10 * s1
    F11 = G11 * s1
    F12 = G10 * t02 + G11 * t12 + G12
    F20 = H20 * s1
    F21 = H21 * s1
    F22 = H20 * t02 + H21 * t12 + H22

    lam_min = jnp.minimum(
        jnp.minimum(jnp.minimum(jnp.abs(lam1[0]), jnp.abs(lam1[1])),
                    jnp.minimum(jnp.abs(lam1[2]), jnp.abs(lam2[0]))),
        jnp.minimum(jnp.abs(lam2[1]), jnp.abs(lam2[2])))
    ok = (lam_min > 1e-12) & (jnp.abs(F22) > 1e-12)
    inv = jnp.where(ok, 1.0 / jnp.where(ok, F22, 1.0), 1.0)
    hv = jnp.stack([F00, F01, F02, F10, F11, F12, F20, F21, F22]) * inv
    return hv, ok & jnp.all(jnp.isfinite(hv))


def _homography_transfer_error_flat(hv: jnp.ndarray, pts1: jnp.ndarray,
                                    pts2: jnp.ndarray) -> jnp.ndarray:
    """homography_transfer_error taking the flat (9,) model."""
    x = pts1[:, 0]
    y = pts1[:, 1]
    px = hv[0] * x + hv[1] * y + hv[2]
    py = hv[3] * x + hv[4] * y + hv[5]
    z = hv[6] * x + hv[7] * y + hv[8]
    bad = jnp.abs(z) < 1e-10
    zi = 1.0 / jnp.where(bad, 1.0, z)
    ex = px * zi - pts2[:, 0]
    ey = py * zi - pts2[:, 1]
    return jnp.where(bad, 1e12, ex * ex + ey * ey)


def _h_solver(p1, p2):
    if p1.shape[0] == 4:
        return _homography_4pt_closed(p1, p2)
    return solve_homography_dlt(p1, p2, fast=True)


def find_homography(pts1: jnp.ndarray, pts2: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None,
                    threshold: float = 4.0,
                    num_hypotheses: int = 512,
                    key: Optional[jax.Array] = None,
                    refit: bool = True) -> RansacResult:
    """RANSAC homography, cv2.findHomography(RANSAC) equivalent."""
    n = pts1.shape[0]
    mask = jnp.ones((n,), bool) if mask is None else mask
    key = jax.random.PRNGKey(0) if key is None else key
    result = ransac(pts1, pts2, mask, key,
                    solver=_homography_4pt_flat,
                    residual_fn=_homography_transfer_error_flat,
                    sample_size=4,
                    num_hypotheses=num_hypotheses,
                    threshold=threshold)
    result = result._replace(model=result.model.reshape(3, 3))
    if refit:
        H2, ok = solve_homography_dlt(pts1, pts2,
                                      result.inliers.astype(pts1.dtype))
        res2 = homography_transfer_error(H2, pts1, pts2)
        inl2 = (res2 <= threshold ** 2) & mask
        better = ok & (jnp.sum(inl2) >= result.num_inliers) & result.success
        model = jnp.where(better, H2, result.model)
        inliers = jnp.where(better, inl2, result.inliers)
        n_valid = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
        result = result._replace(
            model=model, inliers=inliers,
            num_inliers=jnp.sum(inliers.astype(jnp.int32)),
            inlier_ratio=jnp.sum(inliers.astype(jnp.int32)) / n_valid,
            residuals=jnp.where(better, res2, result.residuals))
    return result


# ---------------------------------------------------------------------
# fundamental matrix
# ---------------------------------------------------------------------

def solve_fundamental_8pt(p1: jnp.ndarray, p2: jnp.ndarray,
                          w: Optional[jnp.ndarray] = None,
                          fast: bool = False,
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Normalized 8-point fundamental matrix (p2^T F p1 = 0). Returns (F, valid).

    fast=True (RANSAC hypothesis path) skips the eigenvector polish and
    the rank-2 SVD projection — minimal-sample solutions are near rank-2
    and only score inliers; the refit enforces both."""
    p1n, T1 = normalize_points(p1, w)
    p2n, T2 = normalize_points(p2, w)
    x, y = p1n[:, 0], p1n[:, 1]
    u, v = p2n[:, 0], p2n[:, 1]
    one = jnp.ones_like(x)
    A = jnp.stack([u * x, u * y, u, v * x, v * y, v, x, y, one], axis=1)
    if w is not None:
        A = A * jnp.sqrt(w.astype(A.dtype))[:, None]
    f = _smallest_singular_vector(A, refine=not fast)
    Fn = f.reshape(3, 3)
    if not fast:
        # rank-2 projection
        U, S, Vt = jnp.linalg.svd(Fn)
        Fn = (U * jnp.array([S[0], S[1], 0.0])) @ Vt
    F = T2.T @ Fn @ T1
    norm = jnp.linalg.norm(F)
    valid = norm > 1e-12
    F = F / jnp.where(valid, norm, 1.0)
    return F, valid & jnp.all(jnp.isfinite(F))


def sampson_error(F: jnp.ndarray, pts1: jnp.ndarray,
                  pts2: jnp.ndarray) -> jnp.ndarray:
    """(N,) first-order (Sampson) squared epipolar error in px^2."""
    x1 = to_homogeneous(pts1)
    x2 = to_homogeneous(pts2)
    Fx1 = x1 @ F.T     # (N, 3) = F @ x1
    Ftx2 = x2 @ F      # (N, 3) = F^T @ x2
    num = jnp.sum(x2 * Fx1, axis=1) ** 2
    den = Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2 + Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def _f_solver(p1, p2):
    return solve_fundamental_8pt(p1, p2, fast=True)


@functools.partial(
    jax.jit, static_argnames=("threshold", "num_hypotheses", "refit"))
def find_fundamental(pts1: jnp.ndarray, pts2: jnp.ndarray,
                     mask: Optional[jnp.ndarray] = None,
                     threshold: float = 3.0,
                     num_hypotheses: int = 512,
                     key: Optional[jax.Array] = None,
                     refit: bool = True) -> RansacResult:
    """RANSAC fundamental matrix, cv2.findFundamentalMat equivalent."""
    n = pts1.shape[0]
    mask = jnp.ones((n,), bool) if mask is None else mask
    key = jax.random.PRNGKey(0) if key is None else key
    result = ransac(pts1, pts2, mask, key,
                    solver=_f_solver,
                    residual_fn=sampson_error,
                    sample_size=8,
                    num_hypotheses=num_hypotheses,
                    threshold=threshold)
    if refit:
        F2, ok = solve_fundamental_8pt(pts1, pts2,
                                       result.inliers.astype(pts1.dtype))
        res2 = sampson_error(F2, pts1, pts2)
        inl2 = (res2 <= threshold ** 2) & mask
        better = ok & (jnp.sum(inl2) >= result.num_inliers) & result.success
        model = jnp.where(better, F2, result.model)
        inliers = jnp.where(better, inl2, result.inliers)
        n_valid = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
        result = result._replace(
            model=model, inliers=inliers,
            num_inliers=jnp.sum(inliers.astype(jnp.int32)),
            inlier_ratio=jnp.sum(inliers.astype(jnp.int32)) / n_valid,
            residuals=jnp.where(better, res2, result.residuals))
    return result


def reprojection_error_homography(H: jnp.ndarray, pts1: jnp.ndarray,
                                  pts2: jnp.ndarray,
                                  mask: jnp.ndarray) -> jnp.ndarray:
    """Mean reprojection error over valid matches (reference utils.py:195-247)."""
    err = jnp.sqrt(homography_transfer_error(H, pts1, pts2))
    w = mask.astype(err.dtype)
    return jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1.0)
