"""Nister/Stewenius 5-point essential-matrix minimal solver, TPU-native.

SURVEY §7 names this the hard part ("Gröbner/polynomial root-finding in
JAX"); cv2.findEssentialMat's 5-point path is the reference behaviour
(essential_estimation.py:117-147). TPU constraints shape the design — no
nonsymmetric eigensolver exists on TPU, so the classical action-matrix
eigendecomposition is replaced by an equivalent all-static pipeline:

1. Null space of the 5x9 epipolar constraint matrix via eigh (4 smallest
   eigenvectors) -> E(x,y,z) = x X + y Y + z Z + W.
2. The ten cubic constraints (det E = 0 and 2 E E^T E - tr(E E^T) E = 0)
   are expanded over the 20 degree-<=3 monomials NUMERICALLY: evaluate
   each constraint at 20 fixed generic points and multiply by the
   precomputed inverse Vandermonde (no symbolic coefficient tables).
3. Gauss-Jordan against the 10 leading monomials yields the 10x10 action
   matrix A_z for multiplication-by-z on the quotient-ring basis
   [x^2, xy, xz, y^2, yz, z^2, x, y, z, 1].
4. Eigenvalues of A_z = the z-coordinates of the (up to 10) solutions:
   real roots of p(z) = det(A_z - z I) evaluated as batched 10x10 LU
   determinants (an explicit degree-10 characteristic polynomial is
   numerically dead in float32), bracketed on a tan-spaced projective
   grid covering all of R, bisected with static loops, and Newton-polished
   via p'(z) = -p(z) tr((A - z I)^-1).
5. Eigenvectors by shifted inverse iteration (batched 10x10 solves);
   x = v[x]/v[1], y = v[y]/v[1]; E assembled and projected to the
   essential manifold.

Every stage is fixed-shape and vmappable, so the solver plugs into the
batched RANSAC engine with models_per_sample=10 (invalid/complex roots
masked out).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------
# monomial machinery (numpy, import time)
# ---------------------------------------------------------------------

# exponents (i, j, k) for x^i y^j z^k — leading block L (deg-3 monomials
# eliminated by Gauss-Jordan), then quotient basis B
_L_MONOMIALS = [(3, 0, 0), (2, 1, 0), (1, 2, 0), (0, 3, 0),
                (2, 0, 1), (1, 1, 1), (1, 0, 2), (0, 2, 1),
                (0, 1, 2), (0, 0, 3)]
_B_MONOMIALS = [(2, 0, 0), (1, 1, 0), (1, 0, 1), (0, 2, 0), (0, 1, 1),
                (0, 0, 2), (1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0)]
_MONOMIALS = _L_MONOMIALS + _B_MONOMIALS  # 20

_rng = np.random.default_rng(561)
_GEN_PTS = _rng.normal(0.0, 1.0, size=(20, 3))
_VAND = np.stack([[pt[0] ** i * pt[1] ** j * pt[2] ** k
                   for (i, j, k) in _MONOMIALS] for pt in _GEN_PTS])
_VAND_INV = np.linalg.inv(_VAND)  # cond ~1e4 at this seed — fine in f64
# KEEP these as numpy: this module is imported lazily and can be first
# loaded INSIDE an active jit trace (find_essential is jitted), where a
# module-level jnp.asarray would mint a tracer that leaks into every
# later trace (UnexpectedTracerError at reference-scale SfM). numpy
# constants are safely re-lifted per trace.
GEN_PTS = _GEN_PTS.astype(np.float32)
VAND_INV_T = _VAND_INV.T.astype(np.float32).copy()

# index of x, y, 1 within the B basis (for solution extraction)
_BX, _BY, _B1 = 6, 7, 9
# z * B[i] for i in 0..5 lands on leading monomial L[_ZB_TO_L[i]]
_ZB_TO_L = [4, 5, 6, 7, 8, 9]
# z * B[i] for i in 6..9 lands back inside B at these indices
_ZB_TO_B = {6: 2, 7: 4, 8: 5, 9: 8}

N_ROOTS = 10
_GRID_N = 1024
_BISECT_ITERS = 48


def _constraints_at(E: jnp.ndarray) -> jnp.ndarray:
    """(10,) constraint values for one 3x3 E candidate."""
    det = jnp.linalg.det(E)
    EEt = E @ E.T
    tr = jnp.trace(EEt)
    C = 2.0 * (EEt @ E) - tr * E
    return jnp.concatenate([det[None], C.reshape(-1)])


def _hessenberg(A: jnp.ndarray) -> jnp.ndarray:
    """Orthogonal reduction to upper Hessenberg form (unrolled
    Householder steps; similarity, so det(H - zI) == det(A - zI))."""
    n = A.shape[0]
    H = A
    for k in range(n - 2):
        x = H[k + 1:, k]
        nx = jnp.linalg.norm(x)
        e1 = jnp.zeros((n - k - 1,), A.dtype).at[0].set(1.0)
        sgn = jnp.where(x[0] >= 0, 1.0, -1.0)
        v = x + sgn * nx * e1
        nv = jnp.linalg.norm(v)
        safe = nv > 1e-30
        v = jnp.where(safe, v / jnp.where(safe, nv, 1.0),
                      jnp.zeros_like(v))
        H = H.at[k + 1:, :].add(-2.0 * jnp.outer(v, v @ H[k + 1:, :]))
        H = H.at[:, k + 1:].add(-2.0 * jnp.outer(H[:, k + 1:] @ v, v))
    return H


def _hyman_signvals(H: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Sign-faithful det(H - z I) for upper-Hessenberg H, vectorized
    over a batch of shifts z — Hyman's method: fix x_{n-1} = 1, solve
    rows n-1..1 backward for x_{i-1} (each has one unknown times the
    constant subdiagonal b_i), then row 0 gives alpha with
    det = (-1)^(n-1) alpha * prod(b_i). The constant positive/negative
    factors and the per-shift positive rescaling (overflow guard) leave
    every SIGN unchanged, which is all bracketing and bisection use.
    Pure fused vector arithmetic: no LU anywhere."""
    n = H.shape[0]
    b = [H[i, i - 1] for i in range(1, n)]
    bsafe = [jnp.where(jnp.abs(bi) > 1e-25, bi,
                       jnp.where(bi >= 0, 1e-25, -1e-25)) for bi in b]
    xs = [jnp.zeros_like(z) for _ in range(n)]
    xs[n - 1] = jnp.ones_like(z)
    for i in range(n - 1, 0, -1):
        s = -z * xs[i]
        for j in range(i, n):
            s = s + H[i, j] * xs[j]
        xi = -s / bsafe[i - 1]
        m = jnp.maximum(jnp.abs(xi), 1.0)      # positive: sign-safe
        inv_m = 1.0 / m
        xs = [x * inv_m for x in xs]
        xs[i - 1] = xi * inv_m
    alpha = -z * xs[0]
    for j in range(n):
        alpha = alpha + H[0, j] * xs[j]
    sign_b = 1.0
    for bi in b:
        sign_b = sign_b * jnp.sign(
            jnp.where(jnp.abs(bi) > 1e-25, bi, 1.0))
    return alpha * sign_b * ((-1.0) ** (n - 1))


def _real_roots(A: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Up to N_ROOTS real eigenvalues of A as sign-change roots of
    p(z) = det(A - z I) on a tan-spaced projective grid (covers ALL of
    R with fine resolution near 0 where eigenvalues cluster), bisected
    with STATIC loops. Returns (roots, valid).

    p used to be evaluated as a batched 10x10 LU determinant at every
    grid/bisection point (~1.5k scalar-loop LUs per hypothesis, ~4 ms on
    TPU); A is now reduced ONCE to Hessenberg form and p's sign comes
    from Hyman's O(n^2) recurrence — fused vector math, no LU. Two roots
    inside one grid cell remain an accepted per-sample failure mode that
    RANSAC's sample redundancy absorbs."""
    H = _hessenberg(A)

    def p(z):
        return _hyman_signvals(H, z)

    eps = 1.0 / _GRID_N
    thetas = jnp.linspace(-jnp.pi / 2 + eps, jnp.pi / 2 - eps, _GRID_N)
    grid = jnp.tan(thetas)
    vals = p(grid)
    sign = jnp.sign(vals)
    change = (sign[:-1] * sign[1:]) < 0           # (_GRID_N-1,)
    scores = change.astype(jnp.float32) * 2.0 \
        + jnp.linspace(0, 1, _GRID_N - 1)
    top, idx = jax.lax.top_k(scores, N_ROOTS)
    valid = top >= 2.0
    ta = thetas[idx]
    tb = thetas[idx + 1]
    fa = p(jnp.tan(ta))

    def body(carry, _):
        ta, tb, fa = carry
        tm = 0.5 * (ta + tb)
        fm = p(jnp.tan(tm))
        left = (fa * fm) <= 0
        return (jnp.where(left, ta, tm), jnp.where(left, tm, tb),
                jnp.where(left, fa, fm)), None

    (ta, tb, _), _ = jax.lax.scan(body, (ta, tb, fa), None,
                                  length=_BISECT_ITERS)
    roots = jnp.tan(0.5 * (ta + tb))

    # Newton polish against the true determinant:
    # p'(z) = -p(z) * tr((A - zI)^-1)  =>  step = 1 / tr((A - zI)^-1)
    I = jnp.eye(A.shape[0], dtype=A.dtype)

    def newton(z, _):
        inv_tr = jnp.trace(jnp.linalg.inv(A - z[:, None, None] * I[None]),
                           axis1=1, axis2=2)
        step = 1.0 / jnp.where(jnp.abs(inv_tr) > 1e-12, inv_tr, 1e12)
        return z + jnp.clip(step, -0.1 * (1 + jnp.abs(z)),
                            0.1 * (1 + jnp.abs(z))), None

    roots, _ = jax.lax.scan(newton, roots, None, length=2)
    return roots, valid


def solve_essential_5pt(p1n: jnp.ndarray, p2n: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """5 normalized correspondences -> (E (10, 3, 3), valid (10,)).

    Up to 10 essential matrices satisfying all constraints; invalid slots
    (complex roots, degenerate samples) are masked False.
    """
    ones = jnp.ones((p1n.shape[0], 1), p1n.dtype)
    x1 = jnp.concatenate([p1n, ones], axis=1)
    x2 = jnp.concatenate([p2n, ones], axis=1)
    # rows: kron(x2, x1) so that row . vec(E) = x2^T E x1
    Q = jnp.einsum("ni,nj->nij", x2, x1).reshape(-1, 9)   # (5, 9)
    QtQ = Q.T @ Q
    _, vecs = jnp.linalg.eigh(QtQ)
    basis = vecs[:, :4]                                    # (9, 4)
    X = basis[:, 0].reshape(3, 3)
    Y = basis[:, 1].reshape(3, 3)
    Z = basis[:, 2].reshape(3, 3)
    W = basis[:, 3].reshape(3, 3)

    # numeric polynomial expansion at the generic points
    def eval_at(pt):
        E = pt[0] * X + pt[1] * Y + pt[2] * Z + W
        return _constraints_at(E)
    vals = jax.vmap(eval_at)(GEN_PTS)          # (20, 10)
    Cfull = vals.T @ VAND_INV_T                # (10, 20) monomial coeffs
    CL = Cfull[:, :10]
    CB = Cfull[:, 10:]
    det = jnp.linalg.det(CL)
    ok_lin = jnp.abs(det) > 1e-20
    CLs = jnp.where(ok_lin, 1.0, 0.0) * CL + \
        jnp.where(ok_lin, 0.0, 1.0) * jnp.eye(10, dtype=CL.dtype)
    M = jnp.linalg.solve(CLs, CB)              # L = -M B

    A = jnp.zeros((10, 10), CL.dtype)
    for i, li in enumerate(_ZB_TO_L):
        A = A.at[i].set(-M[li])
    for bi, bj in _ZB_TO_B.items():
        A = A.at[bi, bj].set(1.0)

    roots, valid = _real_roots(A)
    valid = valid & ok_lin

    # eigenvectors by shifted inverse iteration (3 steps)
    I10 = jnp.eye(10, dtype=A.dtype)

    def eigvec(z):
        Mz = A - (z + 1e-6) * I10
        v = jnp.ones((10,), A.dtype)
        for _ in range(3):
            v = jnp.linalg.solve(Mz, v)
            v = v / jnp.maximum(jnp.linalg.norm(v), 1e-30)
        return v

    vs = jax.vmap(eigvec)(roots)              # (10, 10)
    w1 = vs[:, _B1]
    safe = jnp.abs(w1) > 1e-12
    xs = jnp.where(safe, vs[:, _BX] / jnp.where(safe, w1, 1.0), 0.0)
    ys = jnp.where(safe, vs[:, _BY] / jnp.where(safe, w1, 1.0), 0.0)

    def build(x, y, z):
        E = x * X + y * Y + z * Z + W
        U, S, Vt = jnp.linalg.svd(E)
        Ep = (U * jnp.array([1.0, 1.0, 0.0], E.dtype)) @ Vt
        n = jnp.linalg.norm(Ep)
        return Ep / jnp.maximum(n, 1e-12)

    Es = jax.vmap(build)(xs, ys, roots)
    finite = jnp.all(jnp.isfinite(Es.reshape(10, -1)), axis=1)

    # self-check: a genuine solution reproduces the 5 sample constraints;
    # spurious brackets (even-multiplicity grazes, f32 grid noise) and
    # failed eigenvector extractions are masked here
    resid = jnp.einsum("ni,rij,nj->rn", x2, Es, x1)       # (10, 5)
    fits = jnp.max(jnp.abs(resid), axis=1) < 1e-4
    return Es, valid & safe & finite & fits
