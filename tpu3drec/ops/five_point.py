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
GEN_PTS = jnp.asarray(_GEN_PTS.astype(np.float32))
VAND_INV_T = jnp.asarray(_VAND_INV.T.astype(np.float32))

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


def _real_roots(A: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Up to N_ROOTS real eigenvalues of A as sign-change roots of
    p(z) = det(A - z I), grid-bracketed then bisected with STATIC loops.

    p is evaluated as a batched 10x10 determinant (LU) rather than via
    explicit characteristic-polynomial coefficients: a degree-10 charpoly
    spans ~|lambda_max|^10 in magnitude and is numerically dead in float32,
    while det(A - z I) stays well-scaled. Returns (roots, valid)."""
    n = A.shape[0]
    I = jnp.eye(n, dtype=A.dtype)

    def p(z):
        return jnp.linalg.det(A - z * I)

    # tan-spaced projective grid: covers ALL of R (solutions can sit at
    # z ~ 30 when the null-space parametrization puts them far out) with
    # fine resolution near 0 where eigenvalues cluster. Bracketing happens
    # in theta; two roots inside one cell are an accepted per-sample
    # failure mode that RANSAC's sample redundancy absorbs.
    eps = 1.0 / _GRID_N
    thetas = jnp.linspace(-jnp.pi / 2 + eps, jnp.pi / 2 - eps, _GRID_N)
    grid = jnp.tan(thetas)
    vals = jax.vmap(p)(grid)
    sign = jnp.sign(vals)
    change = (sign[:-1] * sign[1:]) < 0           # (_GRID_N-1,)
    scores = change.astype(jnp.float32) * 2.0 \
        + jnp.linspace(0, 1, _GRID_N - 1)
    top, idx = jax.lax.top_k(scores, N_ROOTS)
    valid = top >= 2.0
    ta = thetas[idx]
    tb = thetas[idx + 1]
    fa = jax.vmap(p)(jnp.tan(ta))

    def body(carry, _):
        ta, tb, fa = carry
        tm = 0.5 * (ta + tb)
        fm = jax.vmap(p)(jnp.tan(tm))
        left = (fa * fm) <= 0
        return (jnp.where(left, ta, tm), jnp.where(left, tm, tb),
                jnp.where(left, fa, fm)), None

    (ta, tb, _), _ = jax.lax.scan(body, (ta, tb, fa), None,
                                  length=_BISECT_ITERS)
    roots = jnp.tan(0.5 * (ta + tb))

    # Newton polish: p'(z) = -p(z) * tr((A - zI)^-1), so the Newton step
    # is z <- z + 1 / tr((A - zI)^-1) — no explicit derivative needed.
    def newton(z, _):
        inv_tr = jnp.trace(jnp.linalg.inv(A - z[:, None, None] * I[None]),
                           axis1=1, axis2=2)
        step = 1.0 / jnp.where(jnp.abs(inv_tr) > 1e-12, inv_tr, 1e12)
        return z + jnp.clip(step, -0.1 * (1 + jnp.abs(z)),
                            0.1 * (1 + jnp.abs(z))), None

    roots, _ = jax.lax.scan(newton, roots, None, length=3)
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
