"""Bundle adjustment: Levenberg-Marquardt with Schur complement on
camera/point blocks, Huber robust loss, fully vectorized on TPU.

TPU-native replacement for the reference's scipy-based adjuster
(CameraPoseEstimation/bundle_adjusment.py): the parameter layout is the
same — per-camera [rvec(3), tvec(3), fx, fy, cx, cy] + 3N point coords
(bundle_adjusment.py:213-281) with Huber loss f_scale=2.0 (:168-193) — but
the per-observation Python residual loop (:293-360, the single most
expensive construct in the reference) becomes ONE vectorized projection +
vmapped analytic-AD Jacobians, and the normal equations are solved by the
classic SfM Schur trick:

    [U  W] [dc]   [gc]            S dc = gc - W V^-1 gp,
    [W' V] [dp] = [gp]   =>       dp   = V^-1 (gp - W' dc)

with U block-diag per camera (10x10), V block-diag per point (3x3, batch-
inverted), W scattered into a dense (n_pts, n_cams) block tensor, and the
reduced camera system S (10 n_cams)^2 solved densely — n_cams is small in
incremental SfM while n_pts is large, exactly the regime Schur targets.

Gauge freedom is fixed via a per-camera-parameter update mask (fix first
camera / fix intrinsics), mirroring BundleAdjustmentConfig
(bundle_adjusment.py:17-37) and GlobalBundleAdjuster's fix-first-camera
flag (:414-502).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from tpu3drec.ops.lie import exp_so3

CAM_DIM = 10  # rvec(3) + tvec(3) + fx, fy, cx, cy


class BAProblem(NamedTuple):
    """Static-shape BA problem. All index arrays padded; obs_mask gates.
    bundle_adjust re-sorts observations by point id internally so the
    point-indexed segment sums can run with indices_are_sorted=True."""
    cam_params: jnp.ndarray   # (C, 10)
    points: jnp.ndarray       # (P, 3)
    obs_cam: jnp.ndarray      # (M,) int32 camera index per observation
    obs_pt: jnp.ndarray       # (M,) int32 point index per observation
    obs_uv: jnp.ndarray       # (M, 2) measured pixels
    obs_mask: jnp.ndarray     # (M,) bool
    param_mask: jnp.ndarray   # (C, 10) float — 0 freezes a parameter
    point_mask: jnp.ndarray   # (P,) bool — False freezes/ignores a point


class BAConfig(NamedTuple):
    max_iters: int = 20
    huber_delta: float = 2.0       # f_scale in reference (:30)
    lambda_init: float = 1e-3
    lambda_up: float = 4.0
    lambda_down: float = 0.5
    ftol: float = 1e-6
    optimize_intrinsics: bool = True
    # reduced camera system solver: "dense" materializes W as a
    # (P, C, 10, 3) block tensor (exact, fine for the incremental <=3-cam
    # window); "cg" never materializes S — each matvec is O(M) segment
    # sums (every camera observes a point at most once, so each W block
    # is a single observation's Jc^T Jp), with a block-Jacobi
    # preconditioner from the exact diagonal blocks. "auto" switches to
    # cg above 32 cameras. This is what lets reference-scale global BA
    # (50 cams / 100k pts / 500k obs) fit in HBM.
    schur_solver: str = "auto"
    cg_iters: int = 64
    cg_tol: float = 1e-5
    # skip the LM loop entirely (0 iterations) when the problem's
    # INITIAL masked mean reprojection is already below this many
    # pixels; 0 disables. The incremental SfM path uses it so views
    # whose PnP+triangulation landed clean don't pay a BA solve
    # (VERDICT r4 #3) — the decision runs inside the same program, so
    # a skipped solve costs one residual pass, not an extra dispatch.
    skip_if_below_px: float = 0.0


class BAResult(NamedTuple):
    cam_params: jnp.ndarray
    points: jnp.ndarray
    cost_initial: jnp.ndarray
    cost_final: jnp.ndarray
    iterations: jnp.ndarray
    mean_reproj_px: jnp.ndarray
    # (6,) [cost_initial, cost_final, iterations, mean_reproj_px,
    # final_lambda, initial_mean_reproj_px] — the scalar fields packed
    # so a caller syncs them in
    # ONE host pull (four separate float()/int() pulls measured 107 ms
    # of tunnel latency per incremental-BA call); final_lambda feeds the
    # next incremental solve's warm start.
    stats: jnp.ndarray
    # (C*10 + P*3 + 6,) [cam_params.ravel(), points.ravel(), stats] —
    # the ENTIRE result in one array so the incremental-SfM caller pays
    # ONE tunnel pull per solve instead of three (cams + points + stats
    # each cost a ~30-80 ms round trip)
    packed: Optional[jnp.ndarray] = None


def make_cam_params(rvec, tvec, K) -> jnp.ndarray:
    """Pack [rvec, tvec, fx, fy, cx, cy] (reference layout :213-281)."""
    return jnp.concatenate([
        jnp.asarray(rvec, jnp.float32).reshape(3),
        jnp.asarray(tvec, jnp.float32).reshape(3),
        jnp.asarray([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], jnp.float32),
    ])


def unpack_cam_params(p: jnp.ndarray):
    """-> (rvec, tvec, K)."""
    rvec, tvec = p[..., :3], p[..., 3:6]
    fx, fy, cx, cy = p[..., 6], p[..., 7], p[..., 8], p[..., 9]
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    K = jnp.stack([
        jnp.stack([fx, zero, cx], -1),
        jnp.stack([zero, fy, cy], -1),
        jnp.stack([zero, zero, one], -1),
    ], -2)
    return rvec, tvec, K


def _residual_one(cam: jnp.ndarray, X: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """(2,) reprojection residual of one observation."""
    rvec, tvec = cam[:3], cam[3:6]
    fx, fy, cx, cy = cam[6], cam[7], cam[8], cam[9]
    R = exp_so3(rvec)
    Xc = R @ X + tvec
    z = Xc[2]
    zsafe = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = Xc[0] / zsafe * fx + cx
    v = Xc[1] / zsafe * fy + cy
    r = jnp.stack([u, v]) - uv
    # behind-camera sentinel like the reference's 100.0 (:341-349), but
    # smooth so Jacobians stay sane
    return jnp.where(z > 1e-6, r, jnp.sign(r) * 100.0)


def residuals(prob: BAProblem) -> jnp.ndarray:
    """(M, 2) masked reprojection residuals, vectorized."""
    cams = prob.cam_params[prob.obs_cam]
    pts = prob.points[prob.obs_pt]
    r = jax.vmap(_residual_one)(cams, pts, prob.obs_uv)
    return r * prob.obs_mask[:, None]


def _huber_weights(r: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weights for Huber loss on the per-observation residual norm."""
    norm = jnp.linalg.norm(r, axis=-1)
    return jnp.minimum(1.0, delta / jnp.maximum(norm, 1e-12))


def _huber_cost(r: jnp.ndarray, mask: jnp.ndarray, delta: float) -> jnp.ndarray:
    n2 = jnp.sum(r * r, axis=-1)
    n = jnp.sqrt(jnp.maximum(n2, 1e-24))
    quad = 0.5 * n2
    lin = delta * (n - 0.5 * delta)
    return jnp.sum(jnp.where(n <= delta, quad, lin) * mask)


def mean_reproj_error(prob: BAProblem) -> jnp.ndarray:
    r = residuals(prob)
    n = jnp.linalg.norm(r, axis=-1)
    m = prob.obs_mask.astype(r.dtype)
    return jnp.sum(n * m) / jnp.maximum(jnp.sum(m), 1.0)


@functools.partial(jax.jit, static_argnames=("config", "axis_name"))
def bundle_adjust(prob: BAProblem,
                  config: BAConfig = BAConfig(),
                  axis_name: Optional[str] = None,
                  lambda0: Optional[jnp.ndarray] = None,
                  skip_below_px: Optional[jnp.ndarray] = None) -> BAResult:
    """Schur-complement LM. Returns optimized cameras/points.

    `lambda0` (traced scalar) warm-starts the LM damping — incremental
    SfM carries the previous solve's final lambda so each new view's
    solve starts where the last one converged instead of re-walking the
    damping schedule from lambda_init (VERDICT r4 #3).

    `skip_below_px` (traced scalar) overrides config.skip_if_below_px's
    VALUE at call time (the static config field still enables the gate)
    — the SfM pipeline adapts it to the scene's converged noise floor,
    which a fixed pixel constant cannot know.

    With `axis_name` set this runs INSIDE a `shard_map`: `prob.points`,
    `point_mask` and all observation arrays hold this shard's slice
    (obs_pt LOCAL point ids), while `cam_params`/`param_mask` are
    replicated. Every camera-indexed reduction (U, gc, the CG matvec's
    back-substitution term, the block-Jacobi diagonal, the Huber cost)
    is `lax.psum`'d over the axis, so all shards march through an
    IDENTICAL replicated LM/CG state while point work stays local —
    the SURVEY §5 "sharded point blocks" long-context analogue. Use
    `tpu3drec.parallel.ba.sharded_bundle_adjust` to partition a global
    problem and drive this (reference-scale driver:
    bundle_adjusment.py:414-502).
    """
    C = prob.cam_params.shape[0]
    P = prob.points.shape[0]
    M = prob.obs_uv.shape[0]
    delta = config.huber_delta
    solver = config.schur_solver
    if solver == "auto":
        solver = "dense" if (C <= 32 and axis_name is None) else "cg"
    if axis_name is not None and solver != "cg":
        raise ValueError("sharded bundle_adjust supports schur_solver='cg' "
                         "only (the dense W-block tensor is point-global)")

    def allsum(x):
        return jax.lax.psum(x, axis_name) if axis_name is not None else x

    # sort observations by point id once: the point-indexed segment sums
    # then run with indices_are_sorted=True (a sorted scatter lowers much
    # better on TPU); sums are order-invariant so results are unchanged
    order = jnp.argsort(prob.obs_pt)
    prob = prob._replace(obs_cam=prob.obs_cam[order],
                         obs_pt=prob.obs_pt[order],
                         obs_uv=prob.obs_uv[order],
                         obs_mask=prob.obs_mask[order])

    pmask = prob.param_mask
    if not config.optimize_intrinsics:
        pmask = pmask.at[:, 6:].set(0.0)
    ptmask = prob.point_mask.astype(jnp.float32)

    jac_fn = jax.vmap(jax.jacfwd(_residual_one, argnums=(0, 1)))

    def build_and_solve(cams, pts, lam):
        cam_o = cams[prob.obs_cam]   # (M, 10)
        pt_o = pts[prob.obs_pt]      # (M, 3)
        r = jax.vmap(_residual_one)(cam_o, pt_o, prob.obs_uv)   # (M, 2)
        w = _huber_weights(r, delta) * prob.obs_mask \
            * ptmask[prob.obs_pt]                               # (M,)
        (Jc, Jp) = jac_fn(cam_o, pt_o, prob.obs_uv)  # (M,2,10), (M,2,3)
        # freeze masked params at the Jacobian level
        Jc = Jc * pmask[prob.obs_cam][:, None, :]
        sw = jnp.sqrt(w)[:, None, None]
        Jc = Jc * sw
        Jp = Jp * sw
        rw = r * jnp.sqrt(w)[:, None]

        # block accumulations; camera-indexed sums span every shard's
        # observations (psum), point-indexed sums are shard-local
        U = allsum(jax.ops.segment_sum(
            jnp.einsum("mri,mrj->mij", Jc, Jc), prob.obs_cam, C))  # (C,10,10)
        V = jax.ops.segment_sum(
            jnp.einsum("mri,mrj->mij", Jp, Jp), prob.obs_pt, P,
            indices_are_sorted=True)                              # (P,3,3)
        gc = allsum(jax.ops.segment_sum(
            jnp.einsum("mri,mr->mi", Jc, -rw), prob.obs_cam, C))   # (C,10)
        gp = jax.ops.segment_sum(
            jnp.einsum("mri,mr->mi", Jp, -rw), prob.obs_pt, P,
            indices_are_sorted=True)                              # (P,3)

        # Marquardt damping (scale-invariant: multiplicative on diagonal)
        def damp(Bl, eps):
            d = jnp.diagonal(Bl, axis1=-2, axis2=-1)
            dd = jnp.maximum(d, eps)
            return Bl + lam * jax.vmap(jnp.diag)(dd)
        Ud = damp(U, 1e-6)
        Vd = damp(V, 1e-8)
        Vinv = jnp.linalg.inv(
            Vd + 1e-9 * jnp.eye(3, dtype=Vd.dtype))               # (P,3,3)

        Wm = jnp.einsum("mri,mrj->mij", Jc, Jp)                   # (M,10,3)
        Vinv_o = Vinv[prob.obs_pt]                                # (M,3,3)

        if solver == "dense":
            # W blocks scattered dense over (P, C): exact, fine while C
            # is small (the incremental <=3-camera window)
            Wb = jnp.zeros((P, C, CAM_DIM, 3), Jc.dtype)
            Wb = Wb.at[prob.obs_pt, prob.obs_cam].add(Wm)

            # S = U_blockdiag - sum_k W_k V_k^-1 W_k^T
            WV = jnp.einsum("pcij,pjl->pcil", Wb, Vinv)           # (P,C,10,3)
            S_cross = jnp.einsum("pail,pbml->abim", WV, Wb)       # (C,C,10,10)
            S = -S_cross
            S = S.at[jnp.arange(C), jnp.arange(C)].add(Ud)
            S2 = S.transpose(0, 2, 1, 3).reshape(C * CAM_DIM, C * CAM_DIM)

            rhs_c = gc - jnp.einsum("pcij,pj->ci", WV, gp)        # (C,10)
            rhs = rhs_c.reshape(-1)

            # frozen params: identity rows to keep S nonsingular
            free = pmask.reshape(-1)
            S2 = S2 * free[:, None] * free[None, :]
            S2 = S2 + jnp.diag(jnp.where(free > 0, 0.0, 1.0))
            rhs = rhs * free

            dc = jnp.linalg.solve(S2, rhs).reshape(C, CAM_DIM) * pmask
        else:
            # matrix-free Schur: S x computed with O(M) segment sums.
            # Each camera observes each point at most once, so W_{p,c} is
            # a single observation's 10x3 block and
            #   (S x)_c = Ud_c x_c - sum_m W_m Vinv_{pt_m} z_{pt_m},
            #   z_p = sum_{m in track p} W_m^T x_{cam_m}.
            WVm = jnp.einsum("mij,mjl->mil", Wm, Vinv_o)          # (M,10,3)

            def matvec(x):                                        # x: (C,10)
                # x is replicated across shards; z is point-local, the
                # camera-indexed back-substitution psums over shards so
                # Sx stays replicated (all shards run identical CG)
                xo = x[prob.obs_cam]                              # (M,10)
                z = jax.ops.segment_sum(
                    jnp.einsum("mij,mi->mj", Wm, xo), prob.obs_pt, P,
                    indices_are_sorted=True)
                back = allsum(jax.ops.segment_sum(
                    jnp.einsum("mil,ml->mi", WVm, z[prob.obs_pt]),
                    prob.obs_cam, C))                             # (C,10)
                Sx = jnp.einsum("cij,cj->ci", Ud, x) - back
                return Sx * pmask

            rhs = (gc - allsum(jax.ops.segment_sum(
                jnp.einsum("mil,ml->mi", WVm, gp[prob.obs_pt]),
                prob.obs_cam, C))) * pmask                         # (C,10)

            # block-Jacobi preconditioner from the EXACT diagonal blocks
            # D_c = Ud_c - sum_{m: cam_m=c} W_m Vinv W_m^T
            Dblk = Ud - allsum(jax.ops.segment_sum(
                jnp.einsum("mil,mjl->mij", WVm, Wm), prob.obs_cam, C))
            free_b = pmask[:, :, None] * pmask[:, None, :]
            eye = jnp.eye(CAM_DIM, dtype=Dblk.dtype)
            Dblk = Dblk * free_b + eye * (1.0 - pmask[:, :, None] * eye)
            Minv = jnp.linalg.inv(Dblk + 1e-8 * eye)

            def precond(v):
                return jnp.einsum("cij,cj->ci", Minv, v) * pmask

            # preconditioned CG, fixed max iterations, early-out on tol
            bnorm = jnp.sqrt(jnp.sum(rhs * rhs)) + 1e-30

            def cg_body(state):
                x, rr, p_, rz, it = state
                Ap = matvec(p_)
                alpha = rz / jnp.maximum(jnp.sum(p_ * Ap), 1e-30)
                x = x + alpha * p_
                rr = rr - alpha * Ap
                z = precond(rr)
                rz_new = jnp.sum(rr * z)
                beta = rz_new / jnp.maximum(rz, 1e-30)
                p_ = z + beta * p_
                return x, rr, p_, rz_new, it + 1

            def cg_cond(state):
                _, rr, _, _, it = state
                return (it < config.cg_iters) & \
                    (jnp.sqrt(jnp.sum(rr * rr)) > config.cg_tol * bnorm)

            x0 = jnp.zeros_like(rhs)
            z0 = precond(rhs)
            dc, _, _, _, _ = jax.lax.while_loop(
                cg_cond, cg_body,
                (x0, rhs, z0, jnp.sum(rhs * z0), jnp.int32(0)))
            dc = dc * pmask

        # back-substitute points: dp = Vinv (gp - W^T dc)
        WTdc = jax.ops.segment_sum(
            jnp.einsum("mij,mi->mj", Wm, dc[prob.obs_cam]),
            prob.obs_pt, P, indices_are_sorted=True)               # (P,3)
        dp = jnp.einsum("pij,pj->pi", Vinv, gp - WTdc) * ptmask[:, None]
        return dc, dp, r

    def cost_of(cams, pts):
        cam_o = cams[prob.obs_cam]
        pt_o = pts[prob.obs_pt]
        r = jax.vmap(_residual_one)(cam_o, pt_o, prob.obs_uv)
        m = prob.obs_mask & (ptmask[prob.obs_pt] > 0)
        return allsum(_huber_cost(r, m.astype(r.dtype), delta))

    cost0 = cost_of(prob.cam_params, prob.points)

    # initial masked mean reprojection for the skip gate (one residual
    # pass — runs inside this program, no extra dispatch)
    r0 = jax.vmap(_residual_one)(prob.cam_params[prob.obs_cam],
                                 prob.points[prob.obs_pt], prob.obs_uv)
    m0 = (prob.obs_mask & (ptmask[prob.obs_pt] > 0)).astype(r0.dtype)
    mr0 = allsum(jnp.sum(jnp.linalg.norm(r0, axis=-1) * m0)) / \
        jnp.maximum(allsum(jnp.sum(m0)), 1.0)
    if config.skip_if_below_px <= 0:
        init_done = jnp.bool_(False)
    else:
        thr = (jnp.float32(config.skip_if_below_px)
               if skip_below_px is None else jnp.float32(skip_below_px))
        init_done = mr0 < thr

    def body(state):
        cams, pts, lam, cost, it, done = state
        dc, dp, _ = build_and_solve(cams, pts, lam)
        new_cams = cams + dc
        new_pts = pts + dp
        new_cost = cost_of(new_cams, new_pts)
        accept = new_cost < cost
        cams = jnp.where(accept, new_cams, cams)
        pts = jnp.where(accept, new_pts, pts)
        lam = jnp.where(accept, lam * config.lambda_down,
                        lam * config.lambda_up)
        lam = jnp.clip(lam, 1e-9, 1e6)
        rel = jnp.abs(cost - new_cost) / jnp.maximum(cost, 1e-12)
        done = accept & (rel < config.ftol)
        cost = jnp.where(accept, new_cost, cost)
        return cams, pts, lam, cost, it + 1, done

    def cond(state):
        _, _, _, _, it, done = state
        return (it < config.max_iters) & jnp.logical_not(done)

    lam_start = (jnp.float32(config.lambda_init) if lambda0 is None
                 else jnp.clip(jnp.float32(lambda0), 1e-9, 1e6))
    state = (prob.cam_params, prob.points, lam_start, cost0, jnp.int32(0),
             init_done)
    cams, pts, lam, cost, iters, _ = jax.lax.while_loop(cond, body, state)

    final = prob._replace(cam_params=cams, points=pts)
    rf = residuals(final)
    nf = jnp.linalg.norm(rf, axis=-1)
    mf = final.obs_mask.astype(rf.dtype)
    mean_px = allsum(jnp.sum(nf * mf)) / jnp.maximum(
        allsum(jnp.sum(mf)), 1.0)
    stats = jnp.stack([cost0, cost, iters.astype(jnp.float32), mean_px,
                       lam, mr0])
    return BAResult(cam_params=cams, points=pts,
                    cost_initial=cost0, cost_final=cost,
                    iterations=iters,
                    mean_reproj_px=mean_px,
                    stats=stats,
                    packed=jnp.concatenate([cams.ravel(), pts.ravel(),
                                            stats]))
