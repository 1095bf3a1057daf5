"""Sharded bundle adjustment (SURVEY §5 'sharded point blocks'):
the shard_map'd Schur-CG solve over the 8-virtual-CPU mesh must equal
the single-device solve to f32-reduction tolerance, at both a small
convergence scene and reference global-BA scale (50 cams, the
GlobalBundleAdjuster regime — bundle_adjusment.py:414-502)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu3drec.ops.ba import BAProblem, BAConfig, bundle_adjust, make_cam_params
from tpu3drec.parallel.ba import shard_ba_problem, sharded_bundle_adjust
from tpu3drec.parallel.mesh import make_mesh

from test_ba import make_ba_scene, build_problem


def _mesh_dp8():
    return make_mesh(jax.devices(), shape=(8, 1))


def test_shard_ba_problem_routing():
    """Every observation lands on the shard owning its point, with the
    local point index consistent with the global one."""
    K, cams, X, oc, op, uv = make_ba_scene(n_cams=4, n_pts=123)
    prob = build_problem(K, cams, X, oc, op, uv)
    n_shards = 8
    stacked, pl, ms = shard_ba_problem(prob, n_shards)
    assert stacked.points.shape[0] == pl * n_shards
    s_pt = np.asarray(stacked.obs_pt).reshape(n_shards, ms)
    s_cam = np.asarray(stacked.obs_cam).reshape(n_shards, ms)
    s_uv = np.asarray(stacked.obs_uv).reshape(n_shards, ms, 2)
    s_mask = np.asarray(stacked.obs_mask).reshape(n_shards, ms)
    assert int(s_mask.sum()) == int(np.asarray(prob.obs_mask).sum())
    # reconstruct (global_pt, cam, uv) triples and compare as sets
    got = set()
    for s in range(n_shards):
        for j in np.nonzero(s_mask[s])[0]:
            assert 0 <= s_pt[s, j] < pl
            got.add((s * pl + int(s_pt[s, j]), int(s_cam[s, j]),
                     float(s_uv[s, j, 0])))
    want = {(int(p), int(c), float(u[0]))
            for p, c, u in zip(np.asarray(prob.obs_pt),
                               np.asarray(prob.obs_cam),
                               np.asarray(prob.obs_uv))}
    assert got == want


def test_sharded_ba_matches_single_device():
    """Full LM convergence: sharded vs single-device on one problem."""
    K, cams, X, oc, op, uv = make_ba_scene(n_cams=6, n_pts=300,
                                           noise_px=0.3)
    prob = build_problem(K, cams, X, oc, op, uv,
                         cam_jitter=1.0, pt_jitter=0.05)
    cfg = BAConfig(max_iters=15, schur_solver="cg")
    ref = bundle_adjust(prob, cfg)
    res = sharded_bundle_adjust(prob, _mesh_dp8(), cfg)
    # same optimum; the LM early-stop step may differ by a few
    # iterations (f32 reduction order at the ftol boundary), so compare
    # the SOLUTION, not the trajectory
    np.testing.assert_allclose(np.asarray(res.cam_params),
                               np.asarray(ref.cam_params),
                               rtol=1e-2, atol=1e-2)
    assert abs(float(res.cost_final) - float(ref.cost_final)) \
        < 1e-2 * float(ref.cost_final) + 1e-3
    assert abs(float(res.mean_reproj_px) - float(ref.mean_reproj_px)) < 1e-3
    # and it actually solved the problem
    assert float(res.mean_reproj_px) < 0.6
    assert float(res.cost_final) < float(res.cost_initial) * 0.1


def _global_scale_problem(C=50, Ppts=100_000, obs_per_pt=5, seed=0):
    """Reference global-BA scale without cv2 (synthetic projections)."""
    rng = np.random.default_rng(seed)
    X = rng.uniform(-10, 10, (Ppts, 3)).astype(np.float32) \
        + np.array([0, 0, 30.0], np.float32)
    K = np.array([[700, 0, 320], [0, 700, 240], [0, 0, 1]], np.float32)
    cam_list = []
    for c in range(C):
        rvec = 0.02 * rng.standard_normal(3)
        tvec = np.array([2.0 * np.sin(c / 8.0), 0.2 * rng.standard_normal(),
                         0.5 * np.cos(c / 8.0)])
        cam_list.append(np.asarray(make_cam_params(rvec, tvec, K)))
    cam = np.stack(cam_list).astype(np.float32)
    obs_pt = np.repeat(np.arange(Ppts, dtype=np.int32), obs_per_pt)
    obs_cam = rng.integers(0, C, obs_pt.shape[0]).astype(np.int32)

    def project(cp, Xw):
        from tpu3drec.ops.lie import exp_so3
        R = np.asarray(jax.vmap(exp_so3)(jnp.asarray(cp[:, :3])))
        Xc = np.einsum("mij,mj->mi", R[obs_cam], Xw[obs_pt]) \
            + cp[obs_cam, 3:6]
        z = np.maximum(Xc[:, 2], 1e-6)
        return np.stack([Xc[:, 0] / z * cp[obs_cam, 6] + cp[obs_cam, 8],
                         Xc[:, 1] / z * cp[obs_cam, 7] + cp[obs_cam, 9]], 1)

    uv = project(cam, X) + 0.5 * rng.standard_normal((obs_pt.shape[0], 2))
    pm = np.ones((C, 10), np.float32)
    pm[0] = 0.0
    pm[1, 3] = 0.0
    pm[:, 6:] = 0.0
    # perturb starting geometry so the solve does real work
    cam_j = cam.copy()
    cam_j[2:, :3] += 0.002 * rng.standard_normal((C - 2, 3)).astype(np.float32)
    cam_j[2:, 3:6] += 0.01 * rng.standard_normal((C - 2, 3)).astype(np.float32)
    Xj = X + 0.02 * rng.standard_normal(X.shape).astype(np.float32)
    return BAProblem(
        cam_params=jnp.asarray(cam_j), points=jnp.asarray(Xj),
        obs_cam=jnp.asarray(obs_cam), obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(uv, dtype=jnp.float32),
        obs_mask=jnp.ones(obs_pt.shape[0], bool),
        param_mask=jnp.asarray(pm),
        point_mask=jnp.ones(Ppts, bool))


@pytest.mark.slow
def test_sharded_ba_reference_scale():
    """50 cams / 100k pts / 500k obs, 2 LM iters: sharded == single to
    tolerance (VERDICT r3 directive #2). Bounded iteration count keeps
    the single-core CPU runtime sane; the equality claim is per-solve,
    so 2 accepted steps exercise the full psum surface (U/gc/matvec/
    Dblk/cost) at real scale."""
    prob = _global_scale_problem()
    # ftol=0 disables the early-stop comparison (f32-order sensitive) so
    # BOTH solves run exactly 2 LM iterations — same trajectory length,
    # directly comparable states
    cfg = BAConfig(max_iters=2, schur_solver="cg", cg_iters=32, ftol=0.0)
    ref = bundle_adjust(prob, cfg)
    res = sharded_bundle_adjust(prob, _mesh_dp8(), cfg)
    assert int(res.iterations) == int(ref.iterations) == 2
    assert abs(float(res.mean_reproj_px) - float(ref.mean_reproj_px)) \
        < 5e-3 * max(1.0, float(ref.mean_reproj_px))
    np.testing.assert_allclose(np.asarray(res.cam_params),
                               np.asarray(ref.cam_params),
                               rtol=5e-3, atol=5e-3)
    # the solve moved toward the data from the jittered start
    assert float(res.cost_final) < float(res.cost_initial)


def test_pipeline_global_ba_shards_over_mesh():
    """Production path: SfMPipeline's final global BA routes through
    sharded_bundle_adjust on a multi-device mesh (the reference has no
    distributed BA at all — SURVEY §2.7)."""
    from tpu3drec.bench.synthetic import make_sfm_scene
    from tpu3drec.sfm import SfMPipeline
    from tpu3drec.sfm.pipeline import SfMConfig

    matches_data, info, _ = make_sfm_scene(n_views=5, n_pts=500)
    cfg = SfMConfig(use_sharded_global_ba=True, sharded_ba_min_obs=0)
    pipe = SfMPipeline(cfg)
    recon = pipe.reconstruct(dict(matches_data), info)
    assert recon.num_cameras == 5
    ga = [h for h in pipe.history if h.get("phase") == "global_ba"]
    assert ga and ga[-1].get("sharded") == 8, ga
    assert ga[-1]["mean_reproj_px"] < 2.0
