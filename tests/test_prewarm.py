"""Compile-prewarmer tests (sfm/prewarm.py).

The prewarmer's whole value hangs on one property: a warm call must be
byte-identical in program identity to the production call it fronts —
same jitted callable, same statics, same avals — or the warm is wasted.
These tests pin that property via jit cache-size counting, plus the
dedup/equality invariants.
"""
import numpy as np
import pytest

from tpu3drec.sfm.pipeline import SfMPipeline, SfMConfig, _bucket, _pad2
from tpu3drec.sfm.prewarm import (
    CompilePrewarmer, warm_ba, warm_pnp, warm_leftover_tri,
    warm_progressive, ba_key,
)
from tpu3drec.sfm.reconstruction import (
    ba_bucket_cams, ba_bucket_points, ba_bucket_obs, ba_bucket_next,
)


def test_bucket_next_matches_ladder():
    # the rung-ahead predictor must agree with the packer's ladder
    for f, axis in ((ba_bucket_cams, "cams"),
                    (ba_bucket_points, "points"),
                    (ba_bucket_obs, "obs")):
        b = f(1)
        for _ in range(8):
            nxt = ba_bucket_next(b, axis)
            assert f(b + 1) == nxt, (axis, b)
            b = nxt


def test_prewarmer_dedup_and_mark():
    import threading
    pw = CompilePrewarmer()
    ran = []
    done = threading.Event()

    def first():
        ran.append(1)
        done.set()

    assert pw.submit(("k", 1), first)
    assert not pw.submit(("k", 1), lambda: ran.append(2))
    pw.mark(("k", 2))
    assert not pw.submit(("k", 2), lambda: ran.append(3))
    # close() discards PENDING thunks, so wait for the first to run
    assert done.wait(10.0)
    pw.close()
    pw.join()
    assert ran == [1]
    # closed prewarmer refuses work
    assert not pw.submit(("k", 3), lambda: ran.append(4))


def test_warm_ba_hits_production_cache():
    """A warm_ba call must populate the exact cache entry the
    production-packed solve needs (no second trace)."""
    import jax.numpy as jnp
    from tpu3drec.ops.ba import bundle_adjust, BAProblem  # noqa: F401
    from tpu3drec.sfm.reconstruction import Reconstruction, Camera

    pipe = SfMPipeline(SfMConfig())
    cfg = pipe._ba_cfg(max_iters=pipe.config.ba_max_iters,
                       ftol=pipe.config.incremental_ba_ftol,
                       skip_if_below_px=pipe.config.incremental_ba_skip_px)
    # a real tiny reconstruction, packed the production way
    rng = np.random.default_rng(0)
    recon = Reconstruction()
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    recon.add_camera(Camera("a", np.eye(3), np.zeros(3), K, (64, 48)))
    recon.add_camera(Camera("b", np.eye(3), np.array([1.0, 0, 0]), K,
                            (64, 48)))
    X = rng.normal(size=(40, 3)) + [0, 0, 5]
    ids = recon.add_points_batch(X)
    for nm in ("a", "b"):
        uv = (X @ recon.cameras[nm].R.T + recon.cameras[nm].t) @ K.T
        uv = uv[:, :2] / uv[:, 2:]
        recon.add_observations_batch(nm, ids, uv)
    prob, names = recon.to_ba_problem()
    shape_key = (prob.cam_params.shape[0], prob.points.shape[0],
                 prob.obs_cam.shape[0])

    n0 = bundle_adjust._cache_size()
    warm_ba(cfg, *shape_key)()
    n1 = bundle_adjust._cache_size()
    assert n1 == n0 + 1, "warm did not trace a new program"
    res = bundle_adjust(prob, cfg, lambda0=float(cfg.lambda_init),
                        skip_below_px=0.0)
    assert bundle_adjust._cache_size() == n1, \
        "production call re-traced: warm key mismatched"
    assert float(res.mean_reproj_px) < 1.0


def test_warm_pnp_hits_production_cache():
    import jax
    import jax.numpy as jnp
    from tpu3drec.ops.pnp import solve_pnp_ransac

    cap = 512
    n0 = solve_pnp_ransac._cache_size()
    warm_pnp(cap, 4.0)()
    n1 = solve_pnp_ransac._cache_size()
    assert n1 == n0 + 1
    # production-style call (mirrors sfm/pipeline.py:_add_view)
    rng = np.random.default_rng(1)
    X = rng.normal(size=(30, 3)).astype(np.float32) + [0, 0, 5]
    K = np.array([[100, 0, 32], [0, 100, 24], [0, 0, 1]], np.float32)
    uv = (X @ K.T)
    uv = (uv[:, :2] / uv[:, 2:]).astype(np.float32)
    solve_pnp_ransac(jnp.asarray(_pad2(X, cap)),
                     jnp.asarray(_pad2(uv, cap)), jnp.asarray(K),
                     mask=jnp.asarray(np.arange(cap) < len(X)),
                     threshold_px=4.0, key=jax.random.PRNGKey(2))
    assert solve_pnp_ransac._cache_size() == n1


def test_warm_tri_batches_populate_wrappers():
    from tpu3drec.ops.triangulate import TriangulationConfig
    import tpu3drec.sfm.pipeline as pl

    tri = TriangulationConfig(min_angle_deg=2.0, max_reproj_px=2.0)
    warm_leftover_tri(2, 512, tri)()
    assert pl._LTB_JIT is not None
    n = pl._LTB_JIT._cache_size()
    warm_leftover_tri(2, 512, tri)()   # idempotent: same program
    assert pl._LTB_JIT._cache_size() == n

    tri_p = TriangulationConfig(min_angle_deg=2.0, max_reproj_px=4.0)
    warm_progressive(512, 1.5, "5point", tri_p)()
    assert pl._PPB_JIT is not None
    np_ = pl._PPB_JIT._cache_size()
    warm_progressive(512, 1.5, "5point", tri_p)()
    assert pl._PPB_JIT._cache_size() == np_


def test_start_prewarm_parses_dict_schema():
    """matches_data values are {"correspondences": ...} dicts (the
    batch-pickle schema) — the warm-list derivation must read the
    correspondence counts, not dict key counts (regression: the first
    TPU run bailed silently and warmed nothing)."""
    rng = np.random.default_rng(0)
    md = {("a", "b"): {"correspondences": rng.normal(size=(3000, 4)),
                       "quality_score": 1.0}}
    pipe = SfMPipeline(SfMConfig(prewarm_compile=True))
    # swallow the actual warms: we only test the derivation here
    submitted = []

    class _FakePW:
        def __init__(self, workers=1):
            pass

        def submit(self, key, thunk):
            submitted.append(key)
            return True

        def mark(self, key):
            pass

        def close(self):
            pass

    import tpu3drec.sfm.prewarm as pv
    real = pv.CompilePrewarmer
    pv.CompilePrewarmer = _FakePW
    try:
        pipe._start_prewarm(md)
    finally:
        pv.CompilePrewarmer = real
    assert pipe._prewarmer is not None
    kinds = {k[0] for k in submitted}
    assert kinds == {"pnp", "prog", "ltri", "ba"}
    # both early-BA configs (post-bootstrap ungated-semantics + gated
    # incremental) get bottom-rung warms
    ba_cfgs = {k[1] for k in submitted if k[0] == "ba"}
    assert len(ba_cfgs) == 2
    # 3000 matches/pair -> pnp caps include 2048 and 8192
    pnp_caps = {k[1] for k in submitted if k[0] == "pnp"}
    assert {512, 2048, 8192} <= pnp_caps
    prog_caps = {k[1] for k in submitted if k[0] == "prog"}
    assert 2048 in prog_caps  # pair bucket of 3000 is 8192; rung below too
    assert 8192 in prog_caps
    pipe._prewarmer = None


@pytest.mark.slow
def test_prewarm_results_identical():
    """prewarm_compile on/off must be bit-identical: the warms never
    touch the reconstruction or any RNG the pipeline consumes."""
    from tpu3drec.bench.synthetic import make_sfm_scene

    matches, info, _ = make_sfm_scene(n_views=6, n_pts=600)
    base = SfMPipeline(SfMConfig(prewarm_compile=False)).reconstruct(
        dict(matches), info)
    warm = SfMPipeline(SfMConfig(prewarm_compile=True)).reconstruct(
        dict(matches), info)
    assert sorted(base.cameras) == sorted(warm.cameras)
    assert base.num_points == warm.num_points
    np.testing.assert_allclose(base.points_array(), warm.points_array(),
                               rtol=0, atol=0)
