"""Background compile prewarmer for incremental SfM cold start.

A cold 50-view reconstruct spends ~120 of its ~155 s in first-trace +
remote compile/load of ~15 static-shape programs (measured 2026-08-19:
PnP 16.6 s, progressive-triangulation batch 8.7 s, ~8 BA bucket
crossings ~40 s, global-BA bucket ~13 s) while the devices sit idle.
The SHAPES of those programs are predictable — pad-bucket ladders over
sizes derivable from ``matches_data`` or one rung ahead of a realized
solve — so a worker thread can trace + compile + load each of them on
DUMMY all-masked inputs before the pipeline's data reaches that shape.
The main thread then hits a warm in-process executable cache.

Design constraints honoured here:

- Warm calls must be byte-identical in program identity to the
  production calls: same jitted callable object, same static argument
  values, same array avals (shape/dtype/weak-type). Each ``warm_*``
  builder below mirrors one production call site (cited).
- Warm EXECUTIONS must be ~free on the device. All BA configs are gated
  (``BAConfig.skip_if_below_px > 0``, see ``SfMPipeline._ba_cfg``), so a
  warm solve passes ``skip_below_px=1e9`` and exits after one residual
  pass; the other programs run fixed-cost RANSAC/triangulation on
  all-masked dummies (device-milliseconds).
- Warms never touch the ``Reconstruction`` or any pipeline state, so
  results are bit-identical with the prewarmer on or off (asserted in
  tests/test_prewarm.py).

Reference analogue: none — the reference is eagerly-executed cv2/torch
with no compilation stage. This is TPU-runtime infrastructure.
"""
from __future__ import annotations

import os
import threading
import time
from collections import deque
from typing import Callable, Hashable, Tuple

import numpy as np

__all__ = [
    "CompilePrewarmer", "warm_ba", "warm_pnp", "warm_progressive",
    "warm_leftover_tri",
]


class CompilePrewarmer:
    """A daemon worker thread that runs keyed warm-up thunks once each.

    ``submit(key, thunk)`` enqueues ``thunk`` unless ``key`` was already
    submitted or ``mark``ed (the production path marks every shape it
    traces itself, so realized shapes are never re-warmed). Keys are
    deduped for the life of the process via a class-level set — the jit
    executable caches they mirror are process-level too, so a second
    pipeline instance (steady-state benchmark reruns) skips all warms.
    """

    _seen: set = set()          # process-level, mirrors the jit caches
    _seen_lock = threading.Lock()

    def __init__(self, workers: int = 1) -> None:
        self._dq: deque = deque()
        self._cv = threading.Condition()
        self._closed = False
        self._log = bool(int(os.environ.get("TPU3DREC_PREWARM_LOG", "0")))
        # ONE worker is the measured optimum on the 1-core build host
        # (50-view cold bench, views/s: off 0.16-0.32, 1 worker 0.31-0.39,
        # 2 workers 0.20-0.27). Tracing is GIL-bound: a second tracer
        # starves the MAIN thread's own first traces (init went 24->79 s
        # at 2 workers, measured 2026-08-19); the remote compile RPC +
        # load release the GIL, so one worker already overlaps those.
        self._threads = [
            threading.Thread(target=self._loop, daemon=True,
                             name=f"tpu3drec-prewarm-{i}")
            for i in range(max(1, workers))]
        for t in self._threads:
            t.start()

    # -- public API -----------------------------------------------------
    def mark(self, key: Hashable) -> None:
        """Record that the production path traced this key itself."""
        with self._seen_lock:
            CompilePrewarmer._seen.add(key)

    def submit(self, key: Hashable, thunk: Callable[[], None],
               front: bool = False) -> bool:
        """Enqueue a warm. ``front=True`` jumps the queue — for warms the
        main thread will need within a few views (rung-ahead BA buckets),
        which must not wait behind the long up-front list."""
        with self._seen_lock:
            if self._closed or key in CompilePrewarmer._seen:
                return False
            CompilePrewarmer._seen.add(key)
        with self._cv:
            if front:
                self._dq.appendleft((key, thunk))
            else:
                self._dq.append((key, thunk))
            self._cv.notify()
        return True

    def close(self) -> None:
        """Stop accepting work; pending (unstarted) thunks are DISCARDED
        — a finished pipeline has no use for them, and a worker grinding
        through stale warms at interpreter shutdown dies inside an XLA
        call ('FATAL: exception not rethrown'). Callers should join()
        afterwards to bound the one in-flight thunk."""
        with self._seen_lock:
            self._closed = True
        with self._cv:
            self._cv.notify_all()

    def join(self, timeout: float = 60.0) -> None:
        """Wait for the workers to finish (bounds in-flight thunks)."""
        deadline = time.monotonic() + timeout
        for t in self._threads:
            t.join(max(0.0, deadline - time.monotonic()))

    # -- worker ----------------------------------------------------------
    def _loop(self) -> None:
        while True:
            with self._cv:
                while not self._dq and not self._closed:
                    self._cv.wait()
                if self._closed:
                    return
                key, thunk = self._dq.popleft()
            t0 = time.perf_counter()
            try:
                thunk()
                if self._log:
                    print(f"[prewarm] {key} "
                          f"{time.perf_counter() - t0:.1f}s", flush=True)
            except Exception as e:  # a failed warm is only a missed win
                if self._log:
                    print(f"[prewarm] {key} FAILED {e!r}", flush=True)


# ---------------------------------------------------------------------
# Warm thunk builders — each mirrors ONE production call site exactly.
# ---------------------------------------------------------------------

def warm_ba(cfg, Cp: int, Pp: int, Mp: int) -> Callable[[], None]:
    """Mirror of sfm/pipeline.py:_run_ba -> ops.ba.bundle_adjust.

    Dummy problem: all masks zero. With a GATED config
    (cfg.skip_if_below_px > 0) and skip_below_px=1e9 the LM while_loop
    never runs — the warm executes one residual pass. (With an ungated
    config the dummy would run max_iters full LM iterations; _ba_cfg
    keeps every production config gated for exactly this reason.)
    """

    def thunk() -> None:
        import jax.numpy as jnp
        from tpu3drec.ops.ba import bundle_adjust, BAProblem

        cams = np.zeros((Cp, 10), np.float32)
        cams[:, 6:8] = 1.0  # benign fx, fy
        prob = BAProblem(
            cam_params=jnp.asarray(cams),
            points=jnp.asarray(np.zeros((Pp, 3), np.float32)),
            obs_cam=jnp.asarray(np.zeros(Mp, np.int32)),
            obs_pt=jnp.asarray(np.zeros(Mp, np.int32)),
            obs_uv=jnp.asarray(np.zeros((Mp, 2), np.float32)),
            obs_mask=jnp.asarray(np.zeros(Mp, bool)),
            param_mask=jnp.asarray(np.zeros((Cp, 10), np.float32)),
            point_mask=jnp.asarray(np.zeros(Pp, bool)),
        )
        bundle_adjust(prob, cfg, lambda0=float(cfg.lambda_init),
                      skip_below_px=1e9)

    return thunk


def ba_key(cfg, Cp: int, Pp: int, Mp: int) -> Tuple:
    return ("ba", cfg, Cp, Pp, Mp)


def warm_pnp(cap: int, threshold_px: float) -> Callable[[], None]:
    """Mirror of sfm/pipeline.py:_add_view -> ops.pnp.solve_pnp_ransac
    (mask+threshold+key passed, statics defaulted). threshold_px is a
    traced scalar — its value doesn't shape the program, but passing it
    keeps the call structure identical."""

    def thunk() -> None:
        import jax
        import jax.numpy as jnp
        from tpu3drec.ops.pnp import solve_pnp_ransac

        solve_pnp_ransac(
            jnp.asarray(np.zeros((cap, 3), np.float32)),
            jnp.asarray(np.zeros((cap, 2), np.float32)),
            jnp.asarray(np.eye(3, dtype=np.float32)),
            mask=jnp.asarray(np.zeros(cap, bool)),
            threshold_px=threshold_px,
            key=jax.random.PRNGKey(0))

    return thunk


def warm_progressive(cap: int, threshold_px: float, method: str,
                     tri_cfg) -> Callable[[], None]:
    """Mirror of sfm/pipeline.py:_progressive_triangulate ->
    _progressive_pair_batch (CHUNK=4 group, statics = threshold/method/
    tri_cfg)."""

    def thunk() -> None:
        import jax.numpy as jnp
        from tpu3drec.sfm.pipeline import _progressive_pair_batch

        chunk = 4
        eye = np.tile(np.eye(3, dtype=np.float32), (chunk, 1, 1))
        _progressive_pair_batch(
            jnp.asarray(np.zeros((chunk, cap, 2), np.float32)),
            jnp.asarray(np.zeros((chunk, cap, 2), np.float32)),
            jnp.asarray(np.eye(3, dtype=np.float32)),
            jnp.asarray(eye),
            jnp.asarray(np.eye(3, dtype=np.float32)),
            jnp.asarray(np.zeros(3, np.float32)),
            jnp.asarray(np.zeros((chunk, cap), bool)),
            jnp.asarray(np.zeros(chunk, np.uint32)),
            threshold_px, method, tri_cfg)

    return thunk


def warm_leftover_tri(n_pad: int, cap: int, tri_cfg) -> Callable[[], None]:
    """Mirror of sfm/pipeline.py:_add_view -> _leftover_tri_batch."""

    def thunk() -> None:
        import jax.numpy as jnp
        from tpu3drec.sfm.pipeline import _leftover_tri_batch

        eye = np.tile(np.eye(3, dtype=np.float32), (n_pad, 1, 1))
        _leftover_tri_batch(
            jnp.asarray(np.zeros((n_pad, cap, 2), np.float32)),
            jnp.asarray(np.zeros((n_pad, cap, 2), np.float32)),
            jnp.asarray(np.eye(3, dtype=np.float32)),
            jnp.asarray(np.eye(3, dtype=np.float32)),
            jnp.asarray(np.zeros(3, np.float32)),
            jnp.asarray(eye), jnp.asarray(eye),
            jnp.asarray(np.zeros((n_pad, 3), np.float32)),
            jnp.asarray(np.zeros((n_pad, cap), bool)),
            tri_cfg)

    return thunk
