"""HTTP inference serving for the matching stage.

The reference deploys as docker-compose batch jobs only
(FeatureMatchingExtraction/docker-compose.yaml); there is no online
serving surface. This module adds one, built for the TPU execution
model:

- **Static shapes**: every request image is resized server-side to one
  canonical (H, W) before detection, so the whole fleet of requests hits
  a single traced+compiled XLA program (first request pays the compile;
  the rest are steady-state).
- **One chip, one compute stream**: requests serialize through a lock —
  concurrent processes/streams can fault a single TPU chip, and
  throughput comes from batching, not interleaving.
- stdlib-only (http.server): no web-framework dependency to gate.

Endpoints (JSON in/out):
  GET  /health   -> {status, backend, compiled}
  GET  /methods  -> detector registry listing
  POST /match    -> body {image1, image2, method?, max_features?,
                    ratio?} where imageN is either a base64-encoded
                    image file (PNG/JPEG) or a nested list of floats;
                    returns match stats + homography.
  POST /detect   -> body {image, method?, max_features?}; returns
                    keypoint count and (x, y, response) triples.

Start: ``python -m tpu3drec serve --port 8765`` (or serve_forever()).
"""

from __future__ import annotations

import base64
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional, Tuple

import numpy as np

DEFAULT_SHAPE = (480, 640)   # canonical (H, W): one compiled program


def _decode_image(payload, shape: Tuple[int, int]) -> np.ndarray:
    """base64 image file or nested list -> (H, W) f32 [0,1] at `shape`."""
    if isinstance(payload, str):
        from PIL import Image
        raw = base64.b64decode(payload)
        with Image.open(io.BytesIO(raw)) as im:
            img = np.asarray(im.convert("L"), np.float32) / 255.0
    else:
        img = np.asarray(payload, np.float32)
        if img.ndim == 3:
            img = img @ np.array([0.299, 0.587, 0.114], np.float32)
        if img.max() > 2.0:
            img = img / 255.0
    if img.shape != shape:
        from PIL import Image
        pil = Image.fromarray(
            (np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8))
        img = np.asarray(pil.resize((shape[1], shape[0])),
                         np.float32) / 255.0
    return img


class MicroBatcher:
    """Coalesces concurrent /match requests into ONE vmapped dispatch.

    Single-chip serving throughput comes from batching, not stream
    interleaving (the chip serializes streams anyway): the first request
    of a window becomes the leader, sleeps `window_s` while peers
    enqueue, then runs the whole group through one jitted vmapped
    detect+match+RANSAC program at a power-of-two capacity bucket
    (padded with the last item; per-request ratio/threshold ride as
    traced per-item scalars, so mixed parameters share one program).
    The batched path measured 132+ pairs/s vs ~9 pairs/s serial
    dispatch on the same chip (bench.py) — this is that shape, online.
    """

    def __init__(self, shape: Tuple[int, int], max_features: int,
                 tpu_lock: threading.Lock, max_batch: int = 8,
                 window_s: float = 0.005, wait_timeout_s: float = 1800.0):
        self.shape = shape
        self.max_features = max_features
        self.tpu_lock = tpu_lock
        self.max_batch = max_batch
        self.window_s = window_s
        # must exceed worst-case FIRST compile of the batch program
        # (~10-15 min over the remote tunnel, CLAUDE.md) or concurrent
        # cold-start requests spuriously time out while the leader is
        # still compiling
        self.wait_timeout_s = wait_timeout_s
        self._mutex = threading.Lock()
        self._pending: list = []
        self._progs: Dict[int, object] = {}
        self.stats = {"dispatches": 0, "batched_requests": 0,
                      "max_batch": 0}

    def _program(self, b: int):
        if b not in self._progs:
            import jax
            import jax.numpy as jnp
            from tpu3drec.ops.sift import detect_and_compute
            from tpu3drec.ops.match import knn2
            from tpu3drec.ops.geometry import (
                find_homography, reprojection_error_homography,
            )
            mf = self.max_features

            def pair(img1, img2, ratio, thr, key):
                xy1, r1, s1, a1, d1, m1 = detect_and_compute(img1, mf)
                xy2, r2, s2, a2, d2, m2 = detect_and_compute(img2, mf)
                nn_idx, nn_dist = knn2(d1, d2, m1, m2, metric="l2_int8")
                ok = (nn_dist[:, 0] <
                      ratio * jnp.maximum(nn_dist[:, 1], 1e-12)) & m1
                p1, p2 = xy1, xy2[nn_idx[:, 0]]
                rr = find_homography(p1, p2, mask=ok, threshold=thr,
                                     num_hypotheses=256, key=key)
                err = reprojection_error_homography(rr.model, p1, p2,
                                                    rr.inliers)
                return {"raw": jnp.sum(ok.astype(jnp.int32)),
                        "inl": rr.num_inliers,
                        "ratio": rr.inlier_ratio,
                        "success": rr.success, "H": rr.model,
                        "err": err}

            self._progs[b] = jax.jit(jax.vmap(pair))
        return self._progs[b]

    def _run_batch(self, batch: list) -> None:
        import jax
        import jax.numpy as jnp
        n = len(batch)
        b = 1
        while b < n:
            b *= 2
        b = min(b, max(self.max_batch, 1))
        pad = batch + [batch[-1]] * (b - n)
        i1 = jnp.asarray(np.stack([it["img1"] for it in pad]))
        i2 = jnp.asarray(np.stack([it["img2"] for it in pad]))
        ratios = jnp.asarray([it["ratio"] for it in pad], jnp.float32)
        thrs = jnp.asarray([it["thr"] for it in pad], jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(0), b)
        with self.tpu_lock:
            out = self._program(b)(i1, i2, ratios, thrs, keys)
        out = {k: np.asarray(v) for k, v in out.items()}
        with self._mutex:
            self.stats["dispatches"] += 1
            self.stats["batched_requests"] += n
            self.stats["max_batch"] = max(self.stats["max_batch"], n)
        for j, it in enumerate(batch):
            ok = bool(out["success"][j])
            raw = int(out["raw"][j])
            inl = int(out["inl"][j]) if ok else raw
            ir = float(out["ratio"][j]) if ok else None
            err = float(out["err"][j]) if ok else None
            q = min(inl / 500.0, 1.0) * 0.4
            if ir is not None:
                q += ir * 0.4
            if err is not None:
                q += max(0.0, 1.0 - err / 10.0) * 0.2
            it["result"] = {
                "num_matches": inl,
                "num_raw_matches": raw,
                "inlier_ratio": ir,
                "reprojection_error": err,
                "quality_score": q,
                "homography": (out["H"][j].tolist() if ok else None),
                "batched_with": n,
            }
            it["event"].set()

    def submit(self, img1: np.ndarray, img2: np.ndarray,
               ratio: float, threshold: float) -> Dict:
        item = {"img1": img1, "img2": img2, "ratio": ratio,
                "thr": threshold, "event": threading.Event(),
                "result": None}
        with self._mutex:
            self._pending.append(item)
            leader = len(self._pending) == 1
        if not leader:
            # a later arrival past max_batch elects itself leader of the
            # NEXT window via the pending-queue length check above
            if not item["event"].wait(timeout=self.wait_timeout_s):
                raise TimeoutError("batched match timed out")
            return item["result"]
        time.sleep(self.window_s)
        while True:
            with self._mutex:
                batch = self._pending[: self.max_batch]
                self._pending = self._pending[self.max_batch:]
                drained = not self._pending
            if not batch:
                break
            self._run_batch(batch)
            if item["result"] is not None and drained:
                break
        # double-leader race: a late arrival can elect itself leader
        # (len(pending)==1 at append) while the previous leader is still
        # draining — the old leader then runs OUR item's batch and this
        # loop finds the queue empty before _run_batch has filled
        # item['result']. Wait for the event like a non-leader would
        # instead of returning None mid-flight.
        if item["result"] is None:
            if not item["event"].wait(timeout=self.wait_timeout_s):
                raise TimeoutError("batched match timed out")
        return item["result"]


class MatchServer:
    """Serving wrapper: owns the lock, the canonical shape, and stats."""

    def __init__(self, shape: Tuple[int, int] = DEFAULT_SHAPE,
                 max_features: int = 1024,
                 max_body_bytes: int = 64 << 20,
                 enable_batching: bool = True,
                 batch_window_s: float = 0.005,
                 max_batch: int = 8):
        self.shape = tuple(shape)
        self.max_features = max_features
        self.max_body_bytes = max_body_bytes
        self.lock = threading.Lock()          # TPU compute stream
        self.stats_lock = threading.Lock()    # shared stats/compiled flag
        self.stats = {"requests": 0, "errors": 0, "total_s": 0.0}
        self.compiled = False
        self.enable_batching = enable_batching
        self.batcher = MicroBatcher(self.shape, max_features, self.lock,
                                    max_batch=max_batch,
                                    window_s=batch_window_s)

    def _count(self, key: str, dt: float = 0.0) -> None:
        """Thread-safe stats update (handler threads are concurrent)."""
        with self.stats_lock:
            self.stats[key] += 1
            self.stats["total_s"] += dt
            if key == "requests":
                self.compiled = True

    # -- handlers ------------------------------------------------------

    def health(self) -> Dict:
        import jax
        with self.stats_lock:
            compiled, stats = self.compiled, dict(self.stats)
        with self.batcher._mutex:
            bstats = dict(self.batcher.stats)
        return {"status": "ok", "backend": jax.default_backend(),
                "canonical_shape": list(self.shape),
                "compiled": compiled, "stats": stats,
                "batching": {"enabled": self.enable_batching, **bstats}}

    def methods(self) -> Dict:
        from tpu3drec.api import _get_detector_registry
        return {"methods": sorted(_get_detector_registry())}

    def match(self, body: Dict) -> Dict:
        from tpu3drec.api import match_images
        img1 = _decode_image(body["image1"], self.shape)
        img2 = _decode_image(body["image2"], self.shape)
        method = body.get("method", "SIFT")
        mf = int(body.get("max_features", self.max_features))
        t0 = time.perf_counter()
        if (self.enable_batching and method == "SIFT"
                and mf == self.max_features):
            out = self.batcher.submit(
                img1, img2, float(body.get("ratio", 0.75)),
                float(body.get("ransac_threshold", 4.0)))
            out = {"method": method, **out,
                   "latency_s": round(time.perf_counter() - t0, 4)}
            return out
        with self.lock:
            r = match_images(img1, img2, method=method, max_features=mf,
                             ratio=float(body.get("ratio", 0.75)))
        dt = time.perf_counter() - t0
        H = r.homography
        return {
            "method": method,
            "num_matches": int(r.num_matches),
            "inlier_ratio": (None if r.inlier_ratio is None
                             else float(r.inlier_ratio)),
            "reprojection_error": (None if r.reprojection_error is None
                                   else float(r.reprojection_error)),
            "quality_score": float(r.get_quality_score()),
            "homography": (None if H is None
                           else np.asarray(H).tolist()),
            "latency_s": round(dt, 4),
        }

    def detect(self, body: Dict) -> Dict:
        from tpu3drec.api import detect_features
        img = _decode_image(body["image"], self.shape)
        method = body.get("method", "SIFT")
        mf = int(body.get("max_features", self.max_features))
        with self.lock:
            f = detect_features(img, method, max_features=mf)
        m = np.asarray(f.mask)
        xy = np.asarray(f.xy)[m]
        resp = np.asarray(f.response)[m]
        return {
            "method": method,
            "num_keypoints": int(m.sum()),
            "keypoints": [[float(x), float(y), float(s)]
                          for (x, y), s in zip(xy, resp)],
        }

    # -- wiring --------------------------------------------------------

    def make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):   # quiet by default
                pass

            def _send(self, code: int, obj: Dict):
                data = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                try:
                    if self.path == "/health":
                        self._send(200, server.health())
                    elif self.path == "/methods":
                        self._send(200, server.methods())
                    else:
                        self._send(404, {"error": f"no route {self.path}"})
                except Exception as e:   # pragma: no cover
                    server._count("errors")
                    self._send(500, {"error": str(e)})

            def do_POST(self):
                t0 = time.perf_counter()
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    if n > server.max_body_bytes:
                        self._send(413, {
                            "error": f"body {n} B exceeds limit "
                                     f"{server.max_body_bytes} B"})
                        return
                    body = json.loads(self.rfile.read(n) or b"{}")
                    if self.path == "/match":
                        out = server.match(body)
                    elif self.path == "/detect":
                        out = server.detect(body)
                    else:
                        self._send(404, {"error": f"no route {self.path}"})
                        return
                    server._count("requests", time.perf_counter() - t0)
                    self._send(200, out)
                except KeyError as e:
                    server._count("errors")
                    self._send(400, {"error": f"missing field {e}"})
                except Exception as e:
                    server._count("errors")
                    self._send(500, {"error": str(e)})

        return Handler

    def start(self, host: str = "127.0.0.1", port: int = 8765,
              warmup: bool = False) -> ThreadingHTTPServer:
        """Bind and return the server (caller runs serve_forever)."""
        httpd = ThreadingHTTPServer((host, port), self.make_handler())
        if warmup:
            self._warmup()
        return httpd

    def _warmup(self) -> None:
        """Trace+compile the canonical program before serving traffic."""
        rng = np.random.default_rng(0)
        img = rng.uniform(0.0, 1.0, self.shape).astype(np.float32)
        self.match({"image1": img.tolist(), "image2": img.tolist()})
        self.stats["requests"] = 0
        self.stats["total_s"] = 0.0


def serve_forever(host: str = "127.0.0.1", port: int = 8765,
                  shape: Tuple[int, int] = DEFAULT_SHAPE,
                  max_features: int = 1024, warmup: bool = True) -> None:
    ms = MatchServer(shape=shape, max_features=max_features)
    httpd = ms.start(host, port, warmup=warmup)
    print(f"tpu3drec serving on http://{host}:{port} "
          f"(canonical {shape[0]}x{shape[1]}, warmup={warmup})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        httpd.shutdown()
