"""HTTP serving surface: health/methods/match/detect round-trips against
a live server on an ephemeral port (CPU backend; tests the full request
path incl. base64 decoding, canonical resize and error handling)."""

import base64
import io
import json
import threading
import urllib.request
import urllib.error

import numpy as np
import pytest

from tpu3drec.serve import MatchServer


@pytest.fixture(scope="module")
def server():
    ms = MatchServer(shape=(120, 160), max_features=256)
    httpd = ms.start(host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, json.loads(r.read())


def _post(url, body):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=600) as r:
        return r.status, json.loads(r.read())


def _png_b64(img):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray((img * 255).astype(np.uint8)).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _scene(seed, shift=0):
    rng = np.random.default_rng(seed)
    img = np.zeros((120, 160), np.float32)
    for _ in range(25):
        y, x = rng.integers(5, 100), rng.integers(5, 140)
        img[y:y + rng.integers(4, 18), x:x + rng.integers(4, 18)] += \
            rng.uniform(0.2, 0.8)
    img = np.clip(img, 0, 1)
    return np.roll(img, shift, axis=1) if shift else img


def test_health_and_methods(server):
    code, h = _get(server + "/health")
    assert code == 200 and h["status"] == "ok"
    assert h["canonical_shape"] == [120, 160]
    code, m = _get(server + "/methods")
    assert code == 200 and "SIFT" in m["methods"] and "ORB" in m["methods"]


def test_match_base64_and_list(server):
    img = _scene(1)
    warped = _scene(1, shift=3)
    code, out = _post(server + "/match",
                      {"image1": _png_b64(img), "image2": _png_b64(warped),
                       "method": "SIFT"})
    assert code == 200
    assert out["num_matches"] > 10
    assert out["homography"] is not None and len(out["homography"]) == 3
    assert out["latency_s"] > 0

    # nested-list input, bigger image -> canonical resize path
    big = np.kron(img, np.ones((2, 2), np.float32))
    code, out2 = _post(server + "/match",
                       {"image1": big.tolist(), "image2": big.tolist()})
    assert code == 200 and out2["num_matches"] > 10


def test_detect_and_errors(server):
    code, out = _post(server + "/detect",
                      {"image": _scene(2).tolist(), "method": "ORB"})
    assert code == 200 and out["num_keypoints"] > 5
    assert len(out["keypoints"][0]) == 3

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server + "/match", {"image1": _scene(3).tolist()})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server + "/nope", {})
    assert e.value.code == 404

    code, h = _get(server + "/health")
    assert h["stats"]["requests"] >= 3 and h["stats"]["errors"] >= 1
    assert h["compiled"] is True


def test_concurrent_requests_microbatch(server):
    """Concurrent /match requests coalesce into one vmapped dispatch
    (MicroBatcher): fire several in parallel with a widened window and
    assert the server reports a batched dispatch covering them."""
    import tpu3drec.serve as serve_mod
    # reach into the live server via the module-scope fixture's port is
    # not possible; use a dedicated server with a big window instead
    ms = serve_mod.MatchServer(shape=(120, 160), max_features=256,
                               batch_window_s=0.6, max_batch=8)
    httpd = ms.start(host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    try:
        base = f"http://127.0.0.1:{port}"
        img = _scene(5)
        warped = _scene(5, shift=2)
        body = {"image1": img.tolist(), "image2": warped.tolist(),
                "method": "SIFT"}
        results = [None] * 4
        def worker(i):
            results[i] = _post(base + "/match", body)
        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert all(r is not None and r[0] == 200 for r in results)
        outs = [r[1] for r in results]
        assert all(o["num_matches"] > 5 for o in outs)
        assert max(o["batched_with"] for o in outs) >= 2
        code, h = _get(base + "/health")
        assert h["batching"]["enabled"]
        assert h["batching"]["max_batch"] >= 2
        assert h["batching"]["batched_requests"] >= 4
    finally:
        httpd.shutdown()


def test_microbatch_overflow_drains_past_max_batch():
    """More concurrent requests than max_batch: the window leader must
    drain the pending queue across MULTIPLE dispatches (and late
    arrivals past the cap get picked up rather than waiting forever).
    Exercises MicroBatcher.submit's drain loop directly."""
    import tpu3drec.serve as serve_mod

    ms = serve_mod.MatchServer(shape=(120, 160), max_features=256,
                               batch_window_s=0.4, max_batch=2)
    img1 = _scene(5)
    img2 = _scene(5, shift=2)
    n = 5
    results = [None] * n

    def worker(i):
        results[i] = ms.batcher.submit(img1, img2, 0.75, 3.0)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert all(r is not None for r in results), results
    assert all(r["num_matches"] > 5 for r in results)
    st = ms.batcher.stats
    # 5 requests at cap 2 need >= 3 dispatches, none bigger than the cap
    assert st["batched_requests"] == n
    assert st["dispatches"] >= 3
    assert st["max_batch"] <= 2
