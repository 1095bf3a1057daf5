"""Headline benchmark: image pairs/s for SIFT detect + BF ratio match +
homography RANSAC at 2K keypoints, 640x480, batched on one TPU chip.

Reference baseline: 6.06 pairs/s (SIFT+BF, OpenCV CPU, serial,
BASELINE.md "SIFT pipeline time / FPS"). vs_baseline = ours / 6.06.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

BASELINE_PAIRS_PER_S = 6.06  # reference SIFT+BF CPU (BASELINE.md)


def synthetic_photo(h, w, seed):
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    for _ in range(60):
        y, x = rng.integers(5, h - 40), rng.integers(5, w - 40)
        hh, ww = rng.integers(8, 80), rng.integers(8, 80)
        img[y:y + hh, x:x + ww] += rng.uniform(-0.4, 0.4)
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(20):
        cy, cx, r = rng.integers(20, h - 20), rng.integers(20, w - 20), rng.integers(5, 30)
        img += rng.uniform(-0.3, 0.3) * (((yy - cy) ** 2 + (xx - cx) ** 2) < r * r)
    img += 0.02 * rng.standard_normal((h, w)).astype(np.float32)
    img -= img.min()
    img /= img.max()
    return img.astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _make_pair_fn

    import os
    H, W = 480, 640
    MAX_FEATURES = 2048
    BATCH = int(os.environ.get("BENCH_BATCH", "8"))
    REPS = int(os.environ.get("BENCH_REPS", "5"))

    pair_fn = _make_pair_fn(max_features=MAX_FEATURES, num_hypotheses=256)
    batched = jax.jit(jax.vmap(pair_fn))

    imgs1 = jnp.asarray(np.stack([synthetic_photo(H, W, i) for i in range(BATCH)]))
    imgs2 = jnp.asarray(np.stack([synthetic_photo(H, W, 100 + i) for i in range(BATCH)]))

    # warmup / compile. NB: block_until_ready does NOT block on the axon
    # backend (CLAUDE.md) — force a host materialization of an output that
    # depends on the whole computation instead.
    def materialize(o):
        return np.asarray(o["num_inliers"]).sum() + np.asarray(o["num_matches"]).sum()

    materialize(batched(imgs1, imgs2))

    t0 = time.perf_counter()
    for _ in range(REPS):
        materialize(batched(imgs1, imgs2))
    dt = (time.perf_counter() - t0) / REPS
    pairs_per_s = BATCH / dt

    print(json.dumps({
        "metric": "pairs/s SIFT detect+match+RANSAC (2K kpts, 640x480, batch 8)",
        "value": round(pairs_per_s, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
