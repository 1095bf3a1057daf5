"""Benchmark harness tests: synthetic generator determinism, GT transforms,
quality metrics, statistical analyzer, unified runner (reference
benchmarking.py / benchmark_pipeline.py)."""

import json

import numpy as np
import pytest

from tpu3drec.bench.synthetic import SyntheticImageGenerator, create_transform_pair
from tpu3drec.bench.metrics import AdvancedQualityMetrics
from tpu3drec.bench.stats import StatisticalAnalyzer, describe
from tpu3drec.bench.runner import (
    UnifiedBenchmarkConfig, UnifiedBenchmarkPipeline, quick_synthetic_benchmark,
)


def test_generator_deterministic():
    gen = SyntheticImageGenerator(width=160, height=120, seed=7)
    a = gen.generate()
    b = gen.generate()
    np.testing.assert_array_equal(a, b)
    c = gen.generate(seed=8)
    assert np.abs(a - c).max() > 0.1
    assert a.shape == (120, 160) and a.dtype == np.float32
    assert 0.0 <= a.min() and a.max() <= 1.0


@pytest.mark.parametrize("ttype", ["perspective", "affine", "rotation", "scale"])
def test_transform_pairs_have_correct_gt(ttype):
    gen = SyntheticImageGenerator(width=160, height=120, seed=3)
    img = gen.generate()
    warped, H = create_transform_pair(img, ttype, magnitude=0.2, seed=1)
    assert warped.shape == img.shape
    # GT check by direct comparison: warp img by H ourselves and compare
    from tpu3drec.bench.synthetic import _warp
    np.testing.assert_allclose(warped, _warp(img, H), atol=1e-6)
    # center stays roughly in frame
    c = H @ np.array([80, 60, 1.0])
    assert 0 < c[0] / c[2] < 160 and 0 < c[1] / c[2] < 120


def test_quality_metrics_perfect_matches():
    rng = np.random.default_rng(0)
    H = np.array([[1.05, 0.02, 5], [-0.01, 0.98, -3], [1e-5, 0, 1]])
    p1 = rng.uniform(20, 300, (200, 2))
    ph = np.concatenate([p1, np.ones((200, 1))], 1) @ H.T
    p2 = ph[:, :2] / ph[:, 2:3]
    q = AdvancedQualityMetrics.comprehensive_quality_assessment(
        p1, p2, H, H, (480, 640))
    assert q["mean_error"] < 1e-6
    assert q["inlier_ratio"] == 1.0
    assert q["frobenius_error"] < 1e-9
    assert q["overall_quality"] > 0.7
    # corrupted matches score lower
    p2_bad = p2 + rng.uniform(-50, 50, p2.shape)
    q_bad = AdvancedQualityMetrics.comprehensive_quality_assessment(
        p1, p2_bad, None, H, (480, 640))
    assert q_bad["overall_quality"] < q["overall_quality"] - 0.2


def test_statistical_analyzer():
    rng = np.random.default_rng(1)
    a = rng.normal(10, 1, 20)
    b = rng.normal(12, 1, 20)
    cmp = StatisticalAnalyzer.compare_methods(a, b)
    assert cmp["significant"]
    assert abs(cmp["cohens_d"]) > 1.0
    same = StatisticalAnalyzer.compare_methods(a, a)
    assert not same["significant"]
    d = describe([1.0, 2.0, 3.0])
    assert d["mean"] == 2.0 and d["n"] == 3


def test_unified_benchmark_runs(tmp_path):
    cfg = UnifiedBenchmarkConfig(methods=("SIFT", "ORB"), num_runs=2,
                                 image_size=(120, 160), max_features=256,
                                 transform_types=("rotation",),
                                 measure_memory=True)
    pipe = UnifiedBenchmarkPipeline(cfg)
    res = pipe.benchmark_synthetic(n_images=1)
    perf = res["benchmarks"]["performance"]["summary"]
    acc = res["benchmarks"]["accuracy"]["summary"]
    for m in ("SIFT", "ORB"):
        assert "error" not in perf[m], perf[m]
        assert perf[m]["fps"] > 0
        assert len(perf[m]["raw_runs"]) == 2
        assert "traced_peak_mb" in perf[m]["raw_runs"][0]["memory"]
        assert acc[m]["avg_quality"] > 0.2, acc[m]
    ranking = res["analysis"]["ranking"]
    assert len(ranking) == 2
    # batched-throughput task (VERDICT r4 #6): vmapped pairs/s per
    # method in the same JSON family; ranking uses it on accelerators
    thr = res["benchmarks"]["throughput"]["summary"]
    for m in ("SIFT", "ORB"):
        assert "error" not in thr[m], thr[m]
        assert thr[m]["batched_pairs_per_s"] > 0
        assert thr[m]["batch"] == cfg.throughput_batch
    assert res["analysis"]["speed_metric"] in ("fps",
                                               "batched_pairs_per_s")
    path = pipe.save_results(res, tmp_path)
    saved = json.loads(path.read_text())
    assert saved["benchmarks"]["performance"]["summary"].keys() == perf.keys()
    table = pipe.print_table(res)
    assert "SIFT" in table and "ORB" in table
