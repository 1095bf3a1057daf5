"""Tests: profiling utilities and the offline synthetic dataset generator."""

import time

import numpy as np
import pytest

from tpu3drec.utils.profiling import (
    Timer, ProfileCollector, device_memory_stats, trace_to,
)
from tpu3drec.data.downloader import (
    generate_synthetic_dataset, download_pixabay_images,
)


def test_timer_and_collector():
    with Timer() as t:
        time.sleep(0.01)
    assert t.elapsed >= 0.009
    pc = ProfileCollector()
    for _ in range(3):
        with pc.span("work"):
            time.sleep(0.002)
    s = pc.summary()
    assert s["work"]["count"] == 3
    assert s["work"]["mean_s"] >= 0.001
    pc.reset()
    assert pc.summary() == {}


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)
    assert "host_rss_bytes" in stats


def test_trace_to_is_safe(tmp_path):
    # must not raise even if the backend can't profile
    with trace_to(str(tmp_path)):
        _ = np.zeros(10) + 1


def test_downloader_requires_key():
    with pytest.raises(ValueError):
        download_pixabay_images("/tmp/x", api_key=None)


def test_synthetic_dataset_feeds_pipeline(tmp_path):
    out = generate_synthetic_dataset(tmp_path / "ds", n_views=4,
                                     width=160, height=120, seed=1)
    assert out["generated"] == 4
    from tpu3drec.pipelines.matching import FeatureProcessingPipeline
    pipe = FeatureProcessingPipeline({"methods": ["SIFT"],
                                      "max_features": 256,
                                      "matcher_config": {"SIFT": "bf"}})
    summary = pipe.match_folder(tmp_path / "ds", tmp_path / "out",
                                batch_size=4)
    assert summary["stats"]["completed"] == 3
    assert summary["stats"]["total_matches"] > 30
