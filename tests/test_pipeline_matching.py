"""Folder pipeline tests: image manager, checkpoint/resume, batch pickles,
COLMAP export, batch summary (reference pipeline.py:327-716 semantics)."""

import json
import pickle
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from tpu3drec.io.images import (
    scan_folder_metadata, scan_folder_quick, ImageCache, BatchImageLoader,
    FolderImageSource, create_pairs_from_metadata,
)
from tpu3drec.io.checkpoint import (
    BatchProcessor, load_progress, delete_progress, get_remaining_pairs,
)
from tpu3drec.io.batch_pickle import load_and_validate_pickle
from tpu3drec.pipelines.matching import create_pipeline


def make_folder(tmp_path, n=5, h=120, w=160, drift=3):
    """Write a sequence of shifted structured images (viewable as a 'scan')."""
    rng = np.random.default_rng(0)
    base = np.zeros((h, w + drift * n), np.float32)
    for _ in range(30):
        y, x = rng.integers(5, h - 20), rng.integers(5, w - 20)
        hh, ww = rng.integers(5, 40), rng.integers(5, 40)
        base[y:y + hh, x:x + ww] += rng.uniform(-0.5, 0.5)
    base -= base.min()
    base /= base.max()
    folder = tmp_path / "imgs"
    folder.mkdir()
    for i in range(n):
        crop = base[:, i * drift:i * drift + w]
        Image.fromarray((crop * 255).astype(np.uint8)).save(
            folder / f"img_{i:02d}.png")
    return folder


def test_scan_and_pairs(tmp_path):
    folder = make_folder(tmp_path)
    metas = scan_folder_metadata(folder)
    assert len(metas) == 5
    assert metas[0].width == 160 and metas[0].height == 120
    q = scan_folder_quick(folder)
    assert q["num_images"] == 5

    assert create_pairs_from_metadata(metas, "consecutive") == \
        [(f"img_{i:02d}.png", f"img_{i+1:02d}.png") for i in range(4)]
    assert len(create_pairs_from_metadata(metas, "all")) == 10
    first = create_pairs_from_metadata(metas, "first")
    assert first[0] == ("img_00.png", "img_01.png") and len(first) == 4
    assert len(create_pairs_from_metadata(metas, "consecutive", window=2)) == 7


def test_image_cache_eviction():
    cache = ImageCache(max_bytes=4 * 100 * 100 * 3)  # holds 3 images
    for i in range(5):
        cache.put(f"im{i}", np.zeros((100, 100), np.float32))
    assert len(cache) == 3
    assert "im0" not in cache and "im4" in cache


def test_batch_loader_uses_cache(tmp_path):
    folder = make_folder(tmp_path)
    metas = scan_folder_metadata(folder)
    loader = BatchImageLoader()
    loader.load_batch(metas[:3])
    assert loader.cache.misses == 3
    loader.load_batch(metas[1:4])
    assert loader.cache.misses == 4  # only one new load
    r = loader.analyze_batch_reuse([m.name for m in metas[:3]],
                                   [m.name for m in metas[1:4]])
    assert r["reused"] == 2 and r["new"] == 1


def test_batch_processor_checkpoint_semantics(tmp_path):
    """Mirrors the reference's embedded self-test (batch_processor.py:275-335)."""
    pairs = [("a", "b"), ("b", "c"), ("c", "d")]
    bp = BatchProcessor(tmp_path)
    assert not bp.is_completed(pairs[0])
    bp.mark_completed(pairs[0])
    bp.mark_completed(pairs[1])
    assert (tmp_path / "progress.json").exists()

    # resume in a fresh instance
    bp2 = BatchProcessor(tmp_path)
    assert bp2.is_completed(pairs[0]) and bp2.is_completed(pairs[1])
    assert bp2.get_remaining_pairs(pairs) == [pairs[2]]
    assert get_remaining_pairs(tmp_path, pairs) == [pairs[2]]
    assert load_progress(tmp_path)["total_completed"] == 2

    # corrupted checkpoint -> start fresh
    (tmp_path / "progress.json").write_text("{not json")
    bp3 = BatchProcessor(tmp_path)
    assert bp3.num_completed == 0

    bp2.reset()
    assert not (tmp_path / "progress.json").exists()
    assert delete_progress(tmp_path) is False


@pytest.fixture(scope="module")
def folder_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("run")
    folder = make_folder(tmp)
    out = tmp / "out"
    pipe = create_pipeline("fast", {  # ORB unavailable yet -> force SIFT
        "methods": ["SIFT"], "max_features": 512,
        "matcher_config": {"SIFT": "bf"}})
    summary = pipe.match_folder(folder, out, batch_size=2,
                                export_colmap=True)
    return folder, out, summary


def test_match_folder_end_to_end(folder_run):
    folder, out, summary = folder_run
    assert summary["stats"]["completed"] == 4
    assert summary["stats"]["failed"] == 0
    assert summary["stats"]["total_matches"] > 50
    assert (out / "batch_summary.json").exists()
    assert (out / "progress.json").exists()


def test_match_folder_pickles_readable(folder_run):
    folder, out, summary = folder_run
    data = load_and_validate_pickle(str(out / "results_batch_000.pkl"))
    assert data["total_images"] >= 2
    assert data["processing_stats"]["successful_pairs"] >= 1
    pair, pd = next(iter(data["matches_data"].items()))
    corr = np.asarray(pd["correspondences"])
    assert corr.ndim == 2 and corr.shape[1] == 4
    assert pd["num_matches"] == len(corr)
    assert data["image_info"][pair[0]].get("width") == 160


def test_match_folder_colmap_export(folder_run):
    folder, out, summary = folder_run
    dirs = list((out / "colmap").iterdir())
    assert dirs
    files = {p.name for p in dirs[0].iterdir()}
    assert "matches.txt" in files
    assert any(f.endswith("_keypoints.txt") for f in files)


def test_match_folder_resume(folder_run):
    folder, out, summary = folder_run
    pipe = create_pipeline("fast", {"methods": ["SIFT"], "max_features": 512,
                                    "matcher_config": {"SIFT": "bf"}})
    s2 = pipe.match_folder(folder, out, batch_size=2)
    assert s2["stats"]["skipped"] == 4
    assert s2["stats"]["completed"] == 0


def test_match_folder_multi_method_batched(tmp_path):
    """Multi-method configs go through the batched engine too (VERDICT r2
    #5): a ["SIFT", "ORB"] folder run costs ~2 device dispatches per
    METHOD per batch — methods loop as expert branches
    (multi_method_detector.py:112) instead of degrading to the per-pair
    path (~4 dispatches per pair per method)."""
    folder = make_folder(tmp_path)
    out = tmp_path / "out_mm"
    pipe = create_pipeline("fast", {
        "methods": ["SIFT", "ORB"], "max_features": 512})
    summary = pipe.match_folder(folder, out, batch_size=4,
                                auto_save=False, collect_results=True)
    assert summary["stats"]["completed"] == 4
    assert summary["stats"]["failed"] == 0
    # 1 batch x 2 methods x (detect + match) = 4 program invocations;
    # any fallback to the per-pair path would leave this below 4
    assert pipe.dispatch_count == 4, pipe.dispatch_count
    assert set(summary["methods"]) == {"SIFT", "ORB"}
    # every pair's result carries BOTH methods' MethodResults
    pd = next(iter(summary["matches_data"].values()))
    assert pd["num_matches"] >= 0


def test_stage_glue_load_images_and_keypoint_roundtrip(tmp_path):
    """others/utils.py:515-563 glue: load_images skips undecodable paths;
    keypoints round-trip through the serializable dict format."""
    from PIL import Image
    import numpy as np
    from tpu3drec.io.batch_pickle import (
        load_images, keypoints_to_serializable, serializable_to_keypoints)

    good = tmp_path / "a.png"
    Image.fromarray((np.random.default_rng(0).uniform(
        0, 255, (40, 60)).astype(np.uint8))).save(good)
    bad = tmp_path / "broken.png"
    bad.write_bytes(b"not a png")

    loaded = load_images([str(good), str(bad), str(tmp_path / "missing.png")])
    assert len(loaded) == 1
    img, name = loaded[0]
    assert name == "a.png" and img.shape == (40, 60)
    assert img.dtype == np.float32 and 0.0 <= img.min() <= img.max() <= 1.0

    from tpu3drec.core.types import Features
    xy = np.array([[3.0, 4.0], [10.0, 20.0]], np.float32)
    f = Features.from_numpy(xy, np.zeros((2, 8), np.float32),
                            response=[0.5, 0.25], scale=[1.5, 2.0],
                            angle=[30.0, 60.0], image_shape=(40, 60))
    dicts = keypoints_to_serializable(f)
    assert dicts[0]["pt"] == (3.0, 4.0) and dicts[1]["size"] == 2.0
    back = serializable_to_keypoints(dicts, image_shape=(40, 60))
    np.testing.assert_allclose(np.asarray(back.xy)[:2], xy)
    assert serializable_to_keypoints([]).xy.shape[1] == 2
