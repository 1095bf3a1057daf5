"""Public API: the reference's surface re-exposed over the TPU-native core.

Mirrors FeatureMatchingExtraction/__init__.py:39-302 and pipeline.py entry
points: `create_pipeline(preset)`, `detect_features`, `match_images`,
`quick_match`, `quick_process_folder`.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional, Union

import jax.numpy as jnp
import numpy as np

from tpu3drec.core.config import (
    DETECTOR_SPECIFIC_CONFIGS, MATCHER_SPECIFIC_CONFIGS,
    create_config_from_preset, merge_configs,
)
from tpu3drec.core.types import Features, Matches, MethodResult
from tpu3drec.ops import image as imops
from tpu3drec.ops.match import match_features, auto_select_matcher
from tpu3drec.ops.geometry import (
    find_homography, reprojection_error_homography,
)


def _get_detector_registry():
    """Name -> detect fn (image (H,W) f32 [0,1], **params) -> Features."""
    from tpu3drec.ops.sift import detect_sift_features
    from tpu3drec.ops.harris import detect_harris_features

    def harris(img, **kw):
        kw.pop("use_harris", None)
        return detect_harris_features(img, use_harris=True, method="Harris", **kw)

    def gftt(img, **kw):
        kw.pop("use_harris", None)
        return detect_harris_features(img, use_harris=False,
                                      method="GoodFeatures", **kw)

    registry = {
        "SIFT": detect_sift_features,
        "Harris": harris,
        "GoodFeatures": gftt,
        "GFTT": gftt,          # reference alias (traditional_detectors.py:228)
    }
    from tpu3drec.ops.orb import detect_orb_features
    from tpu3drec.ops.akaze import detect_akaze_features
    from tpu3drec.ops.brisk import detect_brisk_features
    registry["ORB"] = detect_orb_features
    registry["AKAZE"] = detect_akaze_features
    registry["BRISK"] = detect_brisk_features

    # deep detectors register only when converted weights exist on disk —
    # the analogue of the reference's torch import guards
    # (deep_learning_detectors.py:18-25) in this zero-egress environment
    from tpu3drec.models import weights_available
    if weights_available("superpoint"):
        from tpu3drec.models.superpoint import detect_superpoint_features
        registry["SuperPoint"] = detect_superpoint_features
    if weights_available("disk"):
        from tpu3drec.models.disk import detect_disk_features
        registry["DISK"] = detect_disk_features
    if weights_available("aliked"):
        from tpu3drec.models.aliked import detect_aliked_features
        registry["ALIKED"] = detect_aliked_features
    return registry


def prepare_image(image: Union[np.ndarray, jnp.ndarray]) -> jnp.ndarray:
    """Any uint8/float, gray/RGB image -> (H, W) float32 in [0, 1]."""
    arr = np.asarray(image)
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    else:
        arr = arr.astype(np.float32)
        if arr.max() > 2.0:  # heuristically 0-255 floats
            arr = arr / 255.0
    x = jnp.asarray(arr)
    return imops.rgb_to_gray(x)


def _detector_params(method: str, config: Optional[Dict[str, Any]],
                     max_features: Optional[int]) -> Dict[str, Any]:
    params = dict(DETECTOR_SPECIFIC_CONFIGS.get(method, {}))
    if config:
        params.update((config.get("detector_params") or {}).get(method, {}))
        if config.get("max_features"):
            params["max_features"] = config["max_features"]
    if max_features:
        params["max_features"] = max_features
    return params


def detect_features(image, method: str = "SIFT",
                    max_features: Optional[int] = None,
                    config: Optional[Dict[str, Any]] = None,
                    **params) -> Features:
    """Detect keypoints + descriptors with one method (reference:
    BaseFeatureDetector.detect, base_classes.py:15-73)."""
    registry = _get_detector_registry()
    if method not in registry:
        raise ValueError(f"Unknown or unavailable detector {method!r}; "
                         f"have {sorted(registry)}")
    img = prepare_image(image)
    kw = _detector_params(method, config, max_features)
    kw.update(params)
    return registry[method](img, **kw)


def match_images(image1, image2, method: str = "SIFT",
                 matcher: str = "auto", ratio: Optional[float] = None,
                 max_features: Optional[int] = None,
                 filter_matches: bool = True,
                 ransac_threshold: float = 4.0,
                 config: Optional[Dict[str, Any]] = None) -> MethodResult:
    """Detect + match + homography-filter one pair with one method.

    The single-method analogue of FeatureProcessingPipeline.match
    (pipeline.py:109-282): returns a MethodResult with raw matches, RANSAC-
    filtered matches, homography, inlier ratio, and reprojection error.
    """
    t0 = time.perf_counter()
    f1 = detect_features(image1, method, max_features, config)
    f2 = detect_features(image2, method, max_features, config)
    # host materialization, not block_until_ready: the latter is a no-op
    # on the axon backend (CLAUDE.md), which made detection_time ~0 on
    # real TPUs (same fix as bench.py / pipelines/matching.py)
    np.asarray(jnp.sum(f1.desc) + jnp.sum(f2.desc))
    t1 = time.perf_counter()

    if matcher == "auto":
        matcher = auto_select_matcher(f1)
    mparams = dict(MATCHER_SPECIFIC_CONFIGS.get(matcher, {}))
    if ratio is not None:
        mparams["ratio_threshold"] = ratio
    m = match_features(f1, f2, ratio=mparams.get("ratio_threshold", 0.75),
                       cross_check=mparams.get("cross_check", False),
                       method=method)
    np.asarray(jnp.sum(m.mask))
    t2 = time.perf_counter()

    result = MethodResult(
        method=method, features1=f1, features2=f2, matches=m,
        detection_time=t1 - t0, matching_time=t2 - t1,
    )
    if filter_matches:
        p1, p2 = m.gather_points(f1, f2)
        rr = find_homography(p1, p2, mask=m.mask,
                             threshold=ransac_threshold)
        if bool(rr.success):
            result.filtered_matches = m.replace(mask=rr.inliers)
            result.homography = np.asarray(rr.model)
            result.inlier_ratio = float(rr.inlier_ratio)
            result.reprojection_error = float(
                reprojection_error_homography(rr.model, p1, p2, rr.inliers))
    return result


def quick_match(image1, image2, method: str = "SIFT", **kw) -> MethodResult:
    """One-call pair matching (reference __init__.py:392-437)."""
    return match_images(image1, image2, method=method, **kw)


def create_pipeline(preset: str = "balanced",
                    config: Optional[Dict[str, Any]] = None):
    """Build a FeatureProcessingPipeline from a preset
    (reference pipeline.py:830-878)."""
    from tpu3drec.pipelines.matching import FeatureProcessingPipeline
    cfg = create_config_from_preset(preset, config)
    return FeatureProcessingPipeline(cfg)


def quick_process_folder(folder, output_dir, preset: str = "balanced",
                         **kw):
    """One-call folder processing (reference __init__.py:439-...)."""
    return create_pipeline(preset).match_folder(folder, output_dir, **kw)


def reconstruct_folder(folder, output_dir, preset: str = "balanced",
                       dense: bool = False,
                       sfm_config=None,
                       chosen_images: Optional[list] = None,
                       **match_kw) -> Dict[str, Any]:
    """End-to-end chain: matching -> incremental SfM [-> dense], with
    IN-PROCESS stage handoff.

    The reference links its three stages through pickle files on a shared
    filesystem (SURVEY §1 cross-stage data flow: FME/pipeline.py:628-650
    -> others/utils.py:116 -> CPE/pipeline.py:233); here each stage's
    output feeds the next directly in memory — the pipeline-parallel
    handoff row of SURVEY §2.7 — while the pickle interchange is still
    written for reference-format compatibility and resume.
    """
    from pathlib import Path
    from tpu3drec.sfm import SfMPipeline

    out = Path(output_dir)
    # homography RANSAC filtering is the right gate for near-planar pair
    # scoring, but it prunes valid correspondences of genuinely 3-D
    # scenes; the SfM stage applies essential-matrix RANSAC itself, so
    # the reconstruction chain feeds it unfiltered matches
    pipe = create_pipeline(preset, {
        "filtering": {"use_adaptive_filtering": False}})
    summary = pipe.match_folder(folder, out / "matching",
                                collect_results=True, **match_kw)
    matches_data = summary.pop("matches_data")
    image_info = summary.pop("image_info")

    sfm = SfMPipeline(sfm_config)
    recon = sfm.reconstruct(matches_data, image_info,
                            output_dir=out / "sfm",
                            chosen_images=chosen_images,
                            checkpoint_dir=out / "sfm")
    result: Dict[str, Any] = {
        "matching": summary,
        "reconstruction": recon,
        "sfm_stats": recon.stats(),
    }
    if dense and recon.num_cameras >= 2:
        from tpu3drec.pipelines.dense import run_dense_reconstruction
        from tpu3drec.io.images import FolderImageSource
        src = FolderImageSource(folder)
        names = [n for n in recon.cameras]
        images = src.loader.load_batch(
            [m for m in src.get_metadata_list() if m.name in names])
        result["dense"] = run_dense_reconstruction(
            recon.to_legacy_format(), images, output_dir=out / "dense")
    return result
