"""Reference-surface compatibility layer.

Everything the reference's public package exports
(FeatureMatchingExtraction/__init__.py:39-302) under the name a
reference user would reach for, mapped onto the TPU-native equivalents.
Class-per-detector wrappers exist only here — the framework itself is
functional (PARITY.md) — and are thin delegates, not a parallel
implementation.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

# -- data structures (core_data_structures.py) -------------------------
from tpu3drec.core.types import (
    Features, Matches, ScoreType, MethodResult, MatchingResult,
    DescriptorKind,
)

FeatureData = Features          # reference FeatureData :39
MatchData = Matches             # reference MatchData :104

# -- pipeline & config ---------------------------------------------------
from tpu3drec.pipelines.matching import (
    FeatureProcessingPipeline, create_pipeline,
)
from tpu3drec.core.config import (
    DEFAULT_CONFIG, PRESET_CONFIGS, create_config_from_preset,
    merge_configs, validate_config, save_config, load_config,
)


def get_default_config() -> Dict[str, Any]:
    """Reference config.py:get_default_config equivalent (deep copy)."""
    import copy
    return copy.deepcopy(DEFAULT_CONFIG)


# -- image manager / batch processor (image_manager.py, batch_processor.py)
from tpu3drec.io.images import (
    ImageCache, BatchImageLoader, FolderImageSource, ImageMetadata,
    scan_folder_metadata, scan_folder_quick, create_pairs_from_metadata,
)
from tpu3drec.io.checkpoint import (
    BatchProcessor, load_progress, delete_progress, get_remaining_pairs,
)

# -- matchers / selection (feature_matchers.py, matcher_factory.py) -----
from tpu3drec.ops.match import (
    match_features, match_descriptors, auto_select_matcher,
)
from tpu3drec.core.registry import (
    MatcherFactory, MatcherCompatibilityManager,
)

# -- result converters (result_converters.py) ---------------------------
from tpu3drec.io.converters import (
    MethodReconstructionData, MultiMethodReconstruction,
    save_for_reconstruction, load_for_reconstruction, export_results_csv,
)

MultiMethodReconstructionData = MultiMethodReconstruction

# -- visualization (visualization.py) ------------------------------------
from tpu3drec.viz import (
    visualize_matches, visualize_keypoints_only, visualize_matches_quick,
    show_matches, visualize_matches_with_scores, plot_method_comparison,
    plot_visualization_data, save_visualization,
)

# -- multi-method detector -----------------------------------------------
from tpu3drec.multi_method import (
    MultiMethodFeatureDetector, create_multi_detector,
)


# -- match filtering utils (utils.py:118-247) ----------------------------

def enhanced_filter_matches_with_homography(features1: Features,
                                            features2: Features,
                                            matches: Matches,
                                            threshold: float = 4.0):
    """utils.py:118 equivalent: RANSAC-homography filter. Returns
    (filtered Matches, H (3,3) np.ndarray or None, inlier_ratio)."""
    from tpu3drec.ops.geometry import find_homography
    p1, p2 = matches.gather_points(features1, features2)
    rr = find_homography(p1, p2, mask=matches.mask, threshold=threshold)
    if not bool(rr.success):
        return matches, None, 0.0
    return (matches.replace(mask=rr.inliers), np.asarray(rr.model),
            float(rr.inlier_ratio))


def adaptive_match_filtering(features1: Features, features2: Features,
                             matches: Matches,
                             threshold: float = 4.0):
    """utils.py:155 equivalent (homography is the one adaptive mode the
    reference ships)."""
    return enhanced_filter_matches_with_homography(
        features1, features2, matches, threshold)


def calculate_reprojection_error(H, features1: Features,
                                 features2: Features,
                                 matches: Matches) -> float:
    """utils.py:195 equivalent: mean symmetric-forward reprojection
    error of the accepted matches under H."""
    import jax.numpy as jnp
    from tpu3drec.ops.geometry import reprojection_error_homography
    p1, p2 = matches.gather_points(features1, features2)
    return float(reprojection_error_homography(
        jnp.asarray(np.asarray(H, np.float32)), p1, p2, matches.mask))


# -- keypoint (de)serialization (core_data_structures.py:176-205) --------

def keypoint_to_dict(xy, size=1.0, angle=0.0, response=0.0) -> Dict:
    return {"pt": (float(xy[0]), float(xy[1])), "size": float(size),
            "angle": float(angle), "response": float(response)}


def dict_to_keypoint(d: Dict):
    return (np.asarray(d["pt"], np.float32), float(d.get("size", 1.0)),
            float(d.get("angle", 0.0)), float(d.get("response", 0.0)))


def keypoints_to_list(features: Features):
    """Features -> list of keypoint dicts (valid rows only)."""
    f = features.to_numpy() if hasattr(features, "to_numpy") else features
    out = []
    xy, size = np.asarray(f["xy"]), np.asarray(f["scale"])
    ang, resp = np.asarray(f["angle"]), np.asarray(f["response"])
    for i in range(len(xy)):
        out.append(keypoint_to_dict(xy[i], size[i], ang[i], resp[i]))
    return out


def list_to_keypoints(items, desc=None, image_shape=()) -> Features:
    xy = np.asarray([d["pt"] for d in items], np.float32).reshape(-1, 2)
    return Features.from_numpy(
        xy, desc if desc is not None else np.zeros((len(xy), 0)),
        response=[d.get("response", 0.0) for d in items],
        scale=[d.get("size", 1.0) for d in items],
        angle=[d.get("angle", 0.0) for d in items],
        image_shape=image_shape)


# -- class-per-detector shims (traditional_detectors.py,
#    deep_learning_detectors.py) ------------------------------------------

class _DetectorShim:
    """BaseFeatureDetector-shaped wrapper over the functional registry."""

    method: str = "SIFT"

    def __init__(self, max_features: int = 2048, **params):
        self.max_features = max_features
        self.params = params

    def detect(self, image) -> Features:
        from tpu3drec.api import detect_features
        return detect_features(image, self.method,
                               max_features=self.max_features,
                               **self.params)

    __call__ = detect


def _make_shim(method: str):
    return type(f"{method}Detector", (_DetectorShim,),
                {"method": method, "__doc__":
                 f"{method} detector shim (functional core: see ops/)."})


SIFTDetector = _make_shim("SIFT")
ORBDetector = _make_shim("ORB")
AKAZEDetector = _make_shim("AKAZE")
BRISKDetector = _make_shim("BRISK")
HarrisCornerDetector = _make_shim("Harris")
GoodFeaturesToTrackDetector = _make_shim("GFTT")
SuperPointDetector = _make_shim("SuperPoint")
DISKDetector = _make_shim("DISK")
ALIKEDDetector = _make_shim("ALIKED")


def create_traditional_detector(method: str = "SIFT", **kw):
    """traditional_detectors.py:288 equivalent."""
    return _make_shim(method)(**kw)
