"""Reference-surface compatibility layer (tpu3drec.compat): every name a
reference user reaches for resolves to the TPU-native equivalent."""

import numpy as np
import pytest

import tpu3drec.compat as C


REF_NAMES = [
    # core data structures
    "FeatureData", "MatchData", "ScoreType", "MethodResult",
    "MatchingResult",
    # pipeline/config
    "FeatureProcessingPipeline", "create_pipeline", "get_default_config",
    "DEFAULT_CONFIG", "create_config_from_preset", "merge_configs",
    "validate_config", "save_config", "load_config",
    # image manager / batch processor
    "ImageCache", "BatchImageLoader", "FolderImageSource",
    "BatchProcessor", "load_progress", "delete_progress",
    "get_remaining_pairs", "create_pairs_from_metadata",
    "scan_folder_quick",
    # matchers
    "auto_select_matcher", "MatcherFactory", "MatcherCompatibilityManager",
    # converters / viz
    "MethodReconstructionData", "MultiMethodReconstruction",
    "save_for_reconstruction", "load_for_reconstruction",
    "visualize_matches_quick", "show_matches", "plot_method_comparison",
    "plot_visualization_data", "save_visualization",
    # utils
    "enhanced_filter_matches_with_homography", "adaptive_match_filtering",
    "calculate_reprojection_error", "keypoint_to_dict", "dict_to_keypoint",
    "keypoints_to_list", "list_to_keypoints",
    # detectors
    "SIFTDetector", "ORBDetector", "AKAZEDetector", "BRISKDetector",
    "HarrisCornerDetector", "GoodFeaturesToTrackDetector",
    "SuperPointDetector", "DISKDetector", "ALIKEDDetector",
    "create_traditional_detector", "MultiMethodFeatureDetector",
    "create_multi_detector",
]


def test_reference_names_resolve():
    missing = [n for n in REF_NAMES if not hasattr(C, n)]
    assert not missing, missing


def test_detector_shim_and_filter_roundtrip(test_image):
    det = C.create_traditional_detector("SIFT", max_features=256)
    f1 = det.detect(test_image)
    f2 = C.SIFTDetector(max_features=256).detect(
        np.roll(test_image, 3, axis=1))
    assert f1.capacity == 256
    m = C.match_features(f1, f2)
    fm, H, ratio = C.enhanced_filter_matches_with_homography(f1, f2, m)
    assert H is not None and ratio > 0.5
    err = C.calculate_reprojection_error(H, f1, f2, fm)
    assert err < 2.0
    kps = C.keypoints_to_list(f1)
    back = C.list_to_keypoints(kps)
    assert back.capacity == len(kps)
