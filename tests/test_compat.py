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
    # serialized dicts use the reference's cv2.KeyPoint convention
    # (core_data_structures.py:176-189): angle in DEGREES [0, 360);
    # deserialization restores this framework's radians exactly
    assert all(0.0 <= d["angle"] < 360.0 for d in kps)
    import numpy as _np
    ours = _np.asarray(f1.to_numpy()["angle"])
    rt = _np.asarray(back.to_numpy()["angle"])
    dd = _np.abs(((ours - rt) + _np.pi) % (2 * _np.pi) - _np.pi)
    assert float(dd.max()) < 1e-5


def test_cpe_dense_class_surface():
    """CPE/DR class names a reference user reaches for exist and work."""
    import numpy as np
    import tpu3drec.compat as C

    for n in ("MainPosePipeline", "StereoMatcher", "PointCloudProcessor",
              "MeshGenerator", "Reconstruction", "Camera", "SfMConfig",
              "reconstruct_scene", "assess_reconstruction_quality",
              "DenseReconstructionPipeline", "run_dense_reconstruction",
              "InitializationPairSelector"):
        assert hasattr(C, n), n

    mg = C.MeshGenerator()
    rng = np.random.default_rng(0)
    v = rng.normal(size=(500, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    mesh = mg.create_mesh_poisson(v.astype(np.float32),
                                  v.astype(np.float32), resolution=36)
    assert len(mesh[1]) > 100
    q = mg.analyze_mesh_quality(mesh)
    assert q["num_faces"] == len(mesh[1])
    assert mg.compare_meshes(mesh, mesh)["surface_area"]["ratio"] == 1.0
    sm = mg.smooth_mesh(mesh, iterations=1)
    assert len(sm[0]) == len(mesh[0])

    pcp = C.PointCloudProcessor()
    depth = np.full((32, 32), 5.0, np.float32)
    K = np.array([[30.0, 0, 16], [0, 30.0, 16], [0, 0, 1]], np.float32)
    pts, _ = pcp.depth_map_to_point_cloud(depth, K)
    assert len(pts) > 500
    nrm = pcp.estimate_normals(pts[:256], k=8)
    assert nrm.shape == (256, 3)

    pipe = C.MainPosePipeline(use_iterative_refinement=True)
    assert pipe.config.use_iterative_refinement


def test_reference_all_exports_covered():
    """Every name in the reference package's __all__
    (FME/__init__.py:207-302, incl. the deep-learning extension) exists
    in tpu3drec.compat."""
    import tpu3drec.compat as C

    names = [
        'FeatureProcessingPipeline', 'create_pipeline',
        'MatchingResult', 'MethodResult', 'ImagePairInfo',
        'ProcessingMetadata', 'save_for_reconstruction',
        'load_for_reconstruction', 'save_results_batch',
        'load_results_batch', 'export_summary_csv',
        'VisualizationData', 'ReconstructionData',
        'MethodReconstructionData', 'ResultConverter', 'VisualMatch',
        'FeatureData', 'MatchData', 'EnhancedDMatch', 'ScoreType',
        'MultiMethodFeatureData', 'MultiMethodMatchData',
        'ImageMetadata', 'ImageInfo', 'ImageSourceType', 'ImageCache',
        'BatchImageLoader', 'FolderImageSource',
        'create_pairs_from_metadata', 'analyze_batch_reuse',
        'estimate_batch_memory', 'scan_folder_quick', 'BatchProcessor',
        'load_progress', 'delete_progress', 'get_remaining_pairs',
        'SIFTDetector', 'ORBDetector', 'AKAZEDetector', 'BRISKDetector',
        'MultiMethodFeatureDetector', 'EnhancedBFMatcher',
        'EnhancedFLANNMatcher', 'auto_select_matcher', 'MatcherFactory',
        'plot_visualization_data', 'plot_method_comparison',
        'visualize_matches_quick', 'show_matches',
        'visualize_matches_with_scores', 'save_visualization',
        'visualize_keypoints_only', 'get_default_config',
        'create_config_from_preset', 'validate_size',
        'image_size_from_shape', 'resize_image', 'print_size_info',
        'enhanced_filter_matches_with_homography',
        'adaptive_match_filtering', 'calculate_reprojection_error',
        'keypoint_to_dict', 'dict_to_keypoint', 'keypoints_to_list',
        'list_to_keypoints', 'SuperPointDetector', 'ALIKEDDetector',
        'DISKDetector', 'get_version', 'get_available_methods',
        'check_dependencies',
    ]
    missing = [n for n in names if not hasattr(C, n)]
    assert not missing, missing

    assert C.get_available_methods()["traditional"]["GFTT"]
    assert C.check_dependencies()["jax"]
    assert C.validate_size(np.zeros((100, 100)))
    assert not C.validate_size(np.zeros((4, 4)))
    assert C.image_size_from_shape((480, 640)) == (640, 480)
    small = C.resize_image(np.zeros((2048, 1024), np.float32), 512)
    assert max(small.shape) == 512
    d = C.EnhancedDMatch(0, 1, 100.0, "distance")
    assert 0 < d.as_confidence() < 1
