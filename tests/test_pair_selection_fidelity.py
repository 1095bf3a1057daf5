"""Pair-selection fidelity (VERDICT r2 #6): score-type-aware confidence
normalization, the standalone correspondence-validation gate, and
2D-3D-visibility next-view selection.

Reference behaviours mirrored: pair_selector.py:1110-1360
(_normalize_match_scores), essential_estimation.py:276-381
(validate_correspondences_for_monument), CPE/pipeline.py:1723-1984
(_select_best_next_image)."""

import numpy as np

from tpu3drec.sfm.pair_selector import (
    InitializationPairSelector, ScoringConfig,
    normalize_match_scores, validate_correspondences,
)
from tpu3drec.sfm.reconstruction import Camera, Reconstruction


# ---- score-type normalization ----------------------------------------

def test_normalize_distance_scores_invert_per_method():
    # small SIFT distances -> high confidence; near-ceiling -> low
    assert normalize_match_scores([50, 100], "distance", "SIFT") > 0.7
    assert normalize_match_scores([480, 500], "distance", "SIFT") < 0.1
    # Hamming for ORB uses the 256-bit ceiling
    lo = normalize_match_scores([20, 30], "distance", "ORB")
    hi = normalize_match_scores([200, 220], "distance", "ORB")
    assert lo > 0.85 > 0.3 > hi


def test_normalize_confidence_and_similarity():
    assert abs(normalize_match_scores([0.9, 0.7], "confidence",
                                      "lightglue") - 0.8) < 1e-9
    # NCC-style similarity in [-1, 1] shifts to [0, 1]
    assert abs(normalize_match_scores([-1.0, 1.0], "similarity", "ncc")
               - 0.5) < 1e-9
    # no scores -> neutral
    assert normalize_match_scores([], "distance", "SIFT") == 0.5


def test_confidence_comparable_across_matcher_families():
    """The raw-distance fallback made SIFT (distance ~100s) look worse
    than LightGlue (confidence ~0.x) regardless of quality; normalized
    scores are comparable."""
    sift = normalize_match_scores([80, 120, 100], "distance", "SIFT")
    lg = normalize_match_scores([0.8, 0.76, 0.84], "confidence",
                                "lightglue")
    assert 0.5 < sift < 1.0 and 0.5 < lg < 1.0


# ---- correspondence validation gate ----------------------------------

def test_validate_good_pair():
    rng = np.random.default_rng(0)
    p1 = rng.uniform((50, 50), (590, 430), (120, 2))
    p2 = p1 + np.array([40.0, 5.0]) + rng.normal(0, 2, (120, 2))
    v = validate_correspondences(p1, p2, (640, 480))
    assert v["valid"]
    assert v["quality_level"] in ("good", "excellent")
    assert "adequate_baseline" in v["statistics"]["quality_factors"]
    assert v["statistics"]["num_correspondences"] == 120


def test_validate_flags_small_baseline_and_coverage():
    rng = np.random.default_rng(1)
    # clustered points, ~2 px displacement
    p1 = rng.uniform((300, 220), (330, 250), (60, 2))
    p2 = p1 + rng.normal(0, 1.2, (60, 2))
    v = validate_correspondences(p1, p2, (640, 480))
    assert v["valid"]  # warnings, not structural failure
    assert any("baseline" in w for w in v["warnings"])
    assert any("coverage" in w for w in v["warnings"])
    assert v["quality_level"] == "poor"


def test_validate_structural_failures():
    v = validate_correspondences(np.zeros((5, 2)), np.zeros((4, 2)),
                                 (640, 480))
    assert not v["valid"] and v["errors"]
    v2 = validate_correspondences(np.zeros((5, 2)), np.zeros((5, 2)),
                                  (640, 480), min_points=30)
    assert not v2["valid"]


# ---- 2D-3D-visibility next-view selection ----------------------------

def _recon_two_cams():
    recon = Reconstruction()
    K = np.array([[700.0, 0, 320], [0, 700.0, 240], [0, 0, 1.0]])
    recon.add_camera(Camera("A.png", np.eye(3), np.zeros(3), K, (640, 480)))
    recon.add_camera(Camera("B.png", np.eye(3), np.array([1.0, 0, 0]), K,
                            (640, 480)))
    rng = np.random.default_rng(2)
    ids = recon.add_points_batch(rng.uniform(-2, 2, (300, 3)) + [0, 0, 8])
    # A observes the whole cloud; B observes almost nothing
    recon.add_observations_batch("A.png", ids,
                                 rng.uniform(0, 600, (300, 2)))
    recon.add_observations_batch("B.png", ids[:3],
                                 rng.uniform(0, 600, (3, 2)))
    return recon


def _corr(n, seed):
    rng = np.random.default_rng(seed)
    a = rng.uniform((20, 20), (620, 460), (n, 2))
    return np.concatenate([a, a + [30, 3]], axis=1)


def test_next_view_scoring_uses_3d_visibility():
    """X has MORE matches but only to B (3 triangulated observations);
    Y has fewer matches to A (300 observations). Match-count-only ranking
    picks X; the 3D-aware scorer must pick Y — the reference's choice,
    since X's matches cannot become PnP constraints."""
    recon = _recon_two_cams()
    matches_data = {
        ("X.png", "B.png"): {"correspondences": _corr(400, 3),
                             "num_matches": 400, "quality_score": 0.8},
        ("Y.png", "A.png"): {"correspondences": _corr(150, 4),
                             "num_matches": 150, "quality_score": 0.8},
    }
    sel = InitializationPairSelector(ScoringConfig())
    legacy = sel.rank_next_views(["X.png", "Y.png"], ["A.png", "B.png"],
                                 matches_data)
    aware = sel.rank_next_views(["X.png", "Y.png"], ["A.png", "B.png"],
                                matches_data, recon=recon)
    assert legacy[0][0] == "X.png"   # match count alone picks X
    assert aware[0][0] == "Y.png"    # 3D visibility picks Y
    # and Y's potential is what drove it
    assert aware[0][1] > aware[1][1] > 0


def test_next_view_unconnected_candidate_scores_zero():
    recon = _recon_two_cams()
    matches_data = {("Z.png", "Q.png"): {
        "correspondences": _corr(100, 5), "num_matches": 100}}
    sel = InitializationPairSelector()
    ranked = sel.rank_next_views(["Z.png"], ["A.png", "B.png"],
                                 matches_data, recon=recon)
    assert ranked[0][1] == 0.0
