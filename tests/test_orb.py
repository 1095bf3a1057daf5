"""FAST + ORB functional tests: corner detection correctness and
matching quality under known warps (reference traditional_detectors.py)."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from tpu3drec.ops.fast import fast_score_map, detect_fast
from tpu3drec.ops.orb import detect_orb_features
from tpu3drec.ops.match import match_features
from tests.test_sift import photo, warp_pair, gt_inlier_rate  # noqa: F401


def test_fast_detects_synthetic_corner():
    img = np.zeros((32, 32), np.float32)
    img[12:, 12:] = 1.0  # one sharp corner at (12, 12)
    score = np.asarray(fast_score_map(jnp.asarray(img), 0.1))
    ys, xs = np.unravel_index(score.argmax(), score.shape)
    assert abs(ys - 12) <= 2 and abs(xs - 12) <= 2
    # flat regions have zero score
    assert score[:8, :8].max() == 0.0 and score[20:, 20:].max() == 0.0


def test_fast_overlaps_cv2(photo):
    u8 = (photo * 255).astype(np.uint8)
    fast = cv2.FastFeatureDetector_create(threshold=20)
    ref = {(int(k.pt[0]), int(k.pt[1])) for k in fast.detect(u8)}
    xy, score, mask = detect_fast(jnp.asarray(photo), 512, 20.0 / 255.0)
    ours = np.asarray(xy)[np.asarray(mask)]
    # most of our corners lie within 2px of a cv2 FAST corner
    ref_arr = np.array(sorted(ref)) if ref else np.zeros((0, 2))
    d = np.abs(ours[:, None] - ref_arr[None]).max(axis=2).min(axis=1)
    assert (d <= 2).mean() > 0.8, f"only {(d <= 2).mean():.0%} near cv2 corners"


def test_orb_detects_and_describes(photo):
    f = detect_orb_features(jnp.asarray(photo), max_features=512)
    assert len(f) > 100
    d = f.to_numpy()["desc"]
    assert d.shape[1] == 256
    assert set(np.unique(d)) <= {-1.0, 1.0}
    assert f.desc_kind == "binary"


def test_orb_matching_under_warp(photo):
    warped, H = warp_pair(photo, angle_deg=15.0, scale=0.9)
    f1 = detect_orb_features(jnp.asarray(photo), max_features=1024)
    f2 = detect_orb_features(jnp.asarray(warped), max_features=1024)
    m = match_features(f1, f2, ratio=0.85)
    rate, n = gt_inlier_rate(f1, f2, m, H, tol=4.0)
    assert n >= 40, f"too few matches: {n}"
    assert rate > 0.5, f"GT inlier rate {rate:.2f} over {n}"


def test_orb_descriptor_rotation_invariance(photo):
    """Pure rotation: steered BRIEF must keep matching."""
    warped, H = warp_pair(photo, angle_deg=40.0, scale=1.0, tx=0, ty=0)
    f1 = detect_orb_features(jnp.asarray(photo), max_features=1024)
    f2 = detect_orb_features(jnp.asarray(warped), max_features=1024)
    m = match_features(f1, f2, ratio=0.85)
    rate, n = gt_inlier_rate(f1, f2, m, H, tol=4.0)
    assert n >= 30 and rate > 0.4, f"rotation: rate {rate:.2f} over {n}"


def test_orb_api_entry(photo):
    from tpu3drec.api import detect_features, match_images
    f = detect_features(photo, "ORB", max_features=256)
    assert len(f) > 50
    warped, H = warp_pair(photo)
    r = match_images(photo, warped, method="ORB", max_features=512)
    assert r.num_matches > 20
    assert r.inlier_ratio is None or r.inlier_ratio > 0.3


def test_orb_max_features_exceeds_pyramid_budget():
    """max_features above the summed per-level budgets must not fail at
    trace time; arrays stay at static capacity with padded mask=False
    rows (same contract as the SIFT fix, ADVICE r1)."""
    import numpy as np
    import jax.numpy as jnp
    from tpu3drec.ops.orb import detect_orb_features

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (240, 320)).astype(np.float32)
    feats = detect_orb_features(jnp.asarray(img), max_features=2000)
    assert feats.xy.shape[0] == 2000 and feats.mask.shape[0] == 2000
    assert int(feats.mask.sum()) > 0


def test_gftt_alias_registered():
    from tpu3drec.api import _get_detector_registry
    reg = _get_detector_registry()
    assert "GFTT" in reg and "GoodFeatures" in reg


def test_opencv_pattern_descriptors_interoperate_with_cv2(photo):
    """Cross-framework descriptor interop (VERDICT r2 #8): tpu3drec ORB
    with pattern="opencv" and cv2 ORB describe SHARED keypoints (same
    xy + angle); matching our descriptors against cv2's (unpacked to the
    +-1 layout) must recover the identity mapping for most keypoints —
    i.e. descriptors pickled by either framework feed the other's
    matcher. The embedded pattern itself is the table recovered from
    cv2 (ops/_orb_pattern_cv.py documents the probing procedure)."""
    from tpu3drec.ops.orb import unpack_cv2_orb

    f = detect_orb_features(jnp.asarray(photo), max_features=512,
                            pattern="opencv")
    xy = np.asarray(f.xy)
    ang = np.asarray(f.angle)
    scl = np.asarray(f.scale)
    mask = np.asarray(f.mask)
    ours = np.asarray(f.desc)
    h, w = photo.shape
    # level-0 keypoints away from borders (cv2.compute drops/re-octaves
    # others); our level-0 scale is 31.0
    sel = np.nonzero(mask & (np.abs(scl - 31.0) < 1e-3)
                     & (xy[:, 0] > 40) & (xy[:, 0] < w - 40)
                     & (xy[:, 1] > 40) & (xy[:, 1] < h - 40))[0]
    assert len(sel) >= 40, len(sel)
    sel = sel[:120]

    u8 = (photo * 255).astype(np.uint8)
    kps = []
    for i in sel:
        kp = cv2.KeyPoint(float(xy[i, 0]), float(xy[i, 1]), 31.0)
        kp.angle = float(np.degrees(ang[i]) % 360.0)
        kp.octave = 0
        kps.append(kp)
    orb = cv2.ORB_create()
    kps_out, d_cv = orb.compute(u8, kps)
    assert d_cv is not None and len(kps_out) >= 0.9 * len(sel)
    # map surviving cv2 keypoints back to our indices by position
    pos = {(round(k.pt[0], 2), round(k.pt[1], 2)): j
           for j, k in enumerate(kps_out)}
    keep = [(i, pos[(round(float(xy[i, 0]), 2), round(float(xy[i, 1]), 2))])
            for i in sel
            if (round(float(xy[i, 0]), 2), round(float(xy[i, 1]), 2)) in pos]
    ours_d = np.stack([ours[i] for i, _ in keep])        # (M, 256) +-1
    cv_d = unpack_cv2_orb(d_cv[[j for _, j in keep]])    # (M, 256) +-1

    # per-keypoint bit agreement must be far above chance (128/256)
    agree = (ours_d * cv_d > 0).mean(axis=1)
    assert np.median(agree) > 0.75, float(np.median(agree))

    # mutual-nearest Hamming matching recovers the identity mapping
    sim = ours_d @ cv_d.T                                # higher = closer
    fwd = sim.argmax(axis=1)
    bwd = sim.argmax(axis=0)
    ident = np.mean([fwd[k] == k and bwd[k] == k
                     for k in range(len(keep))])
    assert ident > 0.6, float(ident)
