"""SIFT detector quality tests.

Keypoints are not required to be bit-identical to cv2.SIFT (different NMS
tie-breaks, single dominant orientation); parity is asserted functionally:
(a) keypoints repeat under a known homography warp, (b) descriptor matching
across the warp yields high GT-inlier rates comparable to cv2's SIFT on the
same images (the accuracy oracle of SURVEY §4).
"""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from tpu3drec.ops.sift import detect_sift_features
from tpu3drec.ops.match import match_features
from tpu3drec.api import detect_features, match_images


@pytest.fixture(scope="module")
def photo():
    """A structured synthetic 'photo' with corners/blobs at many scales."""
    rng = np.random.default_rng(11)
    h, w = 256, 320
    img = np.zeros((h, w), np.float32)
    # random rectangles and circles
    for _ in range(40):
        y, x = rng.integers(10, h - 30), rng.integers(10, w - 30)
        hh, ww = rng.integers(8, 60), rng.integers(8, 60)
        img[y:y + hh, x:x + ww] += rng.uniform(-0.4, 0.4)
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(15):
        cy, cx, r = rng.integers(20, h - 20), rng.integers(20, w - 20), rng.integers(4, 25)
        img += rng.uniform(-0.3, 0.3) * ((yy - cy) ** 2 + (xx - cx) ** 2 < r * r)
    img = cv2.GaussianBlur(img, (0, 0), 1.0)
    img += 0.02 * rng.standard_normal((h, w)).astype(np.float32)
    img -= img.min()
    img /= img.max()
    return img.astype(np.float32)


def warp_pair(img, angle_deg=10.0, scale=0.9, tx=8.0, ty=-5.0):
    h, w = img.shape
    M = cv2.getRotationMatrix2D((w / 2, h / 2), angle_deg, scale)
    M[0, 2] += tx
    M[1, 2] += ty
    warped = cv2.warpAffine(img, M, (w, h), flags=cv2.INTER_LINEAR)
    H = np.eye(3, dtype=np.float64)
    H[:2] = M
    return warped, H


def gt_inlier_rate(f1, f2, matches, H, tol=3.0):
    m = matches.to_numpy()
    if len(m["idx1"]) == 0:
        return 0.0, 0
    p1 = np.asarray(f1.xy)[m["idx1"]]
    p2 = np.asarray(f2.xy)[m["idx2"]]
    ph = np.concatenate([p1, np.ones((len(p1), 1))], 1) @ H.T
    proj = ph[:, :2] / ph[:, 2:3]
    ok = np.linalg.norm(proj - p2, axis=1) < tol
    return ok.mean(), len(ok)


def test_sift_detects_keypoints(photo):
    f = detect_sift_features(jnp.asarray(photo), max_features=1024)
    n = len(f)
    # cv2.SIFT finds ~130 on this image (with its default 2x upscale and
    # multi-orientation duplicates); we find ~95 without upscale, ~123 with
    assert n > 80
    xy = f.to_numpy()["xy"]
    h, w = photo.shape
    assert xy[:, 0].min() >= 0 and xy[:, 0].max() < w
    assert xy[:, 1].min() >= 0 and xy[:, 1].max() < h
    # descriptors are L2-normalized*512 and non-negative
    d = f.to_numpy()["desc"]
    norms = np.linalg.norm(d, axis=1)
    assert np.all(d >= 0)
    np.testing.assert_allclose(norms, 512.0, rtol=0.01)


def test_sift_matching_under_warp(photo):
    warped, H = warp_pair(photo)
    f1 = detect_sift_features(jnp.asarray(photo), max_features=1024)
    f2 = detect_sift_features(jnp.asarray(warped), max_features=1024)
    m = match_features(f1, f2, ratio=0.75)
    rate, n = gt_inlier_rate(f1, f2, m, H)
    assert n >= 50, f"too few matches: {n}"
    assert rate > 0.7, f"GT inlier rate too low: {rate:.2f} over {n}"


def test_sift_quality_comparable_to_cv2(photo):
    """Our SIFT's GT-verified match count within 2x of cv2.SIFT's."""
    warped, H = warp_pair(photo)
    u8 = (photo * 255).astype(np.uint8)
    w8 = (warped * 255).astype(np.uint8)
    sift = cv2.SIFT_create(nfeatures=1024)
    k1, d1 = sift.detectAndCompute(u8, None)
    k2, d2 = sift.detectAndCompute(w8, None)
    bf = cv2.BFMatcher(cv2.NORM_L2)
    good = [m for m, n in bf.knnMatch(d1, d2, k=2)
            if m.distance < 0.75 * n.distance]
    p1 = np.array([k1[m.queryIdx].pt for m in good])
    p2 = np.array([k2[m.trainIdx].pt for m in good])
    ph = np.concatenate([p1, np.ones((len(p1), 1))], 1) @ H.T
    proj = ph[:, :2] / ph[:, 2:3]
    cv2_verified = int((np.linalg.norm(proj - p2, axis=1) < 3.0).sum())

    f1 = detect_sift_features(jnp.asarray(photo), max_features=1024)
    f2 = detect_sift_features(jnp.asarray(warped), max_features=1024)
    m = match_features(f1, f2, ratio=0.75)
    rate, n = gt_inlier_rate(f1, f2, m, H)
    ours_verified = int(rate * n)
    assert ours_verified > cv2_verified * 0.5, \
        f"ours {ours_verified} vs cv2 {cv2_verified}"


def test_sift_cross_framework_descriptor_interop(photo):
    """tpu3drec SIFT descriptors must match against cv2.SIFT descriptors.

    The interchange claim (PARITY §2.4) means reference-produced pickles
    (cv2.SIFT via traditional_detectors.py:16-52) and tpu3drec features
    are mutually matchable. The native layout is cv2's [row, col, ori]
    with cv2's orientation-bin direction (sift._OBIN_REV); before that
    flip this exact pairing produced ZERO cross matches."""
    warped, H = warp_pair(photo)
    u8 = (photo * 255).astype(np.uint8)
    k1, d1 = cv2.SIFT_create(nfeatures=1024).detectAndCompute(u8, None)
    fn = detect_sift_features(jnp.asarray(warped), max_features=1024).to_numpy()
    bf = cv2.BFMatcher(cv2.NORM_L2)
    good = [m for m, n in bf.knnMatch(d1.astype(np.float32),
                                      fn["desc"].astype(np.float32), k=2)
            if m.distance < 0.8 * n.distance]
    assert len(good) >= 20, f"only {len(good)} cv2->tpu3drec matches"
    p1 = np.array([k1[m.queryIdx].pt for m in good], np.float64)
    p2 = np.array([fn["xy"][m.trainIdx] for m in good], np.float64)
    ph = np.concatenate([p1, np.ones((len(p1), 1))], 1) @ H.T
    proj = ph[:, :2] / ph[:, 2:3]
    rate = float((np.linalg.norm(proj - p2, axis=1) < 3.0).mean())
    assert rate > 0.6, f"cross-framework GT inlier rate {rate:.2f}"


def test_api_match_images_end_to_end(photo):
    warped, H = warp_pair(photo)
    r = match_images(photo, warped, method="SIFT", max_features=512)
    assert r.num_matches > 20
    assert r.inlier_ratio is not None and r.inlier_ratio > 0.5
    assert r.reprojection_error is not None and r.reprojection_error < 3.0
    # recovered homography close to GT on the central region
    corners = np.array([[80, 60], [240, 60], [240, 200], [80, 200]], np.float32)
    ch = np.concatenate([corners, np.ones((4, 1), np.float32)], 1)
    gt = ch @ H.T
    gt = gt[:, :2] / gt[:, 2:3]
    est = ch @ np.asarray(r.homography, dtype=np.float64).T
    est = est[:, :2] / est[:, 2:3]
    assert np.linalg.norm(gt - est, axis=1).max() < 3.0


def test_harris_detector_api(photo):
    f = detect_features(photo, method="Harris", max_features=300)
    assert len(f) > 50
    # corners should be at high-gradient locations
    assert f.desc.shape[1] == 128


def test_small_image_static_shape_contract():
    """Images with <3 octaves (short side < 64) must still honor the
    detector contract: capacity max_features, padded with mask=False
    (ADVICE r1: per-octave candidate budgets can sum below max_features)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (48, 48)).astype(np.float32)
    f = detect_sift_features(jnp.asarray(img), max_features=2048)
    assert f.xy.shape == (2048, 2)
    assert f.desc.shape == (2048, 128)
    assert f.mask.shape == (2048,)
    # padded rows are invalid
    n_valid = int(np.asarray(f.mask).sum())
    assert n_valid < 2048
