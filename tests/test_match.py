"""Matcher parity tests vs cv2.BFMatcher (L2 and Hamming) and ratio-test
semantics (reference feature_matchers.py:129-252)."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from tpu3drec.core.types import Features, DescriptorKind, ScoreType
from tpu3drec.ops.match import (
    distance_matrix, knn2, match_features, match_descriptors,
    auto_select_matcher,
)


@pytest.fixture(scope="module")
def float_descs(rng=None):
    r = np.random.default_rng(7)
    d1 = r.normal(size=(100, 128)).astype(np.float32)
    # make half of d2 near-copies of d1 rows so ratio test passes for them
    d2 = r.normal(size=(120, 128)).astype(np.float32)
    d2[:50] = d1[:50] + 0.01 * r.normal(size=(50, 128)).astype(np.float32)
    return d1, d2


def test_l2_distance_matrix_matches_numpy(float_descs):
    d1, d2 = float_descs
    ours = np.asarray(distance_matrix(jnp.asarray(d1), jnp.asarray(d2)))
    ref = np.linalg.norm(d1[:, None] - d2[None, :], axis=2)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_knn2_matches_cv2(float_descs):
    d1, d2 = float_descs
    bf = cv2.BFMatcher(cv2.NORM_L2)
    ref = bf.knnMatch(d1, d2, k=2)
    idx, dist = knn2(jnp.asarray(d1), jnp.asarray(d2),
                     jnp.ones(100, bool), jnp.ones(120, bool))
    idx, dist = np.asarray(idx), np.asarray(dist)
    for i, (m1, m2) in enumerate(ref):
        assert idx[i, 0] == m1.trainIdx
        assert abs(dist[i, 0] - m1.distance) < 1e-2
        assert idx[i, 1] == m2.trainIdx


def test_ratio_test_matches_cv2(float_descs):
    d1, d2 = float_descs
    bf = cv2.BFMatcher(cv2.NORM_L2)
    ref_pairs = {(m1.queryIdx, m1.trainIdx)
                 for m1, m2 in bf.knnMatch(d1, d2, k=2)
                 if m1.distance < 0.75 * m2.distance}
    m = match_descriptors(d1, d2, ratio=0.75)
    got = m.to_numpy()
    got_pairs = set(zip(got["idx1"].tolist(), got["idx2"].tolist()))
    assert got_pairs == ref_pairs
    assert len(got_pairs) >= 50  # the planted near-copies all match


def test_hamming_matching_matches_cv2():
    r = np.random.default_rng(3)
    bits1 = r.integers(0, 2, size=(64, 256)).astype(np.uint8)
    bits2 = bits1.copy()
    flip = r.random(bits2.shape) < 0.02  # flip 2% of bits
    bits2 = bits2 ^ flip.astype(np.uint8)

    ours = np.asarray(distance_matrix(
        jnp.asarray(bits1 * 2.0 - 1.0), jnp.asarray(bits2 * 2.0 - 1.0),
        metric="hamming_pm1"))
    packed1 = np.packbits(bits1, axis=1)
    packed2 = np.packbits(bits2, axis=1)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING)
    ref = bf.knnMatch(packed1, packed2, k=1)
    for i, (m,) in enumerate(ref):
        assert ours[i].argmin() == m.trainIdx
        assert abs(ours[i].min() - m.distance) < 0.5


def test_masked_columns_never_win(float_descs):
    d1, d2 = float_descs
    mask2 = np.ones(120, bool)
    mask2[:50] = False  # mask out the planted near-copies
    idx, dist = knn2(jnp.asarray(d1), jnp.asarray(d2),
                     jnp.ones(100, bool), jnp.asarray(mask2))
    assert np.all(np.asarray(idx) >= 50)


def test_cross_check():
    r = np.random.default_rng(5)
    d1 = r.normal(size=(32, 64)).astype(np.float32)
    d2 = np.roll(d1, 1, axis=0) + 0.001 * r.normal(size=(32, 64)).astype(np.float32)
    m = match_descriptors(d1, d2, ratio=1.0, cross_check=True)
    got = m.to_numpy()
    # perfect cyclic correspondence i -> i+1
    np.testing.assert_array_equal(got["idx2"], (got["idx1"] + 1) % 32)
    assert len(got["idx1"]) == 32


def test_match_features_respects_padding():
    f1 = Features.from_numpy(np.zeros((10, 2)),
                             np.random.default_rng(0).normal(size=(10, 16)),
                             capacity=16)
    f2 = Features.from_numpy(np.zeros((8, 2)),
                             np.random.default_rng(1).normal(size=(8, 16)),
                             capacity=16)
    m = match_features(f1, f2, ratio=1.0)
    got = m.to_numpy()
    assert np.all(got["idx1"] < 10) and np.all(got["idx2"] < 8)
    assert m.score_type == ScoreType.DISTANCE.value


def test_auto_select_matcher():
    f_bin = Features.empty(4, 256, desc_kind=DescriptorKind.BINARY.value)
    f_float = Features.empty(4, 128)
    assert auto_select_matcher(f_bin) == "bf"
    assert auto_select_matcher(f_float) == "flann"
