"""BRISK + AKAZE functional tests (matching quality under known warps)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu3drec.ops.brisk import detect_brisk_features
from tpu3drec.ops.akaze import detect_akaze_features
from tpu3drec.ops.match import match_features
from tests.test_sift import photo, warp_pair, gt_inlier_rate  # noqa: F401


def test_brisk_detects(photo):
    f = detect_brisk_features(jnp.asarray(photo), max_features=512)
    assert len(f) > 80
    d = f.to_numpy()["desc"]
    assert d.shape[1] == 512
    assert set(np.unique(d)) <= {-1.0, 1.0}


def test_brisk_matching_under_warp(photo):
    warped, H = warp_pair(photo, angle_deg=12.0, scale=0.95)
    f1 = detect_brisk_features(jnp.asarray(photo), max_features=1024)
    f2 = detect_brisk_features(jnp.asarray(warped), max_features=1024)
    m = match_features(f1, f2, ratio=0.85)
    rate, n = gt_inlier_rate(f1, f2, m, H, tol=4.0)
    assert n >= 30, f"too few matches: {n}"
    assert rate > 0.5, f"GT inlier rate {rate:.2f} over {n}"


def test_akaze_detects(photo):
    f = detect_akaze_features(jnp.asarray(photo), max_features=512)
    assert len(f) > 60
    d = f.to_numpy()["desc"]
    assert d.shape[1] == 486
    assert set(np.unique(d)) <= {-1.0, 1.0}


def test_akaze_matching_under_warp(photo):
    warped, H = warp_pair(photo, angle_deg=10.0, scale=0.95)
    f1 = detect_akaze_features(jnp.asarray(photo), max_features=1024)
    f2 = detect_akaze_features(jnp.asarray(warped), max_features=1024)
    m = match_features(f1, f2, ratio=0.85)
    rate, n = gt_inlier_rate(f1, f2, m, H, tol=4.0)
    assert n >= 30, f"too few matches: {n}"
    assert rate > 0.5, f"GT inlier rate {rate:.2f} over {n}"


def test_akaze_brisk_api(photo):
    from tpu3drec.api import detect_features
    for method, dim in (("AKAZE", 486), ("BRISK", 512)):
        f = detect_features(photo, method, max_features=256)
        assert len(f) > 30, method
        assert f.desc.shape[1] == dim
        assert f.desc_kind == "binary"
