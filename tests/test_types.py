"""Core data model tests: Features/Matches pytrees, ScoreType algebra,
quality-score formula parity with the reference (result_types.py:102-118)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3drec.core.types import (
    Features, Matches, ScoreType, MethodResult, MatchingResult,
)


def make_features(n_valid=5, cap=8, d=4, method="SIFT"):
    xy = np.arange(n_valid * 2, dtype=np.float32).reshape(n_valid, 2)
    desc = np.random.default_rng(0).normal(size=(n_valid, d)).astype(np.float32)
    return Features.from_numpy(xy, desc, capacity=cap, method=method)


def test_features_padding_and_mask():
    f = make_features(5, cap=8)
    assert f.capacity == 8
    assert len(f) == 5
    assert bool(jnp.all(f.mask[:5])) and not bool(jnp.any(f.mask[5:]))
    dense = f.to_numpy()
    assert dense["xy"].shape == (5, 2)


def test_features_is_pytree():
    f = make_features()
    leaves = jax.tree.leaves(f)
    assert all(hasattr(l, "shape") for l in leaves)
    # static fields don't become leaves
    f2 = jax.tree.map(lambda a: a, f)
    assert f2.method == "SIFT"


def test_features_top_k():
    f = make_features(6, cap=8)
    f = f.replace(response=jnp.array([1., 5., 3., 2., 4., 6., 0., 0.]))
    t = f.top_k(3)
    assert len(t) == 3
    got = np.sort(np.asarray(t.response)[np.asarray(t.mask)])
    np.testing.assert_allclose(got, [4., 5., 6.])


def test_matches_score_algebra():
    m = Matches(idx1=jnp.arange(4), idx2=jnp.arange(4),
                score=jnp.array([0.1, 0.5, 0.9, 2.0]),
                mask=jnp.ones(4, bool),
                score_type=ScoreType.DISTANCE.value)
    # distance -> quality = 1 - min(score, 1) (core_data_structures.py:96-101)
    np.testing.assert_allclose(np.asarray(m.quality()), [0.9, 0.5, 0.1, 0.0],
                               atol=1e-6)
    c = m.replace(score_type=ScoreType.CONFIDENCE.value)
    # confidence -> distance = 1 - score (core_data_structures.py:77-86)
    np.testing.assert_allclose(np.asarray(c.as_distance()),
                               [0.9, 0.5, 0.1, -1.0], atol=1e-6)


def test_matches_filter_and_topk():
    m = Matches(idx1=jnp.arange(4), idx2=jnp.arange(4),
                score=jnp.array([0.1, 0.5, 0.9, 0.3]),
                mask=jnp.array([True, True, True, False]),
                score_type=ScoreType.DISTANCE.value)
    f = m.filter_by_score(0.5)
    assert len(f) == 2  # 0.1 and 0.5 pass; 0.3 was masked out already
    t = m.top_k(2)
    np.testing.assert_allclose(np.sort(t.to_numpy()["score"]), [0.1, 0.5])


def test_method_result_quality_formula():
    """Exact formula: 0.4*min(n/500,1) + 0.4*inlier + 0.2*max(0,1-err/10)."""
    f = make_features(5, cap=8)
    m = Matches(idx1=jnp.arange(8), idx2=jnp.arange(8),
                score=jnp.zeros(8), mask=jnp.ones(8, bool))
    r = MethodResult(method="SIFT", features1=f, features2=f, matches=m,
                     inlier_ratio=0.5, reprojection_error=2.0)
    expected = 0.4 * min(8 / 500, 1.0) + 0.4 * 0.5 + 0.2 * (1 - 2.0 / 10)
    assert abs(r.get_quality_score() - expected) < 1e-9


def test_matching_result_ranking():
    f = make_features()
    def mk(n_matches, inlier):
        m = Matches(idx1=jnp.arange(16), idx2=jnp.arange(16),
                    score=jnp.zeros(16),
                    mask=jnp.arange(16) < n_matches)
        return MethodResult(method="x", features1=f, features2=f,
                            matches=m, inlier_ratio=inlier)
    res = MatchingResult(results={"SIFT": mk(10, 0.9), "ORB": mk(16, 0.2)})
    assert res.get_best_method_name() == "SIFT"
    assert "ORB" in res
    assert res.summary()["best_method"] == "SIFT"
