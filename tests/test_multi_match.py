"""Multi-method match merging tests (offset bookkeeping + dedup,
reference core_data_structures.py:209-324)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu3drec.core.types import Features, Matches, MethodResult, ScoreType
from tpu3drec.core.multi_match import concat_features, merge_method_matches


def mk_result(method, n=8, cap=8, shift=0.0, score_type=ScoreType.DISTANCE):
    rng = np.random.default_rng(hash(method) % 2**31)
    xy = rng.uniform(10, 100, (n, 2)) + shift
    f1 = Features.from_numpy(xy, rng.normal(size=(n, 16)), capacity=cap,
                             method=method)
    f2 = Features.from_numpy(xy + 2.0, rng.normal(size=(n, 16)),
                             capacity=cap, method=method)
    m = Matches(idx1=jnp.arange(cap, dtype=jnp.int32),
                idx2=jnp.arange(cap, dtype=jnp.int32),
                score=jnp.full(cap, 0.3 if score_type == ScoreType.DISTANCE
                               else 0.7),
                mask=jnp.arange(cap) < n,
                score_type=score_type.value, method=method)
    return MethodResult(method=method, features1=f1, features2=f2,
                        matches=m, inlier_ratio=0.8)


def test_concat_offsets():
    r1, r2 = mk_result("A", cap=8), mk_result("B", cap=16)
    xy, offs = concat_features([r1.features1, r2.features1])
    assert xy.shape == (24, 2)
    assert offs == [0, 8]


def test_merge_offsets_and_scores():
    results = {"SIFT": mk_result("SIFT", shift=0.0),
               "ORB": mk_result("ORB", shift=500.0,
                                score_type=ScoreType.CONFIDENCE)}
    merged = merge_method_matches(results)
    assert merged["methods"] == ["SIFT", "ORB"]
    # ORB indices are shifted by SIFT's capacity
    orb_rows = merged["method_of"] == 1
    assert merged["idx1"][orb_rows].min() >= 8
    # indices address the concatenated coordinate arrays consistently
    p1 = merged["xy1_all"][merged["idx1"]]
    np.testing.assert_allclose(p1, merged["correspondences"][:, :2])
    # mixed score types both map into (0, 1] quality
    assert (merged["quality"] > 0).all() and (merged["quality"] <= 1.0).all()
    assert merged["per_method_counts"] == {"SIFT": 8, "ORB": 8}


def test_merge_dedups_cross_method():
    # two "methods" producing the SAME correspondences -> dedup to one set
    base = mk_result("A")
    dup = mk_result("B")
    dup.features1 = base.features1.replace(method="B")
    dup.features2 = base.features2.replace(method="B")
    merged = merge_method_matches({"A": base, "B": dup})
    assert len(merged["idx1"]) == 8  # not 16


def test_merge_empty_methods():
    r = mk_result("A")
    empty = mk_result("B")
    empty.matches = empty.matches.replace(mask=jnp.zeros(8, bool))
    empty.filtered_matches = None
    merged = merge_method_matches({"A": r, "B": empty})
    assert (merged["method_of"] == 0).all()
