"""Fused Pallas matching kernel: exactness vs the XLA 2-NN path.

Runs in interpreter mode on the CPU test backend; the same program
compiles natively on TPU (exercised by bench.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu3drec.ops.match import knn2
from tpu3drec.ops.pallas_match import fused_knn2, knn2_best


def test_fused_knn2_matches_xla():
    rng = np.random.default_rng(0)
    n, m, d = 256, 512, 128
    d1 = rng.normal(size=(n, d)).astype(np.float32)
    d2 = rng.normal(size=(m, d)).astype(np.float32)
    mask2 = np.ones(m, bool)
    mask2[100:140] = False

    ref_idx, ref_dist = knn2(jnp.asarray(d1), jnp.asarray(d2),
                             jnp.ones(n, bool), jnp.asarray(mask2))
    idx, v1, v2 = fused_knn2(jnp.asarray(d1), jnp.asarray(d2),
                             jnp.asarray(mask2),
                             block_n=128, block_m=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx)[:, 0])
    np.testing.assert_allclose(np.asarray(v1), np.asarray(ref_dist)[:, 0],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(ref_dist)[:, 1],
                               rtol=1e-4, atol=1e-4)


def test_fused_knn2_binary_descriptors():
    """+-1 descriptors: squared L2 = 2*(D - dot) = 4*hamming — same argmins."""
    rng = np.random.default_rng(1)
    n, m, d = 128, 128, 256
    bits1 = rng.integers(0, 2, (n, d)).astype(np.float32) * 2 - 1
    bits2 = rng.integers(0, 2, (m, d)).astype(np.float32) * 2 - 1
    ref_idx, _ = knn2(jnp.asarray(bits1), jnp.asarray(bits2),
                      jnp.ones(n, bool), jnp.ones(m, bool),
                      metric="hamming_pm1")
    idx, v1, v2 = fused_knn2(jnp.asarray(bits1), jnp.asarray(bits2),
                             jnp.ones(m, bool),
                             block_n=128, block_m=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx)[:, 0])


def test_knn2_best_pads_arbitrary_sizes():
    rng = np.random.default_rng(2)
    n, m, d = 300, 777, 64
    d1 = rng.normal(size=(n, d)).astype(np.float32)
    d2 = rng.normal(size=(m, d)).astype(np.float32)
    mask2 = np.ones(m, bool)
    ref_idx, ref_dist = knn2(jnp.asarray(d1), jnp.asarray(d2),
                             jnp.ones(n, bool), jnp.asarray(mask2))
    idx, v1, v2 = knn2_best(jnp.asarray(d1), jnp.asarray(d2),
                            jnp.ones(n, bool), jnp.asarray(mask2),
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx)[:, 0])
    np.testing.assert_allclose(np.asarray(v1), np.asarray(ref_dist)[:, 0],
                               rtol=1e-4, atol=1e-4)
