"""DISK + ALIKED functional tests at random init (zero-egress env)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu3drec.models.disk import DISK, DISKNet
from tpu3drec.models.aliked import ALIKED


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0)
    x = np.zeros((96, 128), np.float32)
    for _ in range(25):
        y, xx = rng.integers(5, 80), rng.integers(5, 110)
        x[y:y + 10, xx:xx + 10] += rng.uniform(-0.5, 0.5)
    x -= x.min()
    return (x / max(x.max(), 1e-6)).astype(np.float32)


def test_disk_extract(img):
    dk = DISK(max_features=128, threshold=-1e9)
    dk.init_random((96, 128))
    f = dk.extract(jnp.asarray(img))
    assert f.capacity == 128
    assert f.desc.shape == (128, 128)
    m = np.asarray(f.mask)
    assert m.any()
    norms = np.linalg.norm(np.asarray(f.desc)[m], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    xy = np.asarray(f.xy)[m]
    assert (xy[:, 0] < 128).all() and (xy[:, 1] < 96).all()


def test_disk_net_output_resolution():
    import jax
    net = DISKNet()
    p = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    heat, desc = net.apply(p, jnp.zeros((1, 64, 64, 3)))
    assert heat.shape == (1, 64, 64)
    assert desc.shape == (1, 64, 64, 128)


def test_aliked_extract_subpixel(img):
    al = ALIKED(max_features=128, threshold=-1e9)
    al.init_random((96, 128))
    f = al.extract(jnp.asarray(img))
    m = np.asarray(f.mask)
    assert m.any()
    xy = np.asarray(f.xy)[m]
    # sub-pixel refinement: offsets are fractional but bounded by 0.5
    frac = np.abs(xy - np.round(xy))
    assert (frac <= 0.5 + 1e-6).all()
    assert f.method == "ALIKED"


def test_deep_detectors_gated_without_weights():
    """Without converted weights the registry must not expose them."""
    from tpu3drec.api import _get_detector_registry
    from tpu3drec.models import weights_available
    reg = _get_detector_registry()
    for name in ("SuperPoint", "DISK", "ALIKED"):
        assert (name in reg) == weights_available(name.lower())
