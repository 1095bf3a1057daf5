"""Test configuration: run everything on CPU with 8 virtual devices.

Per the build environment contract, sharding/multi-chip tests must work
without real TPU hardware: we force the CPU platform and split it into 8
virtual devices so `jax.sharding.Mesh` tests exercise real collectives.
Must run before jax initializes its backends — hence env vars set on import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin (sitecustomize in this image) re-registers itself and
# overrides jax_platforms after env vars are read — force CPU explicitly
# before any backend is initialized.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

import gc

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_mmap_count():
    """Keep the process under vm.max_map_count (65530 here).

    Every XLA:CPU JIT-compiled executable pins several mmap regions for
    the lifetime of JAX's C++ executable caches; a full-suite run
    accumulates them at ~3-4k maps/min (measured) until the next
    compile's mmap fails and XLA SEGFAULTS inside
    backend_compile_and_load — which is exactly how every full-suite
    run on this VM died (~40 min in, around the 184th test, regardless
    of which module happened to be there). Dropping the caches at
    module boundaries bounds the map count; the persistent compile
    cache (tpu3drec/__init__) makes the resulting recompiles cheap
    disk reloads."""
    yield
    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def _checkerboard(h, w, tile=16):
    yy, xx = np.mgrid[0:h, 0:w]
    return (((yy // tile) + (xx // tile)) % 2).astype(np.float32)


@pytest.fixture(scope="session")
def test_image():
    """Deterministic structured grayscale test image (no files needed)."""
    rng = np.random.default_rng(0)
    h, w = 240, 320
    img = 0.3 * _checkerboard(h, w)
    yy, xx = np.mgrid[0:h, 0:w]
    img += 0.4 * np.exp(-(((yy - 120) / 60.0) ** 2 + ((xx - 160) / 80.0) ** 2))
    img += 0.15 * np.sin(xx / 7.0) * np.cos(yy / 11.0)
    img += 0.05 * rng.standard_normal((h, w))
    img = np.clip(img, 0, 1).astype(np.float32)
    return img
