"""Device-mesh construction for data/tensor-parallel pair processing.

The reference has no parallelism at all (SURVEY §2.7: a serial pair loop,
FME/pipeline.py:538-678); this module provides its TPU-native counterpart:
a `jax.sharding.Mesh` with a data axis (image pairs) and a model axis
(descriptor/tensor sharding), over which pipelines `shard_map` their work.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"
MODEL_AXIS = "tp"


def default_mesh_shape(n_devices: int) -> Tuple[int, int]:
    """(dp, tp) factorization: favour data parallelism, keep tp a small
    power of two (descriptor matching saturates ICI quickly beyond tp=4)."""
    if n_devices % 2 != 0 or n_devices < 4:
        return (n_devices, 1)
    tp = 2
    if n_devices % 4 == 0 and n_devices >= 8:
        tp = 2
    return (n_devices // tp, tp)


def make_mesh(devices: Optional[Sequence] = None,
              shape: Optional[Tuple[int, int]] = None) -> Mesh:
    """Build a (dp, tp) mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    dp, tp = shape if shape is not None else default_mesh_shape(n)
    if dp * tp != n:
        raise ValueError(f"mesh shape {dp}x{tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a (B, ...) pair batch: B split along the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
