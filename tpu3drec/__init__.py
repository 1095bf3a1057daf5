"""tpu3drec — a TPU-native 3D reconstruction framework (JAX/XLA/Pallas).

A ground-up rebuild of the capabilities of the reference SfM framework
(Tarboucha/3DReconstruction): multi-method feature detection and matching,
incremental structure-from-motion (essential-matrix RANSAC, pose recovery,
triangulation, PnP, bundle adjustment), and dense reconstruction (plane-sweep
stereo, point clouds, meshing) — re-designed TPU-first:

- fixed-shape, mask-padded array pytrees instead of variable-length
  ``List[cv2.KeyPoint]`` (reference: FeatureMatchingExtraction/core_data_structures.py)
- pure jit-able ops (Pallas kernels for the hot paths) instead of OpenCV calls
- ``vmap`` over image pairs within a chip, ``shard_map`` over a device mesh
  across chips, instead of the reference's serial pair loop
  (reference: FeatureMatchingExtraction/pipeline.py:538-678)

Public API mirrors the reference's surface
(FeatureMatchingExtraction/__init__.py:39-302): ``create_pipeline``,
``quick_match``, ``detect_features``, ``match_images``, plus the SfM entry
``reconstruct_scene`` and dense entry ``run_dense_reconstruction``.
"""

__version__ = "0.1.0"

import jax as _jax

# TPU matmuls/convs default to bfloat16 passes, which silently degrades
# the float32 geometry solvers (observed: 1.3px vs 0.24px reprojection on
# identical inputs). Geometry correctness is the product here, so f32
# inputs run at full precision by default; bandwidth-bound kernels that
# want bf16 opt in with explicit dtypes or per-op precision.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the SfM/matching pipelines jit one program
# per padded bucket size, and TPU compiles here go through a remote
# tunnel (minutes for the big programs). Verified effective on this
# backend. Opt out with TPU3DREC_NO_COMPILE_CACHE=1.
import os as _os

if not _os.environ.get("TPU3DREC_NO_COMPILE_CACHE"):
    # Enabled for EVERY backend (CPU included — the test suite and CPU
    # users benefit, and jax.clear_caches() calls stay cheap reloads).
    # The cache dir is namespaced by a HOST CPU fingerprint: XLA:CPU AOT
    # cache entries embed machine features (avx512/amx/...) of the host
    # that compiled them, and loading them on a different host is a
    # silent SIGILL/segfault (observed: every full-suite run crashed in
    # backend_compile_and_load once the build VM changed — the
    # env-var-based "cpu excluded" gate did not fire because the test
    # conftest switches platform AFTER import while sitecustomize holds
    # JAX_PLATFORMS at the TPU backend). A host change now lands in a
    # fresh empty subdir instead of reading foreign executables.
    import hashlib as _hashlib
    import platform as _platform
    try:
        with open("/proc/cpuinfo") as _f:
            # x86 says 'flags', aarch64 says 'Features', riscv says 'isa'
            _flags = next((_l for _l in _f if _l.split("\t")[0].strip()
                           .lower() in ("flags", "features", "isa")), "")
    except OSError:
        _flags = ""
    if not _flags:
        # no feature line (non-Linux / exotic kernel): fall back to a
        # per-host identity so distinct hosts never share a cache dir
        _flags = _platform.processor() + _platform.node() + \
            " ".join(_platform.uname())
    _fp = _hashlib.sha1(
        (_platform.machine() + _flags).encode()).hexdigest()[:12]
    _cache_dir = _os.path.join(
        _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                        _os.path.expanduser("~/.cache/tpu3drec_jax")), _fp)
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization, never a requirement

from tpu3drec.core.types import (
    Features,
    Matches,
    ScoreType,
    MethodResult,
    MatchingResult,
)
from tpu3drec.core.config import (
    DEFAULT_CONFIG,
    PRESET_CONFIGS,
    create_config_from_preset,
    merge_configs,
    validate_config,
    save_config,
    load_config,
)
from tpu3drec.api import (
    create_pipeline,
    detect_features,
    match_images,
    quick_match,
    quick_process_folder,
    reconstruct_folder,
)


def reconstruct_scene(*args, **kw):
    """Incremental SfM entry (lazy import; see tpu3drec.sfm)."""
    from tpu3drec.sfm import reconstruct_scene as _rs
    return _rs(*args, **kw)


def run_dense_reconstruction(*args, **kw):
    """Dense reconstruction entry (lazy import; see tpu3drec.pipelines.dense)."""
    from tpu3drec.pipelines.dense import run_dense_reconstruction as _rd
    return _rd(*args, **kw)

__all__ = [
    "Features",
    "Matches",
    "ScoreType",
    "MethodResult",
    "MatchingResult",
    "DEFAULT_CONFIG",
    "PRESET_CONFIGS",
    "create_config_from_preset",
    "merge_configs",
    "validate_config",
    "save_config",
    "load_config",
    "create_pipeline",
    "detect_features",
    "match_images",
    "quick_match",
    "quick_process_folder",
    "reconstruct_scene",
    "run_dense_reconstruction",
]
