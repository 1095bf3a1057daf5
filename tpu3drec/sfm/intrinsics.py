"""Progressive-learning intrinsics estimation.

Rebuild of the reference ProgressiveLearningIntrinsicsEstimator
(CameraPoseEstimation/intrinsics_estimator.py): with no calibrated cameras
the focal comes from a resolution/aspect FOV heuristic (:105-141, and the
f = 1.2 * width rule of essential_estimation.py:36-60); as cameras are
reconstructed their learned focal *ratios* (f / max_dim) feed back into
estimates for new views (:143-520), keeping a bounded pattern database.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class CameraPattern:
    """intrinsics_estimator.py:7-20."""
    width: int
    height: int
    focal_ratio: float       # focal / max(width, height)
    source: str = "learned"


def heuristic_K(width: int, height: int,
                focal_factor: float = 1.2) -> np.ndarray:
    """Reference default: f = 1.2 * width, pp at center
    (essential_estimation.py:36-60)."""
    f = focal_factor * width
    return np.array([[f, 0, width / 2.0],
                     [0, f, height / 2.0],
                     [0, 0, 1.0]], np.float64)


def fov_heuristic_ratio(width: int, height: int) -> float:
    """Camera-type FOV heuristic (intrinsics_estimator.py:105-141):
    phone-ish wide FOV for small/landscape images, DSLR-ish for large,
    panoramic for extreme aspect ratios. Returns focal / max_dim."""
    aspect = width / max(height, 1)
    if aspect > 2.5 or aspect < 0.4:
        return 0.7          # panoramic
    mp = width * height / 1e6
    if mp < 1.5:
        return 0.85         # phone/compact, wide FOV
    if mp < 8:
        return 1.0
    return 1.2              # DSLR-ish, narrower FOV


class ProgressiveIntrinsicsEstimator:
    """intrinsics_estimator.py:22-591."""

    MAX_PATTERNS = 50

    def __init__(self):
        self.patterns: List[CameraPattern] = []

    def learn(self, K: np.ndarray, width: int, height: int,
              source: str = "learned") -> None:
        """Record a reconstructed camera's focal ratio (:551+)."""
        f = 0.5 * (K[0, 0] + K[1, 1])
        ratio = f / max(width, height, 1)
        if not (0.2 < ratio < 5.0):
            return
        self.patterns.append(CameraPattern(width, height, ratio, source))
        if len(self.patterns) > self.MAX_PATTERNS:
            self.patterns.pop(0)

    def estimate(self, width: int, height: int) -> np.ndarray:
        """Progressive estimate (:105-520): blend heuristic with learned
        ratios, weighting same-resolution patterns highest."""
        base_ratio = fov_heuristic_ratio(width, height)
        if not self.patterns:
            ratio = base_ratio
        else:
            weights, ratios = [], []
            for p in self.patterns:
                res_sim = np.exp(-abs(np.log((p.width * p.height)
                                             / max(width * height, 1))))
                asp_sim = np.exp(-abs(np.log((p.width / max(p.height, 1))
                                             / (width / max(height, 1)))))
                weights.append(res_sim * asp_sim)
                ratios.append(p.focal_ratio)
            w = np.asarray(weights)
            learned = float(np.sum(w * np.asarray(ratios)) / max(w.sum(), 1e-9))
            # few cameras -> trust heuristic more (:143-271)
            alpha = min(len(self.patterns) / 5.0, 1.0) * 0.8
            ratio = (1 - alpha) * base_ratio + alpha * learned
        f = ratio * max(width, height)
        return np.array([[f, 0, width / 2.0],
                         [0, f, height / 2.0],
                         [0, 0, 1.0]], np.float64)

    @property
    def num_learned(self) -> int:
        return len(self.patterns)
