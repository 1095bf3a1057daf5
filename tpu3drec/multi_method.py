"""Multi-method detector facade.

Rebuild of the reference MultiMethodFeatureDetector
(multi_method_detector.py:19-195): runs N configured detectors over one
image -> {method: Features}, with per-method params and graceful skip of
unavailable methods (:133-140). On TPU the methods are independent expert
branches (the EP axis of parallel/pairs.py); this facade runs them
sequentially on one device — each method's program is jit-cached.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

from tpu3drec.core.types import Features


class MultiMethodFeatureDetector:
    """multi_method_detector.py:19-169."""

    def __init__(self, methods: Sequence[str] = ("SIFT",),
                 max_features: int = 2048,
                 detector_params: Optional[Dict[str, Dict]] = None):
        from tpu3drec.api import _get_detector_registry
        registry = _get_detector_registry()
        self.methods: List[str] = []
        self.skipped: List[str] = []
        for m in methods:
            (self.methods if m in registry else self.skipped).append(m)
        self.max_features = max_features
        self.detector_params = detector_params or {}

    def detect_all(self, image) -> Dict[str, Features]:
        """multi_method_detector.py:112-169; failures yield empty Features
        (per-detector fault tolerance, :133-140)."""
        from tpu3drec.api import detect_features
        out: Dict[str, Features] = {}
        for m in self.methods:
            try:
                out[m] = detect_features(
                    image, m, max_features=self.max_features,
                    **self.detector_params.get(m, {}))
            except Exception:
                out[m] = Features.empty(1, 1, method=m)
        return out

    def detect(self, image, method: Optional[str] = None) -> Features:
        from tpu3drec.api import detect_features
        m = method or self.methods[0]
        return detect_features(image, m, max_features=self.max_features,
                               **self.detector_params.get(m, {}))


def create_multi_detector(methods: Sequence[str] = ("SIFT", "ORB"),
                          max_features: int = 2048,
                          **params) -> MultiMethodFeatureDetector:
    """multi_method_detector.py:170-195."""
    return MultiMethodFeatureDetector(methods, max_features, params or None)
