"""Core data model: fixed-shape, mask-padded array pytrees.

TPU-native replacement for the reference's object containers
(FeatureMatchingExtraction/core_data_structures.py): cv2's variable-length
``List[cv2.KeyPoint]`` becomes a ``(N, ...)`` array bundle padded to a static
capacity with a validity mask, so every op stays jit-able with static shapes
and batches cleanly under ``vmap``.

Semantics preserved from the reference:
- ScoreType algebra (DISTANCE / CONFIDENCE / SIMILARITY) and the
  distance <-> confidence conversion ``distance = 1 - confidence``
  (core_data_structures.py:64-101).
- MethodResult quality score
  ``0.4*min(n_matches/500, 1) + 0.4*inlier_ratio + 0.2*max(0, 1 - reproj/10)``
  (result_types.py:102-118).
- filter_by_score / top-k semantics of MatchData (core_data_structures.py:132-173).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


class ScoreType(str, enum.Enum):
    """Match score semantics (reference: core_data_structures.py:32-37)."""

    DISTANCE = "distance"      # lower is better (L2 / Hamming)
    CONFIDENCE = "confidence"  # higher is better, in [0, 1]
    SIMILARITY = "similarity"  # higher is better, unbounded


class DescriptorKind(str, enum.Enum):
    """Descriptor family — decides the kNN metric and storage layout."""

    FLOAT = "float"    # float descriptors (SIFT, SuperPoint, ...): L2 metric
    BINARY = "binary"  # binary descriptors (ORB, BRISK, AKAZE-MLDB): Hamming
    NONE = "none"      # detector produced no descriptors


def _static(default):
    return struct.field(pytree_node=False, default=default)


@struct.dataclass
class Features:
    """Padded keypoints + descriptors for one image.

    Replaces the reference ``FeatureData`` (core_data_structures.py:39-62).
    All arrays share leading capacity ``N`` (static); ``mask`` marks valid rows.
    Binary descriptors are stored as +-1 float so Hamming distance is computed
    on the MXU: ``hamming = (D - a @ b.T) / 2``.
    """

    xy: jnp.ndarray        # (N, 2) float32 — keypoint (x, y) pixel coords
    response: jnp.ndarray  # (N,)  float32 — detector response / confidence
    scale: jnp.ndarray     # (N,)  float32 — keypoint size (diameter, px)
    angle: jnp.ndarray     # (N,)  float32 — orientation, radians; 0 if none
    desc: jnp.ndarray      # (N, D) — descriptors (float, or +-1 for binary)
    mask: jnp.ndarray      # (N,)  bool — True for valid keypoints

    method: str = _static("unknown")
    desc_kind: str = _static(DescriptorKind.FLOAT.value)
    score_type: str = _static(ScoreType.DISTANCE.value)
    image_shape: tuple = _static(())  # (H, W) of the source image

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]

    @property
    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.mask.astype(jnp.int32))

    def __len__(self) -> int:
        """Host-side count of valid keypoints (forces device sync)."""
        return int(self.num_valid)

    @classmethod
    def empty(cls, capacity: int, desc_dim: int, method: str = "unknown",
              desc_kind: str = DescriptorKind.FLOAT.value,
              image_shape: tuple = ()) -> "Features":
        return cls(
            xy=jnp.zeros((capacity, 2), jnp.float32),
            response=jnp.zeros((capacity,), jnp.float32),
            scale=jnp.zeros((capacity,), jnp.float32),
            angle=jnp.zeros((capacity,), jnp.float32),
            desc=jnp.zeros((capacity, desc_dim), jnp.float32),
            mask=jnp.zeros((capacity,), bool),
            method=method,
            desc_kind=desc_kind,
            image_shape=image_shape,
        )

    def top_k(self, k: int) -> "Features":
        """Keep the k strongest valid keypoints (reference: base_classes.py:49-73)."""
        score = jnp.where(self.mask, self.response, -jnp.inf)
        idx = jnp.argsort(-score)[:k]
        return Features(
            xy=self.xy[idx],
            response=self.response[idx],
            scale=self.scale[idx],
            angle=self.angle[idx],
            desc=self.desc[idx],
            mask=self.mask[idx],
            method=self.method,
            desc_kind=self.desc_kind,
            score_type=self.score_type,
            image_shape=self.image_shape,
        )

    # -- host-side conversion helpers ------------------------------------

    def to_numpy(self) -> Dict[str, np.ndarray]:
        """Dense (unpadded) numpy view, for IO / serialization."""
        m = np.asarray(self.mask)
        return {
            "xy": np.asarray(self.xy)[m],
            "response": np.asarray(self.response)[m],
            "scale": np.asarray(self.scale)[m],
            "angle": np.asarray(self.angle)[m],
            "desc": np.asarray(self.desc)[m],
            "method": self.method,
            "desc_kind": self.desc_kind,
            "image_shape": self.image_shape,
        }

    @classmethod
    def from_numpy(cls, xy, desc, response=None, scale=None, angle=None,
                   capacity: Optional[int] = None, method: str = "unknown",
                   desc_kind: str = DescriptorKind.FLOAT.value,
                   image_shape: tuple = ()) -> "Features":
        """Build a padded Features from dense host arrays."""
        xy = np.asarray(xy, np.float32).reshape(-1, 2)
        n = xy.shape[0]
        if desc is not None:
            desc = np.asarray(desc, np.float32)
            # reshape(0, -1) is ambiguous for empty inputs — keep the
            # trailing descriptor dim when n == 0
            desc = (desc.reshape(n, -1) if n else
                    desc.reshape(0, desc.shape[-1] if desc.ndim else 0))
        else:
            desc = np.zeros((n, 0), np.float32)
        cap = capacity or max(n, 1)
        d = desc.shape[1]

        def pad(a, shape):
            out = np.zeros(shape, np.float32)
            out[:n] = a[:cap]
            return out

        return cls(
            xy=jnp.asarray(pad(xy, (cap, 2))),
            response=jnp.asarray(pad(
                np.asarray(response, np.float32) if response is not None
                else np.ones(n, np.float32), (cap,))),
            scale=jnp.asarray(pad(
                np.asarray(scale, np.float32) if scale is not None
                else np.ones(n, np.float32), (cap,))),
            angle=jnp.asarray(pad(
                np.asarray(angle, np.float32) if angle is not None
                else np.zeros(n, np.float32), (cap,))),
            desc=jnp.asarray(pad(desc, (cap, d))),
            mask=jnp.asarray(np.arange(cap) < n),
            method=method,
            desc_kind=desc_kind,
            image_shape=image_shape,
        )


@struct.dataclass
class Matches:
    """Padded match set between two Features (reference: MatchData,
    core_data_structures.py:104-173).

    ``idx1[i] -> idx2[i]`` with per-match ``score``; ``mask`` marks valid rows.
    """

    idx1: jnp.ndarray   # (M,) int32 — indices into features1
    idx2: jnp.ndarray   # (M,) int32 — indices into features2
    score: jnp.ndarray  # (M,) float32 — distance or confidence per score_type
    mask: jnp.ndarray   # (M,) bool

    score_type: str = _static(ScoreType.DISTANCE.value)
    method: str = _static("unknown")

    @property
    def capacity(self) -> int:
        return self.idx1.shape[0]

    @property
    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.mask.astype(jnp.int32))

    def __len__(self) -> int:
        return int(self.num_valid)

    # -- ScoreType algebra (reference: core_data_structures.py:77-101) ----

    def as_distance(self) -> jnp.ndarray:
        """Per-match distance-like score (lower = better)."""
        if self.score_type == ScoreType.DISTANCE.value:
            return self.score
        return 1.0 - self.score

    def quality(self) -> jnp.ndarray:
        """Per-match normalized quality (higher = better) in [0, 1]."""
        if self.score_type == ScoreType.DISTANCE.value:
            return 1.0 - jnp.minimum(self.score, 1.0)
        return self.score

    def filter_by_score(self, threshold: float) -> "Matches":
        """Keep matches better than threshold (core_data_structures.py:132-160)."""
        if self.score_type == ScoreType.DISTANCE.value:
            keep = self.score <= threshold
        else:
            keep = self.score >= threshold
        return self.replace(mask=self.mask & keep)

    def top_k(self, k: int) -> "Matches":
        """Keep the k best valid matches, sorted best-first."""
        q = jnp.where(self.mask, self.quality(), -jnp.inf)
        idx = jnp.argsort(-q)[:k]
        return Matches(
            idx1=self.idx1[idx], idx2=self.idx2[idx],
            score=self.score[idx], mask=self.mask[idx],
            score_type=self.score_type, method=self.method,
        )

    def gather_points(self, feats1: Features, feats2: Features):
        """(M,2),(M,2) matched coordinates (invalid rows are garbage — mask!)."""
        return feats1.xy[self.idx1], feats2.xy[self.idx2]

    def to_numpy(self) -> Dict[str, np.ndarray]:
        m = np.asarray(self.mask)
        return {
            "idx1": np.asarray(self.idx1)[m],
            "idx2": np.asarray(self.idx2)[m],
            "score": np.asarray(self.score)[m],
            "score_type": self.score_type,
            "method": self.method,
        }


# =====================================================================
# Host-side result containers (pipeline outputs; not traced)
# =====================================================================


@dataclasses.dataclass
class MethodResult:
    """Per-method result for one image pair (reference: result_types.py:30-118)."""

    method: str
    features1: Features
    features2: Features
    matches: Matches                  # raw matches
    filtered_matches: Optional[Matches] = None
    homography: Optional[np.ndarray] = None
    inlier_ratio: Optional[float] = None
    reprojection_error: Optional[float] = None
    detection_time: float = 0.0
    matching_time: float = 0.0
    # matcher actually executed (e.g. "knn", "lightglue",
    # "knn (lightglue fallback: ...)") — the configured matcher can
    # silently degrade (no converted weights), so record the truth here
    matcher_used: str = ""

    @property
    def best_matches(self) -> Matches:
        return self.filtered_matches if self.filtered_matches is not None else self.matches

    @property
    def num_matches(self) -> int:
        return len(self.best_matches)

    @property
    def num_raw_matches(self) -> int:
        return len(self.matches)

    @property
    def total_time(self) -> float:
        return self.detection_time + self.matching_time

    def get_quality_score(self) -> float:
        """Ranking score — exact formula of reference result_types.py:102-118."""
        score = 0.0
        if self.num_matches > 0:
            score += min(self.num_matches / 500.0, 1.0) * 0.4
        if self.inlier_ratio is not None:
            score += self.inlier_ratio * 0.4
        if self.reprojection_error is not None:
            score += max(0.0, 1.0 - self.reprojection_error / 10.0) * 0.2
        return score


@dataclasses.dataclass
class MatchingResult:
    """Multi-method container for one image pair (reference: result_types.py:121+).

    Dict-like access by method name, ranking, best-method selection.
    """

    results: Dict[str, MethodResult]
    image1_name: str = ""
    image2_name: str = ""
    image1_shape: tuple = ()
    image2_shape: tuple = ()
    total_processing_time: float = 0.0
    metadata: Dict[str, Any] = dataclasses.field(default_factory=dict)

    def __getitem__(self, method: str) -> MethodResult:
        return self.results[method]

    def __contains__(self, method: str) -> bool:
        return method in self.results

    def keys(self):
        return self.results.keys()

    def values(self):
        return self.results.values()

    def items(self):
        return self.results.items()

    def rank_methods(self):
        """Methods sorted by quality score, best first (result_types.py:294-311)."""
        return sorted(self.results.items(),
                      key=lambda kv: kv[1].get_quality_score(), reverse=True)

    def get_best(self) -> Optional[MethodResult]:
        """Best method by quality score (result_types.py:263-292)."""
        ranked = self.rank_methods()
        return ranked[0][1] if ranked else None

    def get_best_method_name(self) -> Optional[str]:
        ranked = self.rank_methods()
        return ranked[0][0] if ranked else None

    def summary(self) -> Dict[str, Any]:
        return {
            "pair": (self.image1_name, self.image2_name),
            "methods": {
                name: {
                    "num_matches": r.num_matches,
                    "num_raw_matches": r.num_raw_matches,
                    "inlier_ratio": r.inlier_ratio,
                    "reprojection_error": r.reprojection_error,
                    "quality_score": r.get_quality_score(),
                    "total_time": r.total_time,
                }
                for name, r in self.results.items()
            },
            "best_method": self.get_best_method_name(),
            "total_processing_time": self.total_processing_time,
        }


def pack_binary_descriptors(bits: np.ndarray) -> np.ndarray:
    """(N, D) {0,1} -> (N, D) +-1 float32 for MXU Hamming matching."""
    return (np.asarray(bits, np.float32) * 2.0 - 1.0)


def hamming_from_pm1(dot: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Recover Hamming distance from a +-1 descriptor dot product."""
    return (dim - dot) * 0.5
