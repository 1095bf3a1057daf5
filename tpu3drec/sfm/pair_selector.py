"""Initialization pair selection and next-view ordering.

Rebuild of the reference InitializationPairSelector
(CameraPoseEstimation/pair_selector.py): every candidate pair gets a
weighted score — match count .25, spatial distribution .20, geometric
consistency (fundamental-RANSAC inlier ratio) .25, baseline adequacy .15,
match confidence .15 (ScoringConfig, pair_selector.py:15-38) — with the
F-RANSAC run on device through the batched engine instead of cv2.

Works directly on the inter-stage matches_data dict
({(img1, img2): {correspondences Nx4, ...}}).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class ScoringConfig:
    """pair_selector.py:15-38 weights."""
    w_matches: float = 0.25
    w_distribution: float = 0.20
    w_geometric: float = 0.25
    w_baseline: float = 0.15
    w_confidence: float = 0.15
    target_matches: int = 200
    min_matches: int = 30
    ransac_threshold: float = 2.0


def _spatial_distribution_score(pts: np.ndarray,
                                image_size: Tuple[int, int]) -> float:
    """Coverage of the image by matched points, via an 8x8 occupancy grid
    (pair_selector.py:944-1010 style)."""
    if len(pts) == 0:
        return 0.0
    w = max(image_size[0], pts[:, 0].max() + 1)
    h = max(image_size[1], pts[:, 1].max() + 1)
    gx = np.clip((pts[:, 0] / w * 8).astype(int), 0, 7)
    gy = np.clip((pts[:, 1] / h * 8).astype(int), 0, 7)
    occupied = len(set(zip(gx.tolist(), gy.tolist())))
    return occupied / 64.0


def _baseline_score(inlier_ratio: float, median_disp: float,
                    diag: float) -> float:
    """Baseline adequacy (pair_selector.py:136-148): enough displacement
    for parallax but not so much that overlap collapses."""
    rel = median_disp / max(diag, 1.0)
    if rel < 0.01:
        return rel / 0.01 * 0.3           # near-degenerate baseline
    if rel < 0.15:
        return 0.3 + 0.7 * (rel - 0.01) / 0.14
    if rel < 0.4:
        return 1.0
    return max(0.0, 1.0 - (rel - 0.4))


def _pair_cap(n: int) -> int:
    """Coarse capacity bucket: each distinct correspondence count would
    otherwise trace+compile its own F-RANSAC program (seconds per shape
    on the remote-compile TPU path)."""
    cap = 512
    while cap < n:
        cap *= 4
    return cap


def score_pair(correspondences: np.ndarray,
               image_size: Tuple[int, int] = (640, 480),
               config: ScoringConfig = ScoringConfig(),
               confidence: Optional[float] = None,
               key_seed: int = 0,
               precomputed_geom: Optional[Tuple[float, np.ndarray]] = None
               ) -> Dict:
    """Score one pair's Nx4 correspondences; returns component scores.

    precomputed_geom: (inlier_ratio, inlier_mask[:n]) from a batched
    F-RANSAC (score_all_pairs) — skips the per-pair device call."""
    n = len(correspondences)
    if n < config.min_matches:
        return {"total": 0.0, "num_matches": n, "inlier_ratio": 0.0,
                "reason": "too few matches"}
    corr = np.asarray(correspondences, np.float32)
    p1, p2 = corr[:, :2], corr[:, 2:]

    if precomputed_geom is not None:
        inlier_ratio, inl = precomputed_geom
    else:
        import jax
        import jax.numpy as jnp
        from tpu3drec.ops.geometry import find_fundamental
        cap = _pair_cap(n)
        p1p = np.zeros((cap, 2), np.float32)
        p2p = np.zeros((cap, 2), np.float32)
        p1p[:n], p2p[:n] = p1, p2
        rr = find_fundamental(jnp.asarray(p1p), jnp.asarray(p2p),
                              mask=jnp.asarray(np.arange(cap) < n),
                              threshold=config.ransac_threshold,
                              num_hypotheses=256,
                              key=jax.random.PRNGKey(key_seed))
        inlier_ratio = float(rr.inlier_ratio) if bool(rr.success) else 0.0
        inl = np.asarray(rr.inliers)[:n]

    s_matches = min(n / config.target_matches, 1.0)
    s_dist = 0.5 * (_spatial_distribution_score(p1, image_size)
                    + _spatial_distribution_score(p2, image_size))
    s_geom = inlier_ratio
    disp = np.linalg.norm(p2 - p1, axis=1)
    med_disp = float(np.median(disp[inl])) if inl.any() else float(np.median(disp))
    diag = float(np.hypot(*image_size))
    s_base = _baseline_score(inlier_ratio, med_disp, diag)
    s_conf = confidence if confidence is not None else inlier_ratio

    total = (config.w_matches * s_matches + config.w_distribution * s_dist
             + config.w_geometric * s_geom + config.w_baseline * s_base
             + config.w_confidence * s_conf)
    return {"total": float(total), "num_matches": n,
            "inlier_ratio": inlier_ratio, "matches_score": s_matches,
            "distribution_score": s_dist, "baseline_score": s_base,
            "median_displacement": med_disp}


class InitializationPairSelector:
    """pair_selector.py:41-535."""

    def __init__(self, config: ScoringConfig = ScoringConfig()):
        self.config = config
        self.scores: Dict[Tuple[str, str], Dict] = {}

    def score_all_pairs(self, matches_data: Dict,
                        image_info: Optional[Dict] = None) -> Dict:
        """All pairs' geometric-consistency F-RANSACs run as ONE vmapped
        program per capacity bucket (a serial per-pair loop costs a
        device dispatch each — ~6 s for a 21-pair folder through the
        remote tunnel)."""
        import jax
        import jax.numpy as jnp
        from tpu3drec.ops.geometry import find_fundamental

        entries = []
        for i, (pair, pd) in enumerate(sorted(matches_data.items())):
            if "error" in pd:
                continue
            corr = np.asarray(pd.get("correspondences", []))
            size = (640, 480)
            if image_info and pair[0] in image_info:
                info = image_info[pair[0]]
                size = (info.get("width", 640), info.get("height", 480))
            conf = pd.get("quality_score")
            entries.append((i, pair, corr, size, conf))

        geom: Dict = {}
        big = [e for e in entries if len(e[2]) >= self.config.min_matches]
        by_cap: Dict[int, list] = {}
        for e in big:
            by_cap.setdefault(_pair_cap(len(e[2])), []).append(e)
        thr = self.config.ransac_threshold
        # fixed-size group chunks (dummy rows: mask all-False) so every
        # folder size reuses ONE traced program per capacity bucket
        CHUNK = 8
        for cap, group in sorted(by_cap.items()):
            for s in range(0, len(group), CHUNK):
                part = group[s:s + CHUNK]
                P1 = np.zeros((CHUNK, cap, 2), np.float32)
                P2 = np.zeros((CHUNK, cap, 2), np.float32)
                M = np.zeros((CHUNK, cap), bool)
                seeds = np.zeros(CHUNK, np.uint32)
                for g, (i, _, corr, _, _) in enumerate(part):
                    c = np.asarray(corr, np.float32)
                    P1[g, :len(c)] = c[:, :2]
                    P2[g, :len(c)] = c[:, 2:]
                    M[g, :len(c)] = True
                    seeds[g] = i
                keys = jax.vmap(jax.random.PRNGKey)(jnp.asarray(seeds))
                rr = jax.vmap(lambda a, b, m, k: find_fundamental(
                    a, b, mask=m, threshold=thr, num_hypotheses=256,
                    key=k)
                )(jnp.asarray(P1), jnp.asarray(P2), jnp.asarray(M), keys)
                ratios = np.asarray(rr.inlier_ratio)
                succ = np.asarray(rr.success)
                inls = np.asarray(rr.inliers)
                for g, (i, pair, corr, size, conf) in enumerate(part):
                    geom[pair] = (float(ratios[g]) if bool(succ[g])
                                  else 0.0, inls[g, :len(corr)])

        for i, pair, corr, size, conf in entries:
            self.scores[pair] = score_pair(
                corr, size, self.config, confidence=conf, key_seed=i,
                precomputed_geom=geom.get(pair))
        return self.scores

    def get_best_pair(self, matches_data: Dict,
                      image_info: Optional[Dict] = None
                      ) -> Optional[Tuple[Tuple[str, str], Dict]]:
        """get_best_pair_for_pipeline (pair_selector.py:421-470)."""
        if not self.scores:
            self.score_all_pairs(matches_data, image_info)
        ranked = sorted(self.scores.items(), key=lambda kv: -kv[1]["total"])
        if not ranked or ranked[0][1]["total"] <= 0:
            return None
        return ranked[0]

    def rank_next_views(self, remaining: List[str],
                        processed: List[str],
                        matches_data: Dict) -> List[Tuple[str, float]]:
        """Connectivity-scored next-camera ordering
        (pair_selector.py:323-420, CPE/pipeline.py:1723-1984)."""
        out = []
        proc = set(processed)
        for img in remaining:
            total = 0.0
            links = 0
            for pair, pd in matches_data.items():
                if "error" in pd:
                    continue
                if img in pair and (set(pair) - {img}) & proc:
                    n = pd.get("num_matches", 0)
                    total += min(n / self.config.target_matches, 1.0)
                    links += 1
            out.append((img, total * (1 + 0.1 * links)))
        return sorted(out, key=lambda kv: -kv[1])
