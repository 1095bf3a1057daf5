"""Crash-safe batch checkpointing: progress.json written after every pair.

Semantics-preserving rebuild of the reference BatchProcessor
(FeatureMatchingExtraction/batch_processor.py:13-268): completed-pair set
persisted as JSON after every unit of work, resume skips completed pairs,
corrupted checkpoints start fresh (:82-87), plus the module-level helpers
load_progress / delete_progress / get_remaining_pairs (:192-268).

Writes are atomic (tmp file + rename) so a crash mid-write can't corrupt
the checkpoint — an improvement over the reference's direct write.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

PROGRESS_FILE = "progress.json"

PairKey = Tuple[str, str]


def _key_str(pair: PairKey) -> str:
    return f"{pair[0]}|{pair[1]}"


class BatchProcessor:
    """Pair-completion checkpoint manager (batch_processor.py:13-185)."""

    def __init__(self, output_dir, metadata: Optional[Dict] = None):
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.progress_path = self.output_dir / PROGRESS_FILE
        self.completed: set = set()
        self.metadata: Dict = metadata or {}
        self._load()

    def _load(self) -> None:
        if not self.progress_path.exists():
            return
        try:
            data = json.loads(self.progress_path.read_text())
            self.completed = set(data.get("completed_pairs", []))
            self.metadata.update(data.get("metadata", {}))
        except (json.JSONDecodeError, OSError):
            # corrupted checkpoint -> start fresh (batch_processor.py:82-87)
            self.completed = set()

    def save_progress(self) -> None:
        """Atomic write after every pair (batch_processor.py:101-128)."""
        payload = {
            "completed_pairs": sorted(self.completed),
            "total_completed": len(self.completed),
            "last_updated": time.time(),
            "metadata": self.metadata,
        }
        tmp = self.progress_path.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(payload, indent=1))
        os.replace(tmp, self.progress_path)

    def mark_completed(self, pair: PairKey, save: bool = True) -> None:
        self.completed.add(_key_str(pair))
        if save:
            self.save_progress()

    def is_completed(self, pair: PairKey) -> bool:
        return _key_str(pair) in self.completed

    def get_remaining_pairs(self, pairs: Sequence[PairKey]) -> List[PairKey]:
        return [p for p in pairs if not self.is_completed(p)]

    def reset(self) -> None:
        self.completed = set()
        if self.progress_path.exists():
            self.progress_path.unlink()

    @property
    def num_completed(self) -> int:
        return len(self.completed)


def load_progress(output_dir) -> Optional[Dict]:
    """batch_processor.py:192-217."""
    p = Path(output_dir) / PROGRESS_FILE
    if not p.exists():
        return None
    try:
        return json.loads(p.read_text())
    except (json.JSONDecodeError, OSError):
        return None


def delete_progress(output_dir) -> bool:
    """batch_processor.py:219-240."""
    p = Path(output_dir) / PROGRESS_FILE
    if p.exists():
        p.unlink()
        return True
    return False


def get_remaining_pairs(output_dir, pairs: Sequence[PairKey]) -> List[PairKey]:
    """batch_processor.py:242-268."""
    data = load_progress(output_dir)
    if not data:
        return list(pairs)
    done = set(data.get("completed_pairs", []))
    return [p for p in pairs if _key_str(p) not in done]
