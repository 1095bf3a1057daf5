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


# ---------------------------------------------------------------------
# orbax array-native SfM checkpoint (SURVEY §5 "checkpoint/resume":
# "orbax-style checkpoint of reconstruction pytree + pair-completion
# bitmask"). The pickle path (Reconstruction.save_state, the reference's
# saved_variable.pkl parity format) remains the interchange format;
# this is the TPU-native alternative: numeric state as an orbax
# checkpoint (async-safe, partial-restore capable), strings in a JSON
# manifest beside it.
# ---------------------------------------------------------------------

def save_reconstruction_orbax(recon, directory) -> None:
    """Checkpoint a Reconstruction as an orbax pytree + JSON manifest."""
    import shutil
    import numpy as np
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    names = sorted(recon.cameras)
    name_id = {n: i for i, n in enumerate(names)}
    n_pts = recon.num_points
    # struct-of-arrays store: zero-copy views + one LUT gather remaps
    # insertion-order camera ids to this checkpoint's sorted order
    ocam, opid, ouv = recon.obs_arrays()
    lut = np.asarray([name_id[n] for n in recon.camera_names()], np.int32)
    tree = {
        "R": (np.stack([recon.cameras[n].R for n in names])
              if names else np.zeros((0, 3, 3))),
        "t": (np.stack([recon.cameras[n].t for n in names])
              if names else np.zeros((0, 3))),
        "K": (np.stack([recon.cameras[n].K for n in names])
              if names else np.zeros((0, 3, 3))),
        "points": (np.asarray(recon.points)
                   if n_pts else np.zeros((0, 3))),
        "colors": (np.asarray(recon.point_colors)
                   if n_pts else np.zeros((0, 3), np.uint8)),
        "obs_cam": (lut[ocam] if len(ocam) else np.zeros(0, np.int32)),
        "obs_pt": np.asarray(opid, np.int32),
        "obs_uv": (np.asarray(ouv) if len(ouv) else np.zeros((0, 2))),
    }
    state_dir = directory / "state"
    if state_dir.exists():
        shutil.rmtree(state_dir)
    directory.mkdir(parents=True, exist_ok=True)
    # sync PyTree handler: StandardCheckpointer's async executor clashes
    # with this image's atexit-managed event loop
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ck:
        ck.save(state_dir, tree)
    manifest = {
        "format": "tpu3drec-orbax-v1",
        "camera_names": names,
        "image_sizes": {n: list(recon.cameras[n].image_size)
                        for n in names},
    }
    tmp = directory / "manifest.json.tmp"
    tmp.write_text(json.dumps(manifest))
    os.replace(tmp, directory / "manifest.json")


def load_reconstruction_orbax(directory):
    """Restore a Reconstruction saved by save_reconstruction_orbax."""
    import numpy as np
    import orbax.checkpoint as ocp
    from tpu3drec.sfm.reconstruction import Camera, Reconstruction

    directory = Path(directory).absolute()
    manifest = json.loads((directory / "manifest.json").read_text())
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ck:
        tree = ck.restore(directory / "state")
    names = manifest["camera_names"]
    recon = Reconstruction()
    for i, n in enumerate(names):
        recon.add_camera(Camera(
            n, np.asarray(tree["R"][i]), np.asarray(tree["t"][i]),
            np.asarray(tree["K"][i]),
            tuple(manifest["image_sizes"][n])))
    pts = np.asarray(tree["points"])
    if len(pts):
        recon.add_points_batch(pts)
        recon.point_colors = np.asarray(tree["colors"], np.uint8)
    obs_cam = np.asarray(tree["obs_cam"])
    obs_pt = np.asarray(tree["obs_pt"])
    obs_uv = np.asarray(tree["obs_uv"])
    for ci in np.unique(obs_cam):
        sel = obs_cam == ci
        recon.add_observations_batch(names[int(ci)], obs_pt[sel],
                                     obs_uv[sel])
    return recon
