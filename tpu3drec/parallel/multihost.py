"""Multi-host folder sharding over DCN (jax.distributed).

SURVEY §5 "distributed communication backend": the reference's only
inter-stage transport is pickle files on a shared filesystem; intra-stage
is a single process. The TPU-native scale-out path is:

  - single host: shard_map over the ICI mesh (parallel/pairs.py)
  - multi host:  `jax.distributed.initialize` over DCN; the FOLDER is
    sharded by pair index across processes (each process matches its
    slice with its local chip mesh and writes reference-format batch
    pickles), and global statistics ride device collectives over the
    multi-host mesh.

The pickle interchange (io/batch_pickle.py) doubles as the merge format:
per-process outputs are plain `<base>_batch_*.pkl` files that
`load_and_validate_pickle` already merges, so the downstream SfM stage
is oblivious to how many hosts produced them.

Tested with 2 CPU processes (tests/test_multihost.py) — the collectives
cross process boundaries through the distributed runtime exactly as they
would cross DCN between TPU hosts.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def init_multihost(coordinator_address: str, num_processes: int,
                   process_id: int,
                   local_device_count: Optional[int] = None) -> None:
    """jax.distributed.initialize wrapper; call BEFORE any backend use.

    On CPU test rigs pass local_device_count via
    XLA_FLAGS=--xla_force_host_platform_device_count=N per process.
    """
    import jax
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _ = local_device_count  # device split is environment-controlled


def shard_pairs(pairs: Sequence, num_processes: int,
                process_id: int) -> List:
    """Deterministic round-robin pair assignment (folder sharding by pair
    index). Round-robin balances both count and image-cache locality of
    consecutive pairs slightly worse than block sharding, but keeps every
    process's work set stable under folder growth."""
    return [p for i, p in enumerate(pairs)
            if i % num_processes == process_id]


def global_pair_stats(local_counts: Dict[str, float]) -> Dict[str, float]:
    """Sum per-process scalar stats across all hosts with a device
    collective over the global (multi-host) mesh."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    keys = sorted(local_counts)
    vec = np.asarray([float(local_counts[k]) for k in keys], np.float32)
    total = multihost_utils.process_allgather(jnp.asarray(vec))
    summed = np.asarray(total).sum(axis=0)
    return {k: float(v) for k, v in zip(keys, summed)}


def match_folder_sharded(folder, output_dir, num_processes: int,
                         process_id: int, pipeline=None,
                         **match_kwargs) -> Dict:
    """Run one process's shard of a folder matching job.

    Each process writes `results_p{pid}_batch_*.pkl` (the reference
    interchange schema) plus its own progress file, so resumption and the
    downstream merge both work per shard. Returns this process's summary
    with the DCN-summed global totals attached.
    """
    from pathlib import Path
    from tpu3drec.pipelines.matching import FeatureProcessingPipeline
    from tpu3drec.io.images import (
        scan_folder_metadata, create_pairs_from_metadata,
    )

    pipe = pipeline or FeatureProcessingPipeline()
    metas = scan_folder_metadata(folder)
    mode = match_kwargs.pop("pair_mode", "consecutive")
    window = match_kwargs.pop("pair_window", 1)
    pairs = create_pairs_from_metadata(metas, mode, window)
    mine = shard_pairs(pairs, num_processes, process_id)
    shard_dir = Path(output_dir) / f"shard_{process_id}"
    summary = pipe.match_folder(
        folder, output_dir=shard_dir, pairs=mine,
        base_name=f"results_p{process_id}", **match_kwargs)
    st = summary.get("stats", {})
    local = {"pairs": float(len(mine)),
             "completed": float(st.get("completed", 0)),
             "total_matches": float(st.get("total_matches", 0))}
    try:
        summary["global"] = global_pair_stats(local)
    except Exception:
        summary["global"] = local  # single-process fallback
    return summary
