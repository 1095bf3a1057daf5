"""Multi-host DCN tests (parallel/multihost.py): 2 CPU processes with
jax.distributed, folder sharding by pair index, cross-process collectives,
and the batch-pickle merge of per-shard outputs. Plus the blockwise
large-N kNN (ops/match.py:knn2_blockwise), the SURVEY §5 long-context
analogue of the distance matrix."""

import json
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

from tpu3drec.ops.match import knn2, knn2_blockwise
from tpu3drec.parallel.multihost import shard_pairs


def test_shard_pairs_partition():
    pairs = [(f"a{i}", f"b{i}") for i in range(11)]
    s0 = shard_pairs(pairs, 3, 0)
    s1 = shard_pairs(pairs, 3, 1)
    s2 = shard_pairs(pairs, 3, 2)
    assert sorted(s0 + s1 + s2) == sorted(pairs)
    assert not (set(s0) & set(s1)) and not (set(s1) & set(s2))
    assert abs(len(s0) - len(s2)) <= 1


def test_blockwise_knn_exact():
    rng = np.random.default_rng(0)
    n, m, d = 300, 517, 64
    d1 = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    d2 = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32))
    m1 = jnp.asarray(rng.random(n) > 0.1)
    m2 = jnp.asarray(rng.random(m) > 0.1)
    i_full, v_full = knn2(d1, d2, m1, m2)
    i_blk, v_blk = knn2_blockwise(d1, d2, m1, m2, block=128)
    np.testing.assert_array_equal(np.asarray(i_blk), np.asarray(i_full))
    np.testing.assert_allclose(np.asarray(v_blk), np.asarray(v_full),
                               atol=1e-5)


def test_large_n_routes_to_blockwise():
    """match_features must pick the tiled path at N >= 8192 and agree
    with the full-matrix result."""
    from tpu3drec.ops.match import _match_impl, BLOCKWISE_THRESHOLD
    rng = np.random.default_rng(1)
    n = BLOCKWISE_THRESHOLD
    d1 = jnp.asarray(rng.standard_normal((n, 32)).astype(np.float32))
    d2 = jnp.asarray(rng.standard_normal((n, 32)).astype(np.float32))
    ones = jnp.ones(n, bool)
    best, dist, ok = _match_impl(d1, d2, ones, ones, 0.95, False, "l2")
    # reference via explicit blockwise on a few probe rows
    i_blk, v_blk = knn2_blockwise(d1[:64], d2, ones[:64], ones, block=2048)
    np.testing.assert_array_equal(np.asarray(best[:64]),
                                  np.asarray(i_blk[:, 0]))


_WORKER = textwrap.dedent("""
    import os, sys, json
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); addr = sys.argv[3]
    jax.distributed.initialize(coordinator_address=addr,
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc        # global devices over DCN
    import numpy as np
    import jax.numpy as jnp
    from tpu3drec.parallel.multihost import shard_pairs, global_pair_stats

    pairs = [(f"i{{k}}.png", f"i{{k+1}}.png") for k in range(7)]
    mine = shard_pairs(pairs, nproc, pid)
    local = {{"pairs": float(len(mine)), "matches": 10.0 * (pid + 1)}}
    tot = global_pair_stats(local)
    # write to a file: stdout can interleave with jax/absl log lines
    out_path = sys.argv[4]
    with open(out_path, "w") as fh:
        json.dump({{"pid": pid, "mine": len(mine), "total": tot}}, fh)
""")


def test_two_process_dcn_collective(tmp_path):
    port = socket.socket()
    port.bind(("localhost", 0))
    addr = f"localhost:{port.getsockname()[1]}"
    port.close()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=str(Path(__file__).parent.parent)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    result_files = [tmp_path / f"result_{i}.json" for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2", addr,
         str(result_files[i])],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for i in range(2)]
    outs = [p.communicate(timeout=220)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    results = [json.loads(f.read_text()) for f in result_files]
    # folder sharded: 7 pairs split 4/3; DCN-summed stats agree on both
    assert sorted(r["mine"] for r in results) == [3, 4]
    for r in results:
        assert r["total"]["pairs"] == 7.0
        assert r["total"]["matches"] == 30.0  # 10 + 20
