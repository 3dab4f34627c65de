"""Multi-host execution for real: two coordinator-joined CPU processes.

The reference has no multi-node story at all (SURVEY §2); this framework
documents one (parallel/distributed.py, ARCHITECTURE.md) — these tests make
it executable truth. Two subprocesses with 4 virtual CPU devices each join
via jax.distributed, build the global 8-device mesh, feed per-process batch
shards through shard_host_local_batch, and run one sharded GAN train step;
the resulting update must match the single-process 8-device run bit-for-bit
(within reduction-order tolerance).
"""

import os
import pickle
import socket
import subprocess
import sys

import numpy as np

import jax

from .test_train import TINY_CONFIG, _batch, _setup

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_update_matches_single_process(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    outs = [str(tmp_path / f"out_{pid}.pkl") for pid in range(2)]
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = REPO
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(REPO, "tests", "distributed_worker.py"),
                str(pid), "2", coordinator, outs[pid],
            ],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    results = []
    for path in outs:
        with open(path, "rb") as f:
            results.append(pickle.load(f))

    # Both processes hold the same replicated post-step state.
    for a, b in zip(
        jax.tree.leaves(results[0]["params"]), jax.tree.leaves(results[1]["params"])
    ):
        np.testing.assert_array_equal(a, b)

    # Single-process 8-device reference on the same global batch.
    from monkeynet_tpu.parallel.mesh import make_sharded_train_step

    models, optimizer, state, tp = _setup(axis_name="data", sgd=True)
    step = make_sharded_train_step(models, tp, optimizer, num_devices=8)
    ref_state, ref_out = step(state, _batch())

    np.testing.assert_allclose(
        results[0]["metrics"], np.asarray(ref_out["metrics"]), atol=1e-4
    )
    for a, b in zip(
        jax.tree.leaves(results[0]["params"]), jax.tree.leaves(ref_state.params)
    ):
        np.testing.assert_allclose(a, np.asarray(b), atol=2e-4)
    for a, b in zip(
        jax.tree.leaves(results[0]["batch_stats"]),
        jax.tree.leaves(ref_state.batch_stats),
    ):
        np.testing.assert_allclose(a, np.asarray(b), atol=1e-4)
