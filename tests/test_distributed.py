"""Multi-process ``jax.distributed`` bring-up (SURVEY §4's CPU fixture):
two processes x 4 virtual devices form one 8-device global mesh; the
REAL training engine and the per-host batch feeding path must agree
with the single-process run bit-for-bit (up to float reduction order).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = str(Path(__file__).parent / "distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch_workers(nproc=2, timeout=420):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, f"127.0.0.1:{port}", str(nproc), str(p)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True)
        for p in range(nproc)
    ]
    results = {}
    errs = []
    for p, proc in enumerate(procs):
        try:
            out, err = proc.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        errs.append(err)
        if proc.returncode != 0:
            raise AssertionError(
                f"worker {p} rc={proc.returncode}\nstderr:\n{err[-3000:]}")
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["pid"]] = r
    assert len(results) == nproc, f"missing results; stderr: {errs}"
    return results


@pytest.fixture(scope="module")
def worker_results():
    return _launch_workers()


def test_workers_agree(worker_results):
    r0, r1 = worker_results[0], worker_results[1]
    assert r0["losses"] == pytest.approx(r1["losses"], rel=1e-6)
    assert r0["step_loss"] == pytest.approx(r1["step_loss"], rel=1e-6)


def test_matches_single_process_engine(worker_results):
    """The engine's multi-host run equals the same mesh run in ONE
    process with 8 virtual devices (this test process)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from nnacousticmodeling_tpu.models import get_network
    from nnacousticmodeling_tpu.parallel import make_mesh
    from nnacousticmodeling_tpu.train import (
        TrainConfig, TrainStage, train_network,
    )

    rng = np.random.default_rng(0)
    x = rng.standard_normal((256, 12)).astype(np.float32)
    y = rng.integers(0, 10, 256).astype(np.int32)
    cfg = TrainConfig(
        stages=[TrainStage(epoch=2, optimizer="momentumsgd", batch_size=32,
                           lr=1e-2, early_stopping=False)],
        seed=0, log=None, use_validation=False,
        mesh=make_mesh({"data": 8}))
    res = train_network(get_network("ff", 2, [32], 10), x, y, cfg)
    local = [h["main/loss"] for h in res.history]
    assert worker_results[0]["losses"] == pytest.approx(local, rel=2e-4)


def test_matches_single_process_step(worker_results):
    """The per-host-fed library step (local_batch_slice +
    global_batch_array) equals the single-process sharded step."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import jax.numpy as jnp
    from nnacousticmodeling_tpu.models import get_network
    from nnacousticmodeling_tpu.parallel import (
        make_mesh, make_sharded_train_step, replicate, shard_rows,
    )
    from nnacousticmodeling_tpu.train.optimizers import make_optimizer

    rng = np.random.default_rng(0)
    x = rng.standard_normal((256, 12)).astype(np.float32)
    y = rng.integers(0, 10, 256).astype(np.int32)
    net = get_network("ff", 2, [32], 10)
    mesh = make_mesh({"data": 8})
    params = replicate(mesh, net.init(jax.random.PRNGKey(0), 12))
    opt = make_optimizer("sgd", 1e-2)
    opt_state = replicate(mesh, opt.init(params))
    step = make_sharded_train_step(net, opt, mesh)
    _, _, loss = step(params, opt_state,
                      shard_rows(mesh, jnp.asarray(x[:64])),
                      shard_rows(mesh, jnp.asarray(y[:64])), None)
    assert worker_results[0]["step_loss"] == pytest.approx(
        float(loss), rel=2e-4)
