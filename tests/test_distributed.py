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

pytestmark = pytest.mark.slow  # 2-process jax.distributed spawns

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


def test_hierarchical_fold_data_mesh(worker_results):
    """Fold-parallel training over a 2-process ("fold", "data") mesh —
    the fold axis crossing the process/DCN boundary — must agree across
    hosts and with the same mesh shape run in ONE process (SURVEY §2.4
    DCN row)."""
    import jax
    assert worker_results[0]["fold_sums"] == worker_results[1]["fold_sums"]
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from nnacousticmodeling_tpu.models import get_network
    from nnacousticmodeling_tpu.parallel import make_mesh
    from nnacousticmodeling_tpu.train import TrainConfig, TrainStage
    from nnacousticmodeling_tpu.train.fold_parallel import (
        train_folds_parallel,
    )

    rng = np.random.default_rng(0)
    x = rng.standard_normal((256, 12)).astype(np.float32)
    y = rng.integers(0, 10, 256).astype(np.int32)
    offsets = np.arange(0, 257, 16, dtype=np.int64)
    utt_folds = np.arange(16) % 2
    cfg = TrainConfig(
        stages=[TrainStage(epoch=2, optimizer="momentumsgd", batch_size=16,
                           lr=1e-2, early_stopping=False)],
        seed=0, log=None, use_validation=False)
    fold_params = train_folds_parallel(
        get_network("ff", 2, [32], 10), x, y, offsets, utt_folds, 2, cfg,
        mesh=make_mesh({"fold": 2, "data": 4}))
    local_sums = [
        float(sum(np.abs(l).sum() for l in jax.tree_util.tree_leaves(p)))
        for p in fold_params]
    assert worker_results[0]["fold_sums"] == pytest.approx(local_sums,
                                                           rel=2e-4)


FAULT_WORKER = str(Path(__file__).parent / "fault_worker.py")


def _launch_fault(snapshot, crash_epoch, resume, timeout=420):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, FAULT_WORKER, f"127.0.0.1:{port}", "2", str(p),
             snapshot, str(crash_epoch), "1" if resume else "0"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True)
        for p in range(2)
    ]
    results, rcs = {}, []
    for p, proc in enumerate(procs):
        try:
            out, err = proc.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        rcs.append(proc.returncode)
        if proc.returncode == 0:
            for line in out.splitlines():
                if line.startswith("RESULT "):
                    r = json.loads(line[len("RESULT "):])
                    results[r["pid"]] = r
        elif proc.returncode != 7:
            raise AssertionError(
                f"worker {p} rc={proc.returncode}\nstderr:\n{err[-3000:]}")
    return rcs, results


def test_fault_injection_resume(tmp_path):
    """Kill both workers mid-stage (hard os._exit right after epoch 2's
    snapshot — a pod preemption), relaunch with --resume, and require
    the resumed run to land EXACTLY where the uninterrupted run lands:
    same per-epoch losses for the replayed epochs and identical final
    params (snapshots carry params, optimizer state, best-model
    tracking, and both rng streams — VERDICT r03 item 7)."""
    # uninterrupted reference run (its own snapshot dir)
    rcs, ref = _launch_fault(str(tmp_path / "ref.npz"), -1, False)
    assert rcs == [0, 0] and 0 in ref
    # crashed run: both processes must die with the injected code
    snap = str(tmp_path / "snap.npz")
    rcs, res = _launch_fault(snap, 2, False)
    assert rcs == [7, 7] and not res
    assert (tmp_path / "snap.npz").exists()
    # resume: completes and replays the uninterrupted trajectory
    rcs, res = _launch_fault(snap, -1, True)
    assert rcs == [0, 0] and 0 in res and 1 in res
    # epochs 3..4 ran after resume, matching the reference exactly
    replayed = res[0]["history"]
    assert [h[1] for h in replayed] == [3, 4]
    assert replayed == ref[0]["history"][2:]
    assert res[0]["param_sum"] == ref[0]["param_sum"]
    assert res[1]["param_sum"] == res[0]["param_sum"]


def test_multiprocess_fold_compaction(worker_results):
    """Early-stopped folds are compacted out of the vmapped stack even
    when the fold axis crosses the process boundary (VERDICT r03 item
    5): a compaction event must fire, both processes must agree, and
    the trained params must equal the masked-frozen-lane run exactly."""
    r0, r1 = worker_results[0], worker_results[1]
    assert r0["es_compacted"] and r1["es_compacted"]
    assert r0["es_compact_sums"] == r1["es_compact_sums"]
    assert r0["es_compact_sums"] == pytest.approx(r0["es_masked_sums"],
                                                  rel=1e-6)


def test_train_cli_distributed_flag(tmp_path):
    """The user-facing pod wiring (scripts/pod/launch_slurm.sh):
    train_cli --distributed/--coordinator must bring up jax.distributed
    across 2 processes, train over a global data mesh, and have ONLY
    process 0 write the artifacts; the model must match a
    single-process run of the same CLI."""
    rng = np.random.default_rng(0)
    np.save(tmp_path / "data_train.npy",
            rng.standard_normal((256, 12)).astype(np.float32))
    np.save(tmp_path / "targets_train.npy",
            rng.integers(0, 10, 256).astype(np.int32))
    base = ["-n", "ff", "-l", "1", "-u", "16", "--num-classes", "10",
            "--data-dir", str(tmp_path), "--target-dir", str(tmp_path),
            "--ft", "-", "--splice", "0",
            "-e", "2", "-o", "momentumsgd", "-b", "32", "--lr", "1e-2",
            "--early-stopping", "false", "--no-validation",
            "--no-progress", "--noplot", "--mesh", "data=8"]
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = str(Path(__file__).parent.parent)
    procs = [
        subprocess.Popen(
            [sys.executable, "-m",
             "nnacousticmodeling_tpu.pipeline.train_cli",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(p),
             "--out", str(tmp_path / f"out_{p}")] + base,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True, cwd=str(tmp_path))
        for p in range(2)
    ]
    for p, proc in enumerate(procs):
        try:
            out, err = proc.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert proc.returncode == 0, f"proc {p}:\n{err[-3000:]}"
    # only process 0 wrote artifacts
    assert (tmp_path / "out_0" / "model.npz").exists()
    assert not (tmp_path / "out_1").exists()

    # single-process run with the same global mesh shape
    import jax
    if len(jax.devices()) < 8:
        return
    from nnacousticmodeling_tpu.pipeline import train_cli
    res = train_cli.main(base + ["--out", str(tmp_path / "out_sp")])
    import numpy as _np
    pod = dict(_np.load(tmp_path / "out_0" / "model.npz"))
    sp = dict(_np.load(tmp_path / "out_sp" / "model.npz"))
    assert set(pod) == set(sp)
    for k in pod:
        _np.testing.assert_allclose(pod[k], sp[k], rtol=2e-4, atol=1e-6)


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
