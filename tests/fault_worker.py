"""Fault-injection worker for tests/test_distributed.py.

``python fault_worker.py <coordinator> <nproc> <pid> <snapshot> <crash_epoch>
<resume>`` — trains the engine over a 2-process global data mesh with
shared snapshots; when ``crash_epoch`` >= 0 every process hard-exits
(os._exit(7), no cleanup) right after that epoch's snapshot is written,
simulating a pod preemption mid-stage. A relaunch with ``resume=1``
must replay the uninterrupted run bit-for-bit (snapshots carry the rng
streams — engine._save_snapshot).
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nnacousticmodeling_tpu.models import get_network
from nnacousticmodeling_tpu.parallel import initialize_distributed, pod_mesh
from nnacousticmodeling_tpu.train import TrainConfig, TrainStage, train_network


def main():
    coordinator, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    snapshot, crash_epoch, resume = (sys.argv[4], int(sys.argv[5]),
                                     sys.argv[6] == "1")
    initialize_distributed(coordinator, nproc, pid)
    mesh = pod_mesh({"data": jax.device_count()})

    rng = np.random.default_rng(0)
    n = 64 * 16
    x = rng.standard_normal((n, 12)).astype(np.float32)
    y = rng.integers(0, 10, n).astype(np.int32)
    xd = rng.standard_normal((128, 12)).astype(np.float32)
    yd = rng.integers(0, 10, 128).astype(np.int32)
    offsets = np.arange(0, n + 1, 16, dtype=np.int64)

    def hook(stage, epoch):
        if crash_epoch >= 0 and epoch == crash_epoch:
            os._exit(7)          # hard kill: no cleanup, mid-stage

    # ff + dropout: the trajectory depends on BOTH rng streams (numpy
    # shuffles, jax dropout), so bit-equal resume proves they were
    # snapshotted and restored. (The recurrent-state variant of this
    # exactness is covered single-process in test_train.py — this box
    # has 2 cores, and two LSTM-compiling workers starve the
    # coordination-service heartbeats.)
    net = get_network("ff", 2, [32], 10, dropout=0.2)
    cfg = TrainConfig(
        stages=[TrainStage(epoch=4, optimizer="momentumsgd", batch_size=64,
                           lr=1e-2, early_stopping=False)],
        seed=0, log=None, mesh=mesh,
        snapshot_path=snapshot, resume_snapshot=resume, epoch_hook=hook)
    res = train_network(net, x, y, cfg, x_dev=xd, y_dev=yd)

    psum = float(sum(np.abs(np.asarray(l)).sum()
                     for l in jax.tree_util.tree_leaves(res.params)))
    print("RESULT " + json.dumps({
        "pid": pid,
        "param_sum": round(psum, 6),
        "history": [[h["stage"], h["epoch"], round(h["main/loss"], 6),
                     round(h.get("validation/main/loss", -1.0), 6)]
                    for h in res.history],
    }), flush=True)


if __name__ == "__main__":
    main()
