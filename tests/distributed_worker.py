"""Multi-host worker for tests/test_distributed.py.

Launched as ``python distributed_worker.py <coordinator> <nproc> <pid>``
with 4 virtual CPU devices per process. Runs:

1. the REAL training engine (train_network) under a global data mesh
   spanning both processes — the reference is single-process/single-GPU
   (train.py:122-125), this is the multi-host story SURVEY §2.4 mandates;
2. one library-level sharded step fed per-process via
   local_batch_slice + global_batch_array (no host ever holds the
   global batch);
3. fold-parallel training over a HIERARCHICAL ("fold", "data") mesh
   whose fold axis crosses the process boundary — the DCN shape of
   SURVEY §2.4 (fold-ensemble over DCN, data-parallel over ICI).

Prints one ``RESULT {...}`` JSON line for the parent to compare.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nnacousticmodeling_tpu.models import get_network
from nnacousticmodeling_tpu.parallel import (
    global_batch_array, initialize_distributed, local_batch_slice,
    make_sharded_train_step, pod_mesh, replicated_array,
)
from nnacousticmodeling_tpu.train import TrainConfig, TrainStage, train_network
from nnacousticmodeling_tpu.train.optimizers import make_optimizer


def main():
    coordinator, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    initialize_distributed(coordinator, nproc, pid)
    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc
    assert jax.local_device_count() == 4

    mesh = pod_mesh({"data": jax.device_count()})

    # ---- 1. the real engine under the global mesh ----------------------
    rng = np.random.default_rng(0)
    x = rng.standard_normal((256, 12)).astype(np.float32)
    y = rng.integers(0, 10, 256).astype(np.int32)
    net = get_network("ff", 2, [32], 10)
    cfg = TrainConfig(
        stages=[TrainStage(epoch=2, optimizer="momentumsgd", batch_size=32,
                           lr=1e-2, early_stopping=False)],
        seed=0, log=None, use_validation=False, mesh=mesh)
    res = train_network(net, x, y, cfg)
    losses = [h["main/loss"] for h in res.history]

    # ---- 2. per-host batch feeding (no global batch on any host) ------
    params = net.init(jax.random.PRNGKey(0), 12)
    params = replicated_array(mesh, jax.tree_util.tree_map(np.asarray,
                                                           params))
    opt = make_optimizer("sgd", 1e-2)
    opt_state = replicated_array(
        mesh, jax.tree_util.tree_map(np.asarray, opt.init(params)))
    step = make_sharded_train_step(net, opt, mesh)
    gb = 64
    sl = local_batch_slice(gb)
    assert sl == slice(pid * (gb // nproc), (pid + 1) * (gb // nproc))
    xb = global_batch_array(mesh, x[:gb][sl])
    yb = global_batch_array(mesh, y[:gb][sl])
    _, _, step_loss = step(params, opt_state, xb, yb, None)

    # ---- 3. hierarchical fold x data mesh (fold crosses processes) ----
    from nnacousticmodeling_tpu.train.fold_parallel import (
        train_folds_parallel,
    )
    hmesh = pod_mesh({"fold": 2, "data": jax.device_count() // 2})
    offsets = np.arange(0, 257, 16, dtype=np.int64)     # 16 utts x 16
    utt_folds = np.arange(16) % 2
    fcfg = TrainConfig(
        stages=[TrainStage(epoch=2, optimizer="momentumsgd", batch_size=16,
                           lr=1e-2, early_stopping=False)],
        seed=0, log=None, use_validation=False)
    fold_params = train_folds_parallel(
        net, x, y, offsets, utt_folds, 2, fcfg, mesh=hmesh)
    fold_sums = [
        round(float(sum(np.abs(l).sum()
                        for l in jax.tree_util.tree_leaves(p))), 4)
        for p in fold_params]

    # ---- 4. early-stop compaction across the process boundary ---------
    # stopped folds must drop out of the vmapped stack even when the
    # fold axis spans processes (VERDICT r03 item 5); the compacted
    # run's trained params must equal the masked-lane run's exactly
    xdev = rng.standard_normal((64, 12)).astype(np.float32)
    ydev = rng.integers(0, 10, 64).astype(np.int32)
    utt_folds4 = np.arange(16) % 4

    def run_es(compact):
        logs = []
        ecfg = TrainConfig(
            stages=[TrainStage(epoch=8, optimizer="momentumsgd",
                               batch_size=16, lr=0.5, early_stopping=True)],
            seed=0, log=logs.append, use_validation=True)
        ps = train_folds_parallel(
            net, x, y, offsets, utt_folds4, 4, ecfg, x_dev=xdev, y_dev=ydev,
            mesh=hmesh, compact=compact)
        sums = [round(float(sum(np.abs(l).sum()
                                for l in jax.tree_util.tree_leaves(p))), 4)
                for p in ps]
        return sums, any("compacted" in l for l in logs)

    es_compact_sums, es_compacted = run_es(True)
    es_masked_sums, _ = run_es(False)

    print("RESULT " + json.dumps({
        "pid": pid,
        "losses": [round(float(v), 6) for v in losses],
        "step_loss": round(float(step_loss), 6),
        "fold_sums": fold_sums,
        "es_compact_sums": es_compact_sums,
        "es_masked_sums": es_masked_sums,
        "es_compacted": es_compacted,
    }), flush=True)


if __name__ == "__main__":
    main()
