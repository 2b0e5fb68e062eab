"""Staged training engine.

Re-designs the reference trainer (train.py:285-389 + Chainer Trainer)
as jitted device-resident steps:

* feed-forward: per-epoch frame shuffle (SerialIterator semantics), one
  jitted update per (batch_size) minibatch gathered on device — no
  host->device copy per step (the reference's BPTTUpdater re-uploads
  every minibatch, orcus_chainer_util.py:124-125);
* recurrent: multi-stream truncated BPTT — B streams over the
  sentence-shuffled corpus at stride N//B (SequenceShuffleIterator
  semantics, including streams crossing utterance boundaries without
  state reset), each update one jitted gather + ``lax.scan`` over
  ``bprop_len`` steps, recurrent state carried across updates and
  epochs within a stage, reset at stage starts (train.py:292-293);
* per-stage optimizer rebuild (sgd/momentumsgd/adam), early stopping on
  validation loss with the reference's trigger semantics
  (chainer_kw_utils.py:75-85, eps=-0.001), and the stage-end model
  selection rule: early-stopping stages keep the last model, fixed-epoch
  stages reload the best-validation model (train.py:378-389).

Known conscious deviations (documented, behavior-neutral at the metric
level): epochs drop the final partial batch instead of wrapping past
the epoch boundary, reshuffles happen at epoch starts rather than
mid-update, and recurrent validation runs on a fresh state instead of
leaking training state into the evaluator.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .optimizers import make_optimizer
from .stages import TrainStage
from .streams import sentence_shuffle_indices, stream_batch_indices


@dataclass
class TrainConfig:
    stages: List[TrainStage]
    bprop_len: int = 20
    seed: int = 0
    use_validation: bool = True
    log: Optional[Callable[[str], None]] = print
    eval_chunk: int = 8192
    # per-epoch full-state snapshots for crash recovery (the reference's
    # extensions.snapshot + --resume, train.py:340-342,371-373)
    snapshot_path: Optional[str] = None
    resume_snapshot: bool = False
    # mixed precision: "bfloat16" computes forward/backward in bf16 on
    # the MXU while master params, gradients-at-rest, optimizer state,
    # and the loss stay float32 (the parity default is pure f32; the
    # reference is f32-only — Chainer 3.5 + CuPy, README.md:90-95)
    compute_dtype: str = "float32"
    # distribution: a jax.sharding.Mesh shards every update step —
    # minibatches over ``data_axis`` (gradient all-reduce by XLA) and,
    # when ``model_axis`` names a mesh axis, weight matrices
    # column-parallel over their output dims (parallel/mesh.py). The
    # reference is strictly single-device (train.py:122-125).
    mesh: Any = None
    data_axis: str = "data"
    model_axis: Optional[str] = None
    # the reference's --shuffle-sequences flag (train.py:49,307) also
    # applies the whole-sentence stream layout to FEED-FORWARD nets:
    # each minibatch takes one frame from each of B streams over the
    # sentence-shuffled corpus instead of an iid frame permutation
    shuffle_sequences: bool = False
    # called after each epoch's snapshot write as hook(stage, epoch);
    # fault-injection hook for crash/preemption testing
    epoch_hook: Optional[Callable[[int, int], None]] = None
    # epoch dispatch mode: "scan" compiles the whole epoch as ONE
    # lax.scan-of-updates program (one dispatch per epoch); "per_step"
    # dispatches one jitted update per TBPTT minibatch. Measured on
    # v5e (BENCH r04/r05): scan's weakness is mild and constant (the
    # scanned carry of the full param/opt state costs ~2-10% in XLA
    # copies), while per_step's per-dispatch overhead through the
    # remote tunnel ranges from free (plain-XLA f32) to CATASTROPHIC
    # for Pallas-containing programs (33 vs 8.7 ms/step bf16 TBPTT) —
    # so "auto" resolves to scan, the safe measured default. Both
    # modes are recorded every round in the bench
    # (train_lstm_step_ms_f32 vs train_lstm_step_ms_f32_per_step).
    dispatch: str = "auto"
    # async metrics: when True, per-epoch train loss/accuracy stay
    # DEVICE scalars until training ends (one blocking fetch at the
    # end) — the accelerator never stalls on a per-epoch metric fetch.
    # On a remote-tunnel host the per-epoch fetch costs a full round
    # trip (~30 ms here = ~1.25 ms/step at 24 steps/epoch), which is
    # pure measurement/serving overhead. Per-epoch log lines and
    # early-stopping still force fetches where enabled; history
    # elapsed_time then records DISPATCH time, not execution.
    defer_metrics: bool = False


def _resolve_dispatch(config) -> str:
    mode = getattr(config, "dispatch", "auto")
    if mode == "auto":
        return "scan"
    if mode not in ("per_step", "scan"):
        raise ValueError(f"dispatch must be auto|per_step|scan, got {mode}")
    return mode


@dataclass
class TrainResult:
    params: Any
    history: List[dict] = field(default_factory=list)


def _snapshot_file(path):
    return path if path.endswith(".npz") else path + ".npz"


def _save_snapshot(path, params, opt_state, stage, epoch, best_val,
                   key=None, rng_np=None, best_params=None, stopped=False,
                   rnn_state=None):
    """Full training state: params (by path keys), optimizer leaves (by
    index), scalar progress markers, and — for bit-deterministic resume
    — the jax rng key, the numpy bit-generator state, and the running
    best-validation params. A resumed run then replays the exact epoch
    trajectory an uninterrupted run would have produced (shuffles,
    dropout, and best-model selection included)."""
    path = _snapshot_file(path)
    from .checkpoint import _path_str
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    blob = {_path_str(pth): np.asarray(leaf) for pth, leaf in flat}
    for i, leaf in enumerate(jax.tree_util.tree_leaves(opt_state)):
        blob[f"__opt_{i}__"] = np.asarray(leaf)
    blob["__stage__"] = np.asarray(stage)
    blob["__epoch__"] = np.asarray(epoch)
    blob["__best_val__"] = np.asarray(
        best_val if best_val is not None else np.nan)
    blob["__stopped__"] = np.asarray(bool(stopped))
    if key is not None:
        blob["__key__"] = np.asarray(key)
    if rng_np is not None:
        import json
        state = json.dumps(rng_np.bit_generator.state)
        blob["__rng_state__"] = np.frombuffer(state.encode(), dtype=np.uint8)
    if best_params is not None:
        bflat = jax.tree_util.tree_flatten_with_path(best_params)[0]
        for pth, leaf in bflat:
            blob["__best__" + _path_str(pth)] = np.asarray(leaf)
    if rnn_state is not None:
        # recurrent stages thread the B-stream hidden state across
        # epochs (streams never reset, orcus_chainer_util.py:66); resume
        # must continue from it, not from zeros
        for i, leaf in enumerate(jax.tree_util.tree_leaves(rnn_state)):
            blob[f"__st_{i}__"] = np.asarray(leaf)
    # crash-safe: write to a sibling tmp file and rename into place, so
    # a kill mid-save can never leave a truncated snapshot under the
    # real name (rename within a directory is atomic on POSIX)
    import os
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **blob)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _load_snapshot(path):
    """Load a snapshot blob, returning None (with a warning) instead of
    crashing when the file is truncated or otherwise unreadable — e.g.
    a snapshot written by a pre-atomic-write version that died
    mid-save."""
    try:
        with open(path, "rb") as f:
            blob = dict(np.load(f, allow_pickle=False))
        # touch the progress markers so a zip with a valid directory
        # but a corrupt member still fails here, not mid-resume
        int(blob["__stage__"]), int(blob["__epoch__"])
        return blob
    except Exception as e:  # zipfile.BadZipFile, ValueError, KeyError, ...
        import warnings
        warnings.warn(f"snapshot {path} is unreadable ({e!r}); "
                      f"starting from scratch")
        return None


def _restore_opt_state(blob, template_opt_state):
    leaves, treedef = jax.tree_util.tree_flatten(template_opt_state)
    restored = []
    for i, leaf in enumerate(leaves):
        arr = blob[f"__opt_{i}__"]
        if arr.shape != tuple(np.shape(leaf)):
            raise ValueError(f"snapshot opt leaf {i} shape mismatch")
        restored.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, restored)


def _compute_dtype(config):
    dt = jnp.dtype(config.compute_dtype)
    if dt not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        raise ValueError(f"unsupported compute dtype {config.compute_dtype}")
    return None if dt == jnp.dtype(jnp.float32) else jnp.bfloat16


def _mixed_apply(dt, apply):
    """Wrap an apply fn for bf16 compute with f32 master params.

    Params and inputs are cast to ``dt`` inside the differentiated
    function, so autodiff emits bf16 matmuls but the cotangents cast
    back to f32 at the leaves (standard mixed-precision recipe: f32
    master weights + optimizer state, bf16 MXU compute)."""
    if dt is None:
        return apply
    from ..models.precision import cast_params

    def wrapped(p, xb, rng, train):
        logits = apply(cast_params(p, dt), xb.astype(dt), rng, train)
        return logits.astype(jnp.float32)
    return wrapped


def _batch_constrainer(config):
    """Sharding constraint for minibatch tensors: rows over the data
    axis. Identity without a mesh."""
    if config.mesh is None:
        return lambda a: a
    from jax.sharding import NamedSharding, PartitionSpec as P

    def constrain(a):
        spec = P(config.data_axis, *([None] * (a.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            a, NamedSharding(config.mesh, spec))
    return constrain


def _mesh_place(config, params, xd, yd, xvd, yvd):
    """Place params per the TP/replication plan and pin the corpus
    replicated on the mesh so jitted gathers see consistent shardings."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel.mesh import param_shardings
    mesh = config.mesh
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    if config.data_axis not in axis_sizes:
        raise ValueError(f"mesh has no {config.data_axis!r} axis")
    for stage in config.stages:
        if stage.batch_size % axis_sizes[config.data_axis] != 0:
            raise ValueError(
                f"batch size {stage.batch_size} not divisible by data-axis "
                f"size {axis_sizes[config.data_axis]}")
    params = jax.device_put(
        params, param_shardings(mesh, params, config.model_axis))
    repl = NamedSharding(mesh, P())
    put = lambda a: None if a is None else jax.device_put(a, repl)
    return params, put(xd), put(yd), put(xvd), put(yvd)


def _loss_acc(logits, targets):
    loss = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
    acc = (jnp.argmax(logits, axis=-1) == targets).astype(jnp.float32)
    return loss.mean(), acc.mean()


def train_network(
    net,
    x: np.ndarray,
    y: np.ndarray,
    config: TrainConfig,
    offsets: Optional[np.ndarray] = None,
    x_dev: Optional[np.ndarray] = None,
    y_dev: Optional[np.ndarray] = None,
    init_params: Any = None,
    apply_fn: Optional[Callable] = None,
) -> TrainResult:
    """Train ``net`` through the configured stages.

    ``apply_fn(params, xb, rng, train) -> logits`` may override the
    network's own apply (used for RPL heads which train on logits).
    """
    rng_np = np.random.default_rng(config.seed)
    key = jax.random.PRNGKey(config.seed)
    log = config.log or (lambda s: None)

    if init_params is None:
        key, k0 = jax.random.split(key)
        params = net.init(k0, x.shape[1])
    else:
        params = init_params

    xd = jnp.asarray(x)
    yd = jnp.asarray(y)
    use_val = config.use_validation and x_dev is not None
    xvd = jnp.asarray(x_dev) if use_val else None
    yvd = jnp.asarray(y_dev) if use_val else None
    if config.mesh is not None:
        params, xd, yd, xvd, yvd = _mesh_place(config, params, xd, yd,
                                               xvd, yvd)

    recurrent = getattr(net, "is_recurrent", False) and apply_fn is None
    history: List[dict] = []
    # evaluation functions are stage-invariant (FF) or depend only on
    # the stage batch size (RNN stream layout); cache them so XLA does
    # not recompile the eval graph at every stage
    eval_cache: dict = {}

    # resume bookkeeping: skip (stage, epoch) pairs already completed
    resume_stage = resume_epoch = -1
    resume_blob = None
    if config.snapshot_path and config.resume_snapshot:
        import os
        snap = _snapshot_file(config.snapshot_path)
        if os.path.exists(snap):
            resume_blob = _load_snapshot(snap)
        if resume_blob is not None:
            resume_stage = int(resume_blob["__stage__"])
            resume_epoch = int(resume_blob["__epoch__"])
            log(f"Resuming from snapshot: stage {resume_stage}, "
                f"epoch {resume_epoch}")

    for si, stage in enumerate(config.stages):
        if stage.optimizer == "adam":
            log(f"=== Training stage {si}: epoch = {stage.epoch}, batch size = "
                f"{stage.batch_size}, optimizer = adam, early stopping = "
                f"{stage.early_stopping}")
        else:
            log(f"=== Training stage {si}: epoch = {stage.epoch}, batch size = "
                f"{stage.batch_size}, optimizer = {stage.optimizer}, learning "
                f"rate = {stage.lr}, early stopping = {stage.early_stopping}")
        opt = make_optimizer(stage.optimizer, stage.lr)
        opt_state = opt.init(params)
        bs = stage.batch_size

        if recurrent:
            run_epoch, evaluate, state = _make_rnn_stage(
                net, opt, xd, yd, offsets, config, bs,
                (xvd, yvd) if use_val else None, eval_cache)
        else:
            run_epoch, evaluate = _make_ff_stage(
                net, opt, xd, yd, config, bs,
                (xvd, yvd) if use_val else None, apply_fn, eval_cache,
                offsets=offsets)
            state = None

        best_val = None
        best_params = None
        stopped_early = False
        start_epoch = 0
        if resume_blob is not None:
            if si < resume_stage:
                continue  # whole stage already done; params restored below
            # first not-fully-skipped stage: restore params always; the
            # optimizer state only when resuming mid-stage (a stage
            # boundary rebuilds the optimizer anyway). Note: snapshots
            # hold epoch-end params, so the best-validation stage-end
            # selection only covers epochs run after the resume point.
            from .checkpoint import load_pytree
            params = load_pytree(_snapshot_file(config.snapshot_path), params)
            if config.mesh is not None:
                from ..parallel.mesh import param_shardings
                params = jax.device_put(params, param_shardings(
                    config.mesh, params, config.model_axis))
            # bit-deterministic resume: restore the rng streams and the
            # running best-model tracking exactly as the uninterrupted
            # run would have them (absent in pre-r04 snapshots)
            if "__key__" in resume_blob:
                key = jnp.asarray(resume_blob["__key__"])
            if "__rng_state__" in resume_blob:
                import json
                rng_np.bit_generator.state = json.loads(
                    resume_blob["__rng_state__"].tobytes().decode())
            from .checkpoint import _path_str
            flatp, treedef_p = jax.tree_util.tree_flatten_with_path(params)
            bkeys = ["__best__" + _path_str(pth) for pth, _ in flatp]
            if all(k in resume_blob for k in bkeys):
                bleaves = [jnp.asarray(resume_blob[k]) for k in bkeys]
                best_params = jax.tree_util.tree_unflatten(
                    treedef_p, bleaves)
                if config.mesh is not None:
                    from ..parallel.mesh import param_shardings
                    best_params = jax.device_put(
                        best_params, param_shardings(
                            config.mesh, best_params, config.model_axis))
            stage_stopped = bool(resume_blob.get(
                "__stopped__", np.asarray(False)))
            if resume_epoch < stage.epoch and not stage_stopped:
                opt_state = _restore_opt_state(resume_blob, opt_state)
                if state is not None and "__st_0__" in resume_blob:
                    sleaves, streedef = jax.tree_util.tree_flatten(state)
                    state = jax.tree_util.tree_unflatten(streedef, [
                        jnp.asarray(resume_blob[f"__st_{i}__"])
                        for i in range(len(sleaves))])
                bv = float(resume_blob["__best_val__"])
                best_val = bv if np.isfinite(bv) else None
                start_epoch = resume_epoch
            else:
                # stage fully done pre-crash (epoch budget exhausted or
                # early-stopped — the snapshot records the stop)
                start_epoch = stage.epoch
                stopped_early = stage_stopped
                bv = float(resume_blob["__best_val__"])
                best_val = bv if np.isfinite(bv) else None
            resume_blob = None
        for epoch in range(start_epoch, stage.epoch):
            t0 = time.time()
            key, ek = jax.random.split(key)
            if recurrent:
                params, opt_state, state, tr_loss, tr_acc = run_epoch(
                    params, opt_state, state, ek, rng_np)
            else:
                params, opt_state, tr_loss, tr_acc = run_epoch(
                    params, opt_state, ek, rng_np)
            entry = {"stage": si, "epoch": epoch + 1,
                     "main/loss": tr_loss, "main/accuracy": tr_acc,
                     "elapsed_time": time.time() - t0}
            if use_val:
                val_loss, val_acc = evaluate(params)
                entry["validation/main/loss"] = float(val_loss)
                entry["validation/main/accuracy"] = float(val_acc)
            history.append(entry)
            if config.log is not None:
                def _fmt(k, v):
                    if isinstance(v, (bool, int, str)):
                        return f"{k}={v}"
                    if isinstance(v, float):
                        return f"{k}={v:.4f}"
                    # device scalar under defer_metrics: formatting it
                    # would force the fetch the flag exists to avoid —
                    # values land in history at training end
                    return f"{k}=<deferred>"
                log("  " + "  ".join(_fmt(k, v)
                                     for k, v in entry.items()))

            stop = False
            if use_val:
                val = entry["validation/main/loss"]
                if not stage.early_stopping:
                    if best_val is None or val < best_val:
                        best_val = val
                        best_params = jax.tree_util.tree_map(jnp.copy, params)
                else:
                    # EarlyStoppingTrigger semantics (eps = -0.001):
                    # stop when val exceeds the best seen by > 1e-3
                    if best_val is None:
                        best_val = val
                    else:
                        stop = (best_val - val) < -0.001
                        if val < best_val:
                            best_val = val

            if config.snapshot_path:
                # the stream state is sharded over the data axis; on a
                # multi-process mesh replicate it first so the writer
                # can read it (the all-gather is collective — EVERY
                # process must run it, only process 0 then writes)
                snap_state = state
                if (state is not None and config.mesh is not None
                        and jax.process_count() > 1):
                    from jax.sharding import NamedSharding
                    from jax.sharding import PartitionSpec as _P
                    rep = NamedSharding(config.mesh, _P())
                    snap_state = jax.jit(
                        lambda t: t,
                        out_shardings=jax.tree_util.tree_map(
                            lambda _: rep, state))(state)
                if jax.process_index() == 0:
                    # multi-host: one writer (every process still READS
                    # the shared snapshot on resume). Saved AFTER the
                    # best-model update so a resume replays the
                    # uninterrupted trajectory exactly (rng included).
                    _save_snapshot(config.snapshot_path, params, opt_state,
                                   si, epoch + 1, best_val, key=key,
                                   rng_np=rng_np, best_params=best_params,
                                   stopped=stop, rnn_state=snap_state)
            if config.epoch_hook is not None:
                config.epoch_hook(si, epoch + 1)
            if stop:
                stopped_early = True
                break

        if not stage.early_stopping and best_params is not None:
            # fixed-epoch stages keep the best-validation model
            # (train.py:386-389)
            params = best_params
        # early-stopping stages keep the last model (train.py:378-384)
        del opt_state

    _finalize_history(history)
    return TrainResult(params=params, history=history)



def _metric_conv(config):
    """float (blocking fetch) or identity (deferred device scalar)."""
    return (lambda v: v) if getattr(config, "defer_metrics", False) else float


def _finalize_history(history):
    """Force any deferred device-scalar metrics to host floats (the
    single blocking fetch of a defer_metrics run)."""
    for h in history:
        for k, v in h.items():
            if not isinstance(v, (bool, int, float, str)):
                h[k] = float(v)


def _per_step_epoch(step_fn, carry, idx_all, key, xd, yd, conv=float):
    """Shared per-minibatch dispatch loop (FF and RNN stages): same
    rng split sequence and update math as the scanned epoch program.
    ``carry`` is (params, opt_state) or (params, opt_state, state)."""
    idx_dev = jnp.asarray(idx_all)
    losses, accs = [], []
    for s in range(idx_dev.shape[0]):
        key, sk = jax.random.split(key)
        *carry, loss, acc = step_fn(*carry, idx_dev[s], sk, xd, yd)
        losses.append(loss)
        accs.append(acc)
    return (tuple(carry), conv(jnp.stack(losses).mean()),
            conv(jnp.stack(accs).mean()))


# ---------------------------------------------------------------------------
# feed-forward stage
# ---------------------------------------------------------------------------

def _make_ff_stage(net, opt, xd, yd, config, bs, val, apply_fn,
                   eval_cache=None, offsets=None):
    apply = apply_fn or (lambda p, xb, rng, train: net.apply(
        p, xb, rng=rng, train=train))
    apply = _mixed_apply(_compute_dtype(config), apply)
    constrain = _batch_constrainer(config)

    def update_core(params, opt_state, idx, rng, xd, yd):
        xb = constrain(jnp.take(xd, idx, axis=0))
        yb = constrain(jnp.take(yd, idx, axis=0))

        def loss_fn(p):
            logits = apply(p, xb, rng, True)
            return _loss_acc(logits, yb)

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    # whole epoch as ONE dispatched program: the epoch's (steps, bs)
    # index tensor is uploaded once and a lax.scan chains the updates —
    # no per-minibatch Python dispatch (the reference re-uploads and
    # re-dispatches every minibatch, orcus_chainer_util.py:124-125).
    # The rng key chain is split inside the scan carry, reproducing the
    # per-step host split sequence value-for-value.
    @jax.jit
    def epoch_fn(params, opt_state, idx_all, key, xd, yd):
        def body(carry, idx):
            params, opt_state, key = carry
            key, sk = jax.random.split(key)
            params, opt_state, loss, acc = update_core(
                params, opt_state, idx, sk, xd, yd)
            return (params, opt_state, key), (loss, acc)

        (params, opt_state, _), (losses, accs) = jax.lax.scan(
            body, (params, opt_state, key), idx_all)
        return params, opt_state, losses.mean(), accs.mean()

    n = int(xd.shape[0])
    steps = max(n // bs, 1)
    step_fn = jax.jit(update_core)

    def _epoch_indices(rng_np):
        if config.shuffle_sequences:
            # reference --shuffle-sequences on FF nets: B streams over
            # the sentence-shuffled corpus, one frame each per batch
            return stream_batch_indices(
                sentence_shuffle_indices(offsets, n, rng_np),
                bs, 0, steps).T                       # (steps, bs)
        perm = rng_np.permutation(n)
        return perm[:steps * bs].reshape(steps, bs)

    def run_epoch(params, opt_state, key, rng_np):
        idx_all = _epoch_indices(rng_np)
        conv = _metric_conv(config)
        if _resolve_dispatch(config) == "per_step":
            (params, opt_state), loss, acc = _per_step_epoch(
                step_fn, (params, opt_state), idx_all, key, xd, yd,
                conv=conv)
            return params, opt_state, loss, acc
        params, opt_state, loss, acc = epoch_fn(
            params, opt_state, jnp.asarray(idx_all), key, xd, yd)
        return params, opt_state, conv(loss), conv(acc)

    if val is None:
        return run_epoch, None
    if eval_cache is not None and "ff" in eval_cache:
        return run_epoch, eval_cache["ff"]
    xv, yv = val

    @jax.jit
    def eval_chunk_fn(params, xb, yb, mask):
        logits = apply(params, xb, None, False)
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, yb)
        correct = (jnp.argmax(logits, -1) == yb).astype(jnp.float32)
        return (loss * mask).sum(), (correct * mask).sum()

    def evaluate(params):
        nv = int(xv.shape[0])
        chunk = config.eval_chunk
        tot_l = tot_c = 0.0
        for beg in range(0, nv, chunk):
            end = min(beg + chunk, nv)
            xb = xv[beg:end]
            yb = yv[beg:end]
            mask = jnp.ones(end - beg, jnp.float32)
            if end - beg < chunk:
                pad = chunk - (end - beg)
                xb = jnp.pad(xb, ((0, pad), (0, 0)))
                yb = jnp.pad(yb, (0, pad))
                mask = jnp.pad(mask, (0, pad))
            l, c = eval_chunk_fn(params, xb, yb, mask)
            tot_l += float(l)
            tot_c += float(c)
        return tot_l / nv, tot_c / nv

    if eval_cache is not None:
        eval_cache["ff"] = evaluate
    return run_epoch, evaluate


# ---------------------------------------------------------------------------
# recurrent (multi-stream TBPTT) stage
# ---------------------------------------------------------------------------

def _make_rnn_stage(net, opt, xd, yd, offsets, config, bs, val,
                    eval_cache=None):
    L = config.bprop_len
    n = int(xd.shape[0])
    dt = _compute_dtype(config)
    if dt is None:
        seq_apply = net.apply_sequence
        state_cast = lambda s: s
    else:
        from ..models.precision import cast_params

        def seq_apply(p, xb, state, rng=None, train=False):
            logits, new_state = net.apply_sequence(
                cast_params(p, dt), xb.astype(dt), state, rng=rng,
                train=train)
            return logits.astype(jnp.float32), new_state

        def state_cast(s):
            return jax.tree_util.tree_map(
                lambda a: a.astype(dt)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, s)

    constrain = _batch_constrainer(config)

    def update_core(params, opt_state, state, idx, rng, xd, yd):
        xb = constrain(jnp.take(xd, idx.reshape(-1), axis=0).reshape(bs, L, -1))
        yb = constrain(jnp.take(yd, idx.reshape(-1), axis=0).reshape(bs, L))

        def loss_fn(p):
            logits, new_state = seq_apply(p, xb, state, rng=rng,
                                          train=True)
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, yb)
            # Chainer BPTTUpdater: sum over bprop steps of batch-mean loss
            total = loss.mean(axis=0).sum()
            acc = (jnp.argmax(logits, -1) == yb).astype(jnp.float32).mean()
            return total, (new_state, acc)

        (loss, (new_state, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_state, loss / L, acc

    # whole epoch in ONE dispatch (see the FF twin above): the epoch's
    # (steps, bs, L) TBPTT index tensor is device-put once and the
    # updates chain through a lax.scan with the recurrent state in the
    # carry — identical math and rng sequence to per-step dispatch.
    @jax.jit
    def epoch_fn(params, opt_state, state, idx_all, key, xd, yd):
        def body(carry, idx):
            params, opt_state, state, key = carry
            key, sk = jax.random.split(key)
            params, opt_state, state, loss, acc = update_core(
                params, opt_state, state, idx, sk, xd, yd)
            return (params, opt_state, state, key), (loss, acc)

        (params, opt_state, state, _), (losses, accs) = jax.lax.scan(
            body, (params, opt_state, state, key), idx_all)
        return params, opt_state, state, losses.mean(), accs.mean()

    steps = max(n // (bs * L), 1)
    step_fn = jax.jit(update_core)

    def run_epoch(params, opt_state, state, key, rng_np):
        shuffled = sentence_shuffle_indices(offsets, n, rng_np)
        # [s, b, t] = shuffled[(b*N/B + s*L + t) % N]
        idx_all = stream_batch_indices(shuffled, bs, 0, steps * L
                                       ).T.reshape(steps, L, bs
                                                   ).transpose(0, 2, 1)
        conv = _metric_conv(config)
        if _resolve_dispatch(config) == "per_step":
            (params, opt_state, state), loss, acc = _per_step_epoch(
                step_fn, (params, opt_state, state), idx_all, key, xd, yd,
                conv=conv)
            return params, opt_state, state, loss, acc
        params, opt_state, state, loss, acc = epoch_fn(
            params, opt_state, state, jnp.asarray(idx_all), key, xd, yd)
        return params, opt_state, state, conv(loss), conv(acc)

    state0 = state_cast(net.init_state(bs))
    if config.mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        state0 = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, NamedSharding(
                config.mesh,
                P(config.data_axis, *([None] * (a.ndim - 1))))), state0)

    if val is None:
        return run_epoch, None, state0
    if eval_cache is not None and ("rnn", bs) in eval_cache:
        return run_epoch, eval_cache[("rnn", bs)], state0
    xv, yv = val
    nv = int(xv.shape[0])
    vsteps = max(nv // bs, 1)
    # stream layout over the dev set (in order, no shuffle):
    # stream b reads frames [b*nv//bs + t]
    v_offsets = (np.arange(bs, dtype=np.int64) * nv) // bs
    v_idx = (v_offsets[:, None] + np.arange(vsteps)[None, :]) % nv  # (bs, vsteps)
    xv_streams = jnp.take(xv, jnp.asarray(v_idx.reshape(-1)), axis=0
                          ).reshape(bs, vsteps, -1)
    yv_streams = jnp.take(yv, jnp.asarray(v_idx.reshape(-1)), axis=0
                          ).reshape(bs, vsteps)

    @jax.jit
    def eval_fn(params):
        if config.mesh is not None and config.model_axis is not None:
            # one all-gather up front instead of per-step collectives
            # inside the long validation scan (train steps only scan
            # bprop_len steps; here T can be hundreds)
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(config.mesh, P())
            params = jax.tree_util.tree_map(
                lambda a: jax.lax.with_sharding_constraint(a, repl), params)
        logits, _ = seq_apply(params, xv_streams,
                              state_cast(net.init_state(bs)))
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, yv_streams).mean()
        acc = (jnp.argmax(logits, -1) == yv_streams).astype(jnp.float32).mean()
        return loss, acc

    def evaluate(params):
        l, a = eval_fn(params)
        return float(l), float(a)

    if eval_cache is not None:
        eval_cache[("rnn", bs)] = evaluate
    return run_epoch, evaluate, state0
