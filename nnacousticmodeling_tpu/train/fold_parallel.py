"""Fold-parallel training: all K fold networks train simultaneously.

The reference trains its k-fold ensemble sequentially (one
``train.main`` call per fold — master_script.py:134-170). Here the K
networks train as ONE vmapped computation over a leading ``fold`` axis:

* the corpus stays shared in HBM once; each fold's training set (all
  utterances NOT in its fold, in fold-concatenation order, mirroring
  train.py:162-206) is just an index universe into it;
* every update gathers a (K, B, L) index block, runs K forwards/
  backwards as one batched program, and applies K optimizer updates —
  given a mesh with a ``fold`` axis the stacked params/optimizer/state
  shard over it, so folds really train on different chips;
* per-fold early stopping drops stopped folds from the vmapped
  computation: their params are stashed and the remaining folds are
  compacted into a smaller stack (one recompile per stop event), so a
  long-running fold no longer pays forward/backward FLOPs for folds
  that already finished. With a fold-sharded mesh, compaction waits
  until the active count stays divisible by the fold-axis size; the
  residual in-between epochs fall back to masked (frozen) updates;
* dev evaluation is one jitted program built ONCE (not per stage),
  running the recurrent dev set as B parallel streams like the engine
  (engine.py `_make_rnn_stage` eval) instead of a single batch-1 scan.
"""

from __future__ import annotations

import time
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .engine import TrainConfig
from .optimizers import make_optimizer
from .streams import sentence_shuffle_indices, stream_batch_indices


def fold_index_universe(offsets: np.ndarray, utt_folds: np.ndarray,
                        fold: int):
    """Frame indices + local offsets of fold ``fold``'s training set
    (= utterances of all OTHER folds, grouped by fold id ascending)."""
    utts = [u for k in range(int(utt_folds.max()) + 1) if k != fold
            for u in np.nonzero(utt_folds == k)[0]]
    frames = []
    local_offsets = [0]
    for u in utts:
        frames.append(np.arange(offsets[u], offsets[u + 1]))
        local_offsets.append(local_offsets[-1] + offsets[u + 1] - offsets[u])
    return np.concatenate(frames), np.asarray(local_offsets, dtype=np.int64)


def _fold_sharder(mesh, fold_axis: str):
    """Per-leaf placement: leading dim over the fold axis.

    Multi-process meshes (the fold axis crossing host/DCN boundaries)
    are fed via ``make_array_from_callback`` — every process holds the
    same host value (identical seeds/data) and contributes only its
    addressable shards; single-process keeps the cheap device_put."""
    if mesh is None:
        return lambda tree: tree
    from jax.sharding import NamedSharding, PartitionSpec as P
    multiproc = jax.process_count() > 1

    def put(tree):
        def assign(leaf):
            sh = NamedSharding(
                mesh, P(fold_axis, *([None] * (leaf.ndim - 1))))
            if not multiproc:
                return jax.device_put(leaf, sh)
            host = np.asarray(leaf)
            return jax.make_array_from_callback(
                host.shape, sh, lambda idx: host[idx])
        return jax.tree_util.tree_map(assign, tree)
    return put


def _replicator(mesh):
    """Constraint forcing a jit output to be fully replicated, so every
    process can read it (per-fold losses/vals with a fold axis that
    crosses the process boundary). Identity without a mesh."""
    if mesh is None:
        return lambda a: a
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P())
    return lambda a: jax.lax.with_sharding_constraint(a, sh)


def train_folds_parallel(
    net,
    x: np.ndarray,
    y: np.ndarray,
    offsets: Optional[np.ndarray],
    utt_folds: np.ndarray,
    num_folds: int,
    config: TrainConfig,
    x_dev: Optional[np.ndarray] = None,
    y_dev: Optional[np.ndarray] = None,
    mesh: Any = None,
    fold_axis: str = "fold",
    eval_batch: int = 64,
    compact: bool = True,
) -> List[Any]:
    """Returns the list of K trained fold params.

    ``mesh``: optional ``jax.sharding.Mesh`` with a ``fold_axis`` whose
    size divides ``num_folds`` — the stacked fold networks then shard
    over devices (the TPU-native replacement for the reference's
    sequential fold loop).

    ``compact``: drop early-stopped folds from the vmapped stack
    (default) instead of carrying them as masked frozen lanes; the
    per-lane math is identical either way."""
    log = config.log or (lambda s: None)
    recurrent = getattr(net, "is_recurrent", False)
    rng_np = np.random.default_rng(config.seed)
    key = jax.random.PRNGKey(config.seed)

    if mesh is not None:
        sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        if fold_axis not in sizes:
            raise ValueError(f"mesh has no {fold_axis!r} axis")
        if num_folds % sizes[fold_axis] != 0:
            raise ValueError(
                f"num_folds {num_folds} not divisible by fold-axis size "
                f"{sizes[fold_axis]}")
    shard_folds = _fold_sharder(mesh, fold_axis)
    replicate_out = _replicator(mesh)

    if offsets is None:
        offsets = np.array([0, x.shape[0]], dtype=np.int64)
    universes = [fold_index_universe(offsets, utt_folds, k)
                 for k in range(num_folds)]

    keys = jax.random.split(key, num_folds + 1)
    key = keys[0]
    params = shard_folds(jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves),
        *[net.init(keys[k + 1], x.shape[1]) for k in range(num_folds)]))

    xd = jnp.asarray(x)
    yd = jnp.asarray(y)
    use_val = config.use_validation and x_dev is not None

    L = config.bprop_len if recurrent else 1

    # ---- dev evaluation: built once, shared by every stage ------------
    evaluate = None
    if use_val:
        xvd = jnp.asarray(x_dev)
        yvd = jnp.asarray(y_dev)
        if recurrent:
            # B-stream layout over the dev set (engine semantics):
            # stream b reads frames [b*nv//B + t], no shuffle
            nv = int(xvd.shape[0])
            ebs = min(eval_batch, nv)
            vsteps = max(nv // ebs, 1)
            v_off = (np.arange(ebs, dtype=np.int64) * nv) // ebs
            v_idx = (v_off[:, None] + np.arange(vsteps)[None, :]) % nv
            xv_streams = jnp.take(xvd, jnp.asarray(v_idx.reshape(-1)), axis=0
                                  ).reshape(ebs, vsteps, -1)
            yv_streams = jnp.take(yvd, jnp.asarray(v_idx.reshape(-1)), axis=0
                                  ).reshape(ebs, vsteps)

            @jax.jit
            def evaluate(params):
                def one(p):
                    logits, _ = net.apply_sequence(p, xv_streams)
                    return optax.softmax_cross_entropy_with_integer_labels(
                        logits, yv_streams).mean()
                return replicate_out(jax.vmap(one)(params))
        else:
            @jax.jit
            def evaluate(params):
                def one(p):
                    logits = net.apply(p, xvd)
                    return optax.softmax_cross_entropy_with_integer_labels(
                        logits, yvd).mean()
                return replicate_out(jax.vmap(one)(params))

    for si, stage in enumerate(config.stages):
        log(f"=== Fold-parallel stage {si}: {num_folds} folds, "
            f"epoch = {stage.epoch}, bs = {stage.batch_size}, "
            f"opt = {stage.optimizer}")
        opt = make_optimizer(stage.optimizer, stage.lr)
        opt_state = shard_folds(jax.vmap(opt.init)(params))
        bs = stage.batch_size

        if recurrent:
            @jax.jit
            def update(params, opt_state, state, idx, active, rng):
                def one(p, o, st, ix, act, rk):
                    xb = jnp.take(xd, ix.reshape(-1), axis=0).reshape(bs, L, -1)
                    yb = jnp.take(yd, ix.reshape(-1), axis=0).reshape(bs, L)

                    def loss_fn(pp):
                        logits, new_st = net.apply_sequence(
                            pp, xb, st, rng=rk, train=True)
                        return optax.softmax_cross_entropy_with_integer_labels(
                            logits, yb).mean(axis=0).sum(), new_st

                    (loss, new_st), grads = jax.value_and_grad(
                        loss_fn, has_aux=True)(p)
                    upd, o2 = opt.update(grads, o, p)
                    upd = jax.tree_util.tree_map(lambda u: u * act, upd)
                    return (optax.apply_updates(p, upd), o2, new_st,
                            loss / L)
                p2, o2, st2, loss = jax.vmap(one)(params, opt_state, state,
                                                  idx, active, rng)
                return p2, o2, st2, replicate_out(loss)
            state = shard_folds(jax.tree_util.tree_map(
                lambda a: jnp.stack([a] * num_folds),
                net.init_state(bs)))
        else:
            @jax.jit
            def update(params, opt_state, idx, active, rng):
                def one(p, o, ix, act, rk):
                    xb = jnp.take(xd, ix, axis=0)
                    yb = jnp.take(yd, ix, axis=0)

                    def loss_fn(pp):
                        logits = net.apply(pp, xb, rng=rk, train=True)
                        return optax.softmax_cross_entropy_with_integer_labels(
                            logits, yb).mean()

                    loss, grads = jax.value_and_grad(loss_fn)(p)
                    upd, o2 = opt.update(grads, o, p)
                    upd = jax.tree_util.tree_map(lambda u: u * act, upd)
                    return optax.apply_updates(p, upd), o2, loss
                p2, o2, loss = jax.vmap(one)(params, opt_state, idx,
                                             active, rng)
                return p2, o2, replicate_out(loss)
            state = None

        n_steps = min(len(u[0]) for u in universes) // (bs * L)
        n_steps = max(n_steps, 1)
        # fold_ids maps positions in the (possibly compacted) stacked
        # computation back to original fold indices; stopped folds move
        # to ``stash`` and stop paying forward/backward FLOPs
        fold_ids = np.arange(num_folds)
        stash: dict = {}
        active = np.ones(num_folds, dtype=bool)
        best_vals = np.full(num_folds, np.inf)
        best_params = None   # per-fold best snapshots (fixed-epoch rule)
        fold_mesh = 1
        if mesh is not None:
            fold_mesh = dict(zip(mesh.axis_names,
                                 mesh.devices.shape))[fold_axis]

        multiproc = mesh is not None and jax.process_count() > 1

        def host_readable(tree):
            """Host-readable stack: multi-process fold-sharded arrays
            are not addressable everywhere, so replicate once (stop
            events are rare); single-process trees pass through."""
            if not multiproc:
                return tree
            from jax.sharding import NamedSharding, PartitionSpec as Pspec
            rep = NamedSharding(mesh, Pspec())
            return jax.jit(
                lambda t: t,
                out_shardings=jax.tree_util.tree_map(lambda _: rep, tree),
            )(tree)

        def slice_fold(tree, k):
            return jax.tree_util.tree_map(lambda l: np.asarray(l[k]), tree)

        for epoch in range(stage.epoch):
            t0 = time.time()
            # shuffle ALL folds (shared host rng) so loss trajectories
            # are bit-identical whether or not compaction happened
            shuffled = [sentence_shuffle_indices(u[1], len(u[0]), rng_np)
                        for u in universes]
            losses = []
            for s in range(n_steps):
                idx = np.stack([
                    universes[k][0][stream_batch_indices(
                        shuffled[k], bs, s * L, L)]
                    for k in fold_ids])
                if not recurrent:
                    idx = idx.reshape(len(fold_ids), bs * L)[:, :bs]
                key, uk = jax.random.split(key)
                rks = jax.random.split(uk, num_folds)[fold_ids]
                act = jnp.asarray(active, jnp.float32)
                idx = shard_folds(jnp.asarray(idx))
                if recurrent:
                    params, opt_state, state, loss = update(
                        params, opt_state, state, idx, act, rks)
                else:
                    params, opt_state, loss = update(
                        params, opt_state, idx, act, rks)
                losses.append(np.asarray(loss))
            mean_loss = np.stack(losses).mean(axis=0)
            msg = (f"  stage={si} epoch={epoch + 1} "
                   f"folds={[int(k) for k in fold_ids]} "
                   f"loss={np.array2string(mean_loss, precision=3)} "
                   f"({time.time() - t0:.1f}s)")
            if use_val:
                vals = np.asarray(evaluate(params))
                msg += f" val={np.array2string(vals, precision=3)}"
                if stage.early_stopping:
                    for i, k in enumerate(fold_ids):
                        if not active[i]:
                            continue
                        v = float(vals[i])
                        if np.isfinite(best_vals[k]) \
                                and best_vals[k] - v < -0.001:
                            active[i] = False
                        best_vals[k] = min(best_vals[k], v)
                else:
                    # fixed-epoch stages keep each fold's best-val model
                    # (the sequential path's BestModelSaver rule); no
                    # early stop -> no compaction on this path
                    improved = vals < best_vals
                    best_vals = np.minimum(best_vals, vals)
                    mask = jnp.asarray(improved)
                    if best_params is None:
                        best_params = jax.tree_util.tree_map(jnp.copy, params)
                    else:
                        def pick(bp, p):
                            m = mask.reshape((num_folds,) + (1,) * (p.ndim - 1))
                            return jnp.where(m, p, bp)
                        best_params = jax.tree_util.tree_map(
                            pick, best_params, params)
            log(msg)
            if not active.any():
                readable = host_readable(params)
                for i, k in enumerate(fold_ids):
                    stash[k] = slice_fold(readable, i)
                fold_ids = np.arange(0)
                break
            # compact: drop stopped folds from the stacked computation
            # (one retrace of `update`/`evaluate` per stop event); with
            # a fold-sharded mesh only when divisibility allows it —
            # including meshes whose fold axis crosses the process
            # boundary (the compacted stack is resharded over the same
            # fold axis under jit)
            n_act = int(active.sum())
            if compact and stage.early_stopping and n_act < len(fold_ids) \
                    and n_act % fold_mesh == 0:
                keep = np.nonzero(active)[0]
                readable = host_readable(params)
                for i in np.nonzero(~active)[0]:
                    stash[int(fold_ids[i])] = slice_fold(readable, i)

                kp = jnp.asarray(keep)
                if multiproc:
                    from jax.sharding import (NamedSharding,
                                              PartitionSpec as Pspec)

                    def take(tree):
                        out_sh = jax.tree_util.tree_map(
                            lambda l: NamedSharding(
                                mesh, Pspec(fold_axis,
                                            *([None] * (l.ndim - 1)))),
                            tree)
                        return jax.jit(
                            lambda t: jax.tree_util.tree_map(
                                lambda l: jnp.take(l, kp, axis=0), t),
                            out_shardings=out_sh)(tree)
                else:
                    def take(tree):
                        return shard_folds(jax.tree_util.tree_map(
                            lambda l: jnp.take(l, kp, axis=0), tree))
                params = take(params)
                opt_state = take(opt_state)
                if state is not None:
                    state = take(state)
                fold_ids = fold_ids[keep]
                active = active[keep]
                log(f"  compacted to folds {[int(k) for k in fold_ids]}")

        if not stage.early_stopping and best_params is not None:
            params = best_params

        # reassemble the full K-fold stack in original order for the
        # next stage / final return (stage boundaries reset `active`)
        if stash:
            per_fold = dict(stash)
            readable = host_readable(params) if len(fold_ids) else params
            for i, k in enumerate(fold_ids):
                per_fold[int(k)] = slice_fold(readable, i)
            params = shard_folds(jax.tree_util.tree_map(
                lambda *leaves: jnp.stack(leaves),
                *[per_fold[k] for k in range(num_folds)]))

    if mesh is not None and jax.process_count() > 1:
        # all-gather the fold-sharded params once so every host can
        # read every fold (fold axis may cross the process boundary)
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep = NamedSharding(mesh, P())
        params = jax.jit(
            lambda p: p,
            out_shardings=jax.tree_util.tree_map(lambda _: rep, params),
        )(params)
    return [jax.tree_util.tree_map(lambda l: np.asarray(l[k]), params)
            for k in range(num_folds)]
