"""Device mesh + sharding helpers.

The reference is strictly single-GPU (train.py:122-125); distribution
here is first-class and TPU-native: one ``jax.sharding.Mesh`` threaded
through training and inference, ``NamedSharding`` annotations, and XLA
inserting the collectives (gradient all-reduce over the ``data`` axis,
weight all-gather over ``model``) to ride ICI.

Axes:
* ``data``  — utterance/frame batch data parallelism
* ``model`` — tensor parallelism for the large output projection
  (units -> 1909 pdfs), sharded over its class dimension
* ``fold``  — k-fold ensemble parallelism: stacked fold params evaluate
  as one vmapped forward with the fold axis sharded over devices
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Dict[str, int], devices: Optional[Sequence] = None) -> Mesh:
    """Mesh over the first prod(axes) devices, axes in dict order."""
    if devices is None:
        devices = jax.devices()
    shape = tuple(axes.values())
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, tuple(axes.keys()))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_rows(mesh: Mesh, arr, axis_name: str = "data"):
    spec = P(axis_name, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def param_shardings(mesh: Mesh, params, model_axis: Optional[str] = None):
    """Sharding tree for network params: everything replicated except —
    when a ``model`` axis exists — the output projection, whose class
    dimension is sharded (w: (units, C) -> P(None, model); b: P(model)).
    """
    repl = NamedSharding(mesh, P())

    def assign(path, leaf):
        if model_axis is not None and any(
                getattr(p, "key", None) == "out" for p in path):
            if leaf.ndim == 2:
                return NamedSharding(mesh, P(None, model_axis))
            if leaf.ndim == 1:
                return NamedSharding(mesh, P(model_axis))
        return repl

    return jax.tree_util.tree_map_with_path(assign, params)


def make_sharded_train_step(net, opt, mesh: Mesh, data_axis: str = "data",
                            model_axis: Optional[str] = None,
                            bprop_len: int = 20):
    """One jitted data-parallel (+ optional output-layer tensor-parallel)
    training step.

    Feed-forward nets: ``step(params, opt_state, xb, yb, rng)``.
    Recurrent nets: ``step(params, opt_state, state, xb, yb, rng)`` with
    xb (B, L, D) — the TBPTT chunk; state sharded over ``data`` like the
    batch. Gradients all-reduce over ``data`` automatically via XLA.
    Returns (params, opt_state[, state], loss).
    """
    recurrent = getattr(net, "is_recurrent", False)
    batch_spec = P(data_axis)

    def constrain_batch(a):
        spec = P(data_axis, *([None] * (a.ndim - 1)))
        return jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec))

    if recurrent:
        @jax.jit
        def step(params, opt_state, state, xb, yb, rng):
            xb = constrain_batch(xb)
            yb = constrain_batch(yb)

            def loss_fn(p):
                logits, new_state = net.apply_sequence(p, xb, state, rng=rng,
                                                       train=True)
                loss = optax.softmax_cross_entropy_with_integer_labels(
                    logits, yb).mean(axis=0).sum()
                return loss, new_state

            (loss, new_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, new_state, loss

        return step

    @jax.jit
    def step(params, opt_state, xb, yb, rng):
        xb = constrain_batch(xb)
        yb = constrain_batch(yb)

        def loss_fn(p):
            logits = net.apply(p, xb, rng=rng, train=True)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_sharded_ensemble_forward(ensemble, mesh: Mesh,
                                  fold_axis: str = "fold"):
    """Fold-parallel ensemble posterior forward: the stacked fold params
    live sharded over the ``fold`` axis; one jitted vmapped forward
    computes all folds at once and the combination mean reduces over the
    fold axis (an all-reduce on ICI) — replacing the reference's K
    sequential passes (predict_folds.py:201-220)."""

    def shard_folds(stacked_params):
        def assign(leaf):
            spec = P(fold_axis, *([None] * (leaf.ndim - 1)))
            return jax.device_put(leaf, NamedSharding(mesh, spec))
        return jax.tree_util.tree_map(assign, stacked_params)

    @jax.jit
    def forward(params, xs):
        if ensemble.network.is_recurrent:
            y, _ = ensemble.apply_sequence(params, xs)
            return y
        return ensemble.apply(params, xs)

    return shard_folds, forward
