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


def parse_mesh_spec(spec: str) -> Dict[str, int]:
    """Parse a ``--mesh`` CLI value like ``"data=4,model=2"`` or
    ``"fold=2,data=4"`` into an ordered axis dict."""
    axes: Dict[str, int] = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise ValueError(f"bad mesh axis {part!r}; expected name=size")
        name, size = part.split("=", 1)
        axes[name.strip()] = int(size)
    if not axes:
        raise ValueError(f"empty mesh spec {spec!r}")
    return axes


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_rows(mesh: Mesh, arr, axis_name: str = "data"):
    spec = P(axis_name, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def param_shardings(mesh: Mesh, params, model_axis: Optional[str] = None):
    """Sharding tree for network params.

    Without a ``model`` axis everything is replicated. With one, every
    weight matrix is column-parallel over its OUTPUT dimension and the
    matching bias is sharded the same way — this covers the output
    projection (units -> 1909 pdfs, the reference's largest matmul) AND
    the recurrent gate matrices (LSTM/GRU wx/wh of width 4H/3H, the
    reference cells at chainer_networks.py:44-141): the per-step
    ``h @ wh`` becomes a Megatron-style column-parallel matmul whose
    gate nonlinearities stay sharded, with XLA/GSPMD inserting the
    collectives where the elementwise state update recombines gates.
    Leaves whose output dimension does not divide the axis size stay
    replicated (correctness never depends on the sharding choice).
    """
    repl = NamedSharding(mesh, P())
    if model_axis is None:
        return jax.tree_util.tree_map(lambda _: repl, params)
    m = dict(zip(mesh.axis_names, mesh.devices.shape))[model_axis]

    def assign(path, leaf):
        if leaf.ndim >= 1 and leaf.shape[-1] % m == 0 and leaf.shape[-1] >= m:
            spec = P(*([None] * (leaf.ndim - 1)), model_axis)
            return NamedSharding(mesh, spec)
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
