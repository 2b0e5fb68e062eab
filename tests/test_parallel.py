"""Sharding tests on the 8-device virtual CPU mesh: sharded steps run,
match unsharded math, and params/batches carry the intended shardings."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nnacousticmodeling_tpu.models import (
    get_network, Ensemble, stack_fold_params,
)
from nnacousticmodeling_tpu.parallel import (
    make_mesh, replicate, shard_rows, param_shardings,
    make_sharded_train_step, make_sharded_ensemble_forward,
)
from nnacousticmodeling_tpu.train.optimizers import make_optimizer

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_make_mesh_shapes():
    mesh = make_mesh({"data": 4, "model": 2})
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh({"data": 64})


def test_ff_sharded_step_matches_unsharded(rng):
    mesh = make_mesh({"data": 4})
    net = get_network("ff", 2, [32], 10)
    params = net.init(jax.random.PRNGKey(0), 12)
    opt = make_optimizer("momentumsgd", 1e-2)
    opt_state = opt.init(params)

    xb = rng.standard_normal((16, 12)).astype(np.float32)
    yb = rng.integers(0, 10, 16).astype(np.int32)

    # unsharded reference update
    import optax
    def loss_fn(p):
        return optax.softmax_cross_entropy_with_integer_labels(
            net.apply(p, xb), yb).mean()
    loss_ref, grads = jax.value_and_grad(loss_fn)(params)
    upd, _ = opt.update(grads, opt_state, params)
    params_ref = optax.apply_updates(params, upd)

    step = make_sharded_train_step(net, opt, mesh)
    p_sh = replicate(mesh, params)
    o_sh = replicate(mesh, opt_state)
    params_new, _, loss = step(p_sh, o_sh, shard_rows(mesh, jnp.asarray(xb)),
                               shard_rows(mesh, jnp.asarray(yb)), None)
    assert float(loss) == pytest.approx(float(loss_ref), abs=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(params_new),
                    jax.tree_util.tree_leaves(params_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_rnn_sharded_step_runs(rng):
    mesh = make_mesh({"data": 2, "model": 4})
    net = get_network("lstm", 2, [32], 16)
    params = net.init(jax.random.PRNGKey(0), 8)
    opt = make_optimizer("adam", 1e-3)
    opt_state = opt.init(params)

    shardings = param_shardings(mesh, params, model_axis="model")
    p_sh = jax.device_put(params, shardings)
    o_sh = replicate(mesh, opt_state)
    state = net.init_state(8)
    state = jax.tree_util.tree_map(lambda a: shard_rows(mesh, a), state)

    xb = shard_rows(mesh, jnp.asarray(
        rng.standard_normal((8, 10, 8)).astype(np.float32)))
    yb = shard_rows(mesh, jnp.asarray(
        rng.integers(0, 16, (8, 10)).astype(np.int32)))

    step = make_sharded_train_step(net, opt, mesh, model_axis="model")
    params2, opt_state2, state2, loss = step(p_sh, o_sh, state, xb, yb,
                                             jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # output projection keeps its model-axis sharding after the update
    out_w_sharding = params2["out"]["w"].sharding
    assert out_w_sharding.spec == P(None, "model")


def test_fold_sharded_ensemble_matches_host_math(rng):
    mesh = make_mesh({"fold": 4})
    net = get_network("ff", 1, [16], 10)
    folds = [net.init(jax.random.PRNGKey(i), 6) for i in range(4)]
    ens = Ensemble(network=net, num_folds=4)
    shard_folds, forward = make_sharded_ensemble_forward(ens, mesh)
    stacked = shard_folds(stack_fold_params(folds))

    x = jnp.asarray(rng.standard_normal((5, 6)).astype(np.float32))
    got = np.asarray(forward({"master": None, "folds": stacked, "rpl": None}, x))
    expected = sum(np.asarray(net.apply(p, x)) for p in folds) / 4
    np.testing.assert_allclose(got, expected, atol=1e-5)
