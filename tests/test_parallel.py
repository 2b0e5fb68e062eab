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


# --- pipeline parallelism (parallel/pipeline.py) ------------------------

def test_pipeline_forward_matches_single_device(rng):
    """2- and 4-stage GPipe pipelines over the virtual mesh must equal
    the single-device MLP forward exactly (pure data movement + the
    same matmul order per layer)."""
    import jax.numpy as jnp
    from nnacousticmodeling_tpu.parallel.pipeline import PipelinedMLP

    net = get_network("ff", 5, [32], 11)
    params = net.init(jax.random.PRNGKey(0), 12)
    x = jnp.asarray(rng.standard_normal((24, 12)).astype(np.float32))
    want = np.asarray(net.apply(params, x))
    for stages, micro in ((2, 4), (4, 3)):
        pp = PipelinedMLP(net=net, mesh=make_mesh({"stage": stages}),
                          num_micro=micro)
        got = np.asarray(jax.jit(pp.apply)(params, x))
        np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.slow
def test_pipeline_grads_match_single_device(rng):
    """Gradients THROUGH the pipeline (shard_map + ppermute) must match
    the single-device gradients — the PP training story."""
    import jax.numpy as jnp
    import optax
    from nnacousticmodeling_tpu.parallel.pipeline import PipelinedMLP

    net = get_network("ff", 4, [16], 7)
    params = net.init(jax.random.PRNGKey(1), 6)
    x = jnp.asarray(rng.standard_normal((12, 6)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 7, 12).astype(np.int32))
    pp = PipelinedMLP(net=net, mesh=make_mesh({"stage": 2}), num_micro=3)

    def loss_pp(p):
        return optax.softmax_cross_entropy_with_integer_labels(
            pp.apply(p, x), y).mean()

    def loss_sd(p):
        return optax.softmax_cross_entropy_with_integer_labels(
            net.apply(p, x), y).mean()

    g_pp = jax.grad(loss_pp)(params)
    g_sd = jax.grad(loss_sd)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp),
                    jax.tree_util.tree_leaves(g_sd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_pipeline_rejects_bad_shapes(rng):
    from nnacousticmodeling_tpu.parallel.pipeline import PipelinedMLP
    import jax.numpy as jnp

    net = get_network("ff", 2, [8], 5)
    params = net.init(jax.random.PRNGKey(0), 4)
    pp = PipelinedMLP(net=net, mesh=make_mesh({"stage": 4}), num_micro=2)
    with pytest.raises(ValueError):        # 2 layers < 4 stages
        pp.apply(params, jnp.zeros((4, 4)))
    pp2 = PipelinedMLP(net=net, mesh=make_mesh({"stage": 2}), num_micro=5)
    with pytest.raises(ValueError):        # batch 4 not divisible by 5
        pp2.apply(params, jnp.zeros((4, 4)))
