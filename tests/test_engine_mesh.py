"""The real training engine under a device mesh (the user-facing
``train_cli --mesh`` path, not a side library): sharded runs must match
unsharded math, and a model axis must actually shard the recurrent gate
matrices (tensor parallelism, SURVEY §2.4 TP row)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nnacousticmodeling_tpu.models import get_network
from nnacousticmodeling_tpu.parallel import make_mesh, parse_mesh_spec
from nnacousticmodeling_tpu.train import TrainConfig, TrainStage, train_network

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_parse_mesh_spec():
    assert parse_mesh_spec("data=8") == {"data": 8}
    assert parse_mesh_spec("data=4,model=2") == {"data": 4, "model": 2}
    assert parse_mesh_spec("fold=2, data=4") == {"fold": 2, "data": 4}
    with pytest.raises(ValueError):
        parse_mesh_spec("data")
    with pytest.raises(ValueError):
        parse_mesh_spec("")


def _make_data(rng, n=256, dim=12, classes=10):
    x = rng.standard_normal((n, dim)).astype(np.float32)
    y = rng.integers(0, classes, n).astype(np.int32)
    # 8 utterances for the recurrent stream layout
    offsets = np.linspace(0, n, 9).astype(np.int64)
    return x, y, offsets


def _config(stages, mesh=None, model_axis=None, dispatch="auto"):
    return TrainConfig(stages=stages, bprop_len=5, seed=0, log=None,
                       mesh=mesh, model_axis=model_axis, dispatch=dispatch)


def _assert_same_result(res_a, res_b, rtol=2e-4, atol=2e-5):
    assert len(res_a.history) == len(res_b.history)
    for ha, hb in zip(res_a.history, res_b.history):
        assert ha["main/loss"] == pytest.approx(hb["main/loss"], rel=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(res_a.params),
                    jax.tree_util.tree_leaves(res_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=rtol, atol=atol)


def test_ff_data_parallel_matches_unsharded(rng):
    x, y, _ = _make_data(rng)
    xv, yv, _ = _make_data(rng, n=64)
    net = get_network("ff", 2, [32], 10)
    stages = [TrainStage(epoch=2, optimizer="momentumsgd", batch_size=32,
                         lr=1e-2, early_stopping=False)]
    ref = train_network(net, x, y, _config(stages), x_dev=xv, y_dev=yv)
    got = train_network(net, x, y,
                        _config(stages, mesh=make_mesh({"data": 8})),
                        x_dev=xv, y_dev=yv)
    _assert_same_result(ref, got)


def test_rnn_data_model_parallel_matches_unsharded(rng):
    x, y, offsets = _make_data(rng, n=320, dim=8, classes=12)
    net = get_network("lstm", 2, [16], 12)
    stages = [TrainStage(epoch=2, optimizer="adam", batch_size=8,
                         lr=1e-3, early_stopping=False)]
    ref = train_network(net, x, y, _config(stages), offsets=offsets)
    mesh = make_mesh({"data": 2, "model": 4})
    got = train_network(net, x, y,
                        _config(stages, mesh=mesh, model_axis="model"),
                        offsets=offsets)
    _assert_same_result(ref, got, rtol=5e-4, atol=5e-5)
    # the gate matrices really shard: wx (D, 4H), wh (H, 4H), b (4H)
    cell = got.params["cells"][0]
    assert cell["wx"].sharding.spec == P(None, "model")
    assert cell["wh"].sharding.spec == P(None, "model")
    assert cell["b"].sharding.spec == P("model")
    assert got.params["out"]["w"].sharding.spec == P(None, "model")


def test_mesh_per_step_dispatch_matches_unsharded(rng):
    """per_step epoch dispatch under a (data, model) mesh: the jitted
    per-minibatch update must respect the shardings and match the
    unsharded trajectory (the scan-mode mesh equality is covered
    above)."""
    x, y, offsets = _make_data(rng, n=160, dim=8, classes=8)
    net = get_network("lstm", 1, [16], 8)
    stages = [TrainStage(epoch=1, optimizer="sgd", batch_size=4,
                         lr=1e-2, early_stopping=False)]
    ref = train_network(net, x, y, _config(stages), offsets=offsets)
    mesh = make_mesh({"data": 2, "model": 2})
    got = train_network(net, x, y,
                        _config(stages, mesh=mesh, model_axis="model",
                                dispatch="per_step"),
                        offsets=offsets)
    _assert_same_result(ref, got, rtol=5e-4, atol=5e-5)


def test_gru_model_parallel_matches_unsharded(rng):
    x, y, offsets = _make_data(rng, n=160, dim=8, classes=8)
    net = get_network("gru", 1, [16], 8)
    stages = [TrainStage(epoch=1, optimizer="sgd", batch_size=4,
                         lr=1e-2, early_stopping=False)]
    ref = train_network(net, x, y, _config(stages), offsets=offsets)
    mesh = make_mesh({"data": 4, "model": 2})
    got = train_network(net, x, y,
                        _config(stages, mesh=mesh, model_axis="model"),
                        offsets=offsets)
    _assert_same_result(ref, got, rtol=5e-4, atol=5e-5)
    cell = got.params["cells"][0]
    assert cell["wx"].sharding.spec == P(None, "model")      # (D, 3H)
    assert cell["wh_rz"].sharding.spec == P(None, "model")   # (H, 2H)
    assert cell["wh_c"].sharding.spec == P(None, "model")    # (H, H)


def test_mesh_batch_divisibility_validated(rng):
    x, y, _ = _make_data(rng, n=64)
    net = get_network("ff", 1, [16], 10)
    stages = [TrainStage(epoch=1, optimizer="sgd", batch_size=6,
                         lr=1e-2, early_stopping=False)]
    with pytest.raises(ValueError, match="not divisible"):
        train_network(net, x, y,
                      _config(stages, mesh=make_mesh({"data": 4})))


@pytest.mark.slow
def test_train_cli_mesh_flag(tmp_path, rng):
    """The user-facing flag: train_cli --mesh produces the same model
    as the unsharded run."""
    from nnacousticmodeling_tpu.pipeline.train_cli import main as train_main
    from nnacousticmodeling_tpu.train import load_pytree

    d = tmp_path / "data"
    d.mkdir()
    x, y, offsets = _make_data(rng, n=200, dim=10, classes=9)
    for split in ("train", "dev"):
        np.save(d / f"data_{split}.npy", x)
        np.save(d / f"targets_{split}.npy", y)
        np.save(d / f"offsets_{split}.npy", offsets)

    common = ["--num-classes", "9", "-n", "lstm", "-l", "1", "-u", "16",
              "--data-dir", str(d), "--offset-dir", str(d),
              "--target-dir", str(d),
              "--epoch", "1", "-o", "adam", "-b", "8", "--bproplen", "5",
              "--early-stopping", "false", "--seed", "0", "--noplot"]
    train_main(common + ["--out", str(tmp_path / "plain")])
    train_main(common + ["--out", str(tmp_path / "sharded"),
                         "--mesh", "data=4,model=2"])

    net = get_network("lstm", 1, [16], 9)
    template = net.init(jax.random.PRNGKey(0), 10)
    p_plain = load_pytree(str(tmp_path / "plain" / "model.npz"), template)
    p_shard = load_pytree(str(tmp_path / "sharded" / "model.npz"), template)
    for a, b in zip(jax.tree_util.tree_leaves(p_plain),
                    jax.tree_util.tree_leaves(p_shard)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)
