"""Model zoo tests: shapes, step/sequence equivalence, reference
semantics (MGRU/RPL/ensemble weighting math), and an independent
numerical oracle (torch LSTM) for the LSTM cell."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnacousticmodeling_tpu.models import (
    MLP, TDNN, LSTM, ZoneoutLSTM, ZoneoutDropoutLSTM, PeepholeLSTM,
    GRU, MGRUNet, get_network, is_recurrent,
    RPL0, RPL2, RPL4, Ensemble, stack_fold_params,
)
from nnacousticmodeling_tpu.ops.numerics import log_softmax

KEY = jax.random.PRNGKey(42)
C = 17  # num classes


ALL_SPECS = [
    ("ff", dict(layers=3, units=[32], dropout=[0.2])),
    ("tdnn", dict(layers=0, units=[16, 16], tdnn_ksize=[3, 3], dropout=[0.1])),
    ("lstm", dict(layers=2, units=[24], dropout=[0.2])),
    ("zoneoutlstm", dict(layers=2, units=[24], dropout=[0.3, 0.4])),
    ("zoneoutdropoutlstm", dict(layers=2, units=[24], dropout=[0.2, 0.3, 0.4])),
    ("peepholelstm", dict(layers=2, units=[24], dropout=[0.2])),
    ("gru", dict(layers=2, units=[24], dropout=[0.2])),
    ("mgrurelu", dict(layers=2, units=[24], dropout=[0.2])),
    ("mgrurelur", dict(layers=2, units=[24], dropout=[0.2])),
]


def _build(name, cfg, in_dim):
    net = get_network(name, cfg.get("layers", 2), cfg.get("units", [24]), C,
                      "relu", cfg.get("tdnn_ksize", [5]), cfg.get("dropout", [0.0]))
    params = net.init(KEY, in_dim)
    return net, params


@pytest.mark.parametrize("name,cfg", ALL_SPECS)
def test_shapes_and_determinism(name, cfg, rng):
    if name == "tdnn":
        in_dim = (sum(cfg["tdnn_ksize"]) - len(cfg["tdnn_ksize"]) + 1) * 7
    else:
        in_dim = 11
    net, params = _build(name, cfg, in_dim)
    assert net.is_recurrent == is_recurrent(name)
    if net.is_recurrent:
        xs = jnp.asarray(rng.standard_normal((3, 6, in_dim)), jnp.float32)
        y, state = net.apply_sequence(params, xs)
        assert y.shape == (3, 6, C)
        y2, _ = net.apply_sequence(params, xs)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))
        # train mode with dropout/zoneout differs (stochastic)
        y3, _ = net.apply_sequence(params, xs, rng=KEY, train=True)
        assert y3.shape == (3, 6, C)
    else:
        x = jnp.asarray(rng.standard_normal((5, in_dim)), jnp.float32)
        y = net.apply(params, x)
        assert y.shape == (5, C)
        y3 = net.apply(params, x, rng=KEY, train=True)
        assert y3.shape == (5, C)


@pytest.mark.parametrize("name,cfg", [s for s in ALL_SPECS
                                      if is_recurrent(s[0]) and "zoneout" not in s[0]])
def test_step_equals_sequence(name, cfg, rng):
    in_dim = 9
    net, params = _build(name, cfg, in_dim)
    xs = jnp.asarray(rng.standard_normal((2, 5, in_dim)), jnp.float32)
    seq_y, seq_state = net.apply_sequence(params, xs)
    state = net.init_state(2)
    outs = []
    for t in range(5):
        state, y = net.step(params, state, xs[:, t, :])
        outs.append(y)
    step_y = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(seq_y), np.asarray(step_y), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(seq_state),
                    jax.tree_util.tree_leaves(state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_state_carries_across_calls(rng):
    """Recurrent state threads across apply_sequence calls (TBPTT
    contract: streams cross boundaries without reset)."""
    net, params = _build("lstm", dict(layers=1, units=[8], dropout=[0.0]), 4)
    xs = jnp.asarray(rng.standard_normal((1, 10, 4)), jnp.float32)
    full, _ = net.apply_sequence(params, xs)
    first, st = net.apply_sequence(params, xs[:, :4])
    second, _ = net.apply_sequence(params, xs[:, 4:], state=st)
    np.testing.assert_allclose(np.asarray(full),
                               np.asarray(jnp.concatenate([first, second], axis=1)),
                               atol=1e-5)


def test_lstm_matches_torch_oracle(rng):
    """Independent oracle: torch.nn.LSTM computes the same recurrence
    (gate order differs: torch i,f,g,o vs ours a(=g),i,f,o)."""
    import torch

    in_dim, units, T, B = 5, 7, 11, 3
    net = LSTM(units=units, num_classes=C, layers=1, dropout=0.0)
    params = net.init(KEY, in_dim)

    tl = torch.nn.LSTM(in_dim, units, num_layers=1, batch_first=True)
    wx = np.asarray(params["cells"][0]["wx"])  # (in, 4H) ours: [a,i,f,o]
    wh = np.asarray(params["cells"][0]["wh"])
    b = np.asarray(params["cells"][0]["b"])

    def ours_to_torch(m):  # (in, 4H) [a,i,f,o] -> torch (4H, in) [i,f,g,o]
        a, i, f, o = np.split(m, 4, axis=-1)
        return np.concatenate([i, f, a, o], axis=-1).T

    with torch.no_grad():
        tl.weight_ih_l0.copy_(torch.from_numpy(ours_to_torch(wx).copy()))
        tl.weight_hh_l0.copy_(torch.from_numpy(ours_to_torch(wh).copy()))
        a, i, f, o = np.split(b, 4)
        tl.bias_ih_l0.copy_(torch.from_numpy(np.concatenate([i, f, a, o]).copy()))
        tl.bias_hh_l0.zero_()

    xs = rng.standard_normal((B, T, in_dim)).astype(np.float32)
    with torch.no_grad():
        torch_h, _ = tl(torch.from_numpy(xs))

    # run only the recurrent layer (strip the output projection)
    from nnacousticmodeling_tpu.models import cells as C_
    proj = C_.lstm_input_proj(params["cells"][0], xs.reshape(B * T, -1))
    proj = proj.reshape(B, T, -1).transpose(1, 0, 2)
    carry = C_.lstm_init_state(B, units)
    carry, hs = jax.lax.scan(lambda c, p: C_.lstm_step(params["cells"][0], c, p),
                             carry, proj)
    ours_h = np.asarray(hs.transpose(1, 0, 2))
    np.testing.assert_allclose(ours_h, torch_h.numpy(), atol=2e-5)


def test_mgru_first_step_semantics(rng):
    """MGRU first step must equal z*h_bar (MGRU.py:83)."""
    net = MGRUNet(units=6, num_classes=C, layers=1, dropout=0.0,
                  use_reset_gate=False)
    params = net.init(KEY, 4)
    x = jnp.asarray(rng.standard_normal((2, 4)), jnp.float32)
    cp = params["cells"][0]
    z = jax.nn.sigmoid(x @ cp["w_z"] + cp["b_z"])
    h_bar = jax.nn.relu(x @ cp["w"] + cp["b"])
    expected = z * h_bar
    state, _ = net.step(params, net.init_state(2), x)
    np.testing.assert_allclose(np.asarray(state[0][0]), np.asarray(expected),
                               atol=1e-6)


def test_gru_interpolation_direction(rng):
    """Chainer GRU: h' = z*h_bar + (1-z)*h (z gates the CANDIDATE; the
    reference's MGRU shares this convention, MGRU.py:81). With an
    extreme negative z bias (z ~ 0) the state must stay ~0 from h0=0."""
    net = GRU(units=5, num_classes=C, layers=1, dropout=0.0)
    params = net.init(KEY, 3)
    params["cells"][0]["bx"] = params["cells"][0]["bx"].at[5:10].set(-50.0)  # z ~ 0
    xs = jnp.asarray(rng.standard_normal((1, 4, 3)), jnp.float32)
    _, state = net.apply_sequence(params, xs)
    np.testing.assert_allclose(np.asarray(state[0][0]), 0.0, atol=1e-6)


def test_rpl4_zero_init_is_floored_log_softmax(rng):
    rpl = RPL4(num_classes=C)
    params = rpl.init(KEY)
    x = jnp.asarray(rng.standard_normal((4, C)), jnp.float32)
    y = np.asarray(rpl.apply(params, x))
    ls = np.asarray(log_softmax(x, axis=-1))
    expected = np.logaddexp(ls, -20.0)
    np.testing.assert_allclose(y, expected, atol=1e-5)


def test_rpl2_zero_init_matches_rpl4_zero_init(rng):
    x = jnp.asarray(rng.standard_normal((4, C)), jnp.float32)
    r2, r4 = RPL2(C), RPL4(C)
    y2 = np.asarray(r2.apply(r2.init(KEY), x))
    y4 = np.asarray(r4.apply(r4.init(KEY), x))
    np.testing.assert_allclose(y2, y4, atol=1e-6)


def test_ensemble_weighting_rule(rng):
    """(master*K + sum folds) / 2K (evaluate.py:36-47)."""
    net = MLP(units=8, num_classes=C, layers=1, dropout=0.0)
    master = net.init(jax.random.PRNGKey(0), 6)
    folds = [net.init(jax.random.PRNGKey(i + 1), 6) for i in range(3)]
    x = jnp.asarray(rng.standard_normal((5, 6)), jnp.float32)

    ens = Ensemble(network=net, rpl=None, num_folds=3)
    params = {"master": master, "folds": stack_fold_params(folds), "rpl": None}
    y = np.asarray(ens.apply(params, x))

    ym = np.asarray(net.apply(master, x))
    yf = [np.asarray(net.apply(p, x)) for p in folds]
    expected = (ym * 3 + sum(yf)) / 6
    np.testing.assert_allclose(y, expected, atol=1e-5)

    # folds only -> mean
    y_folds = np.asarray(ens.apply({"master": None, "folds": params["folds"]}, x))
    np.testing.assert_allclose(y_folds, sum(yf) / 3, atol=1e-5)

    # master only -> passthrough
    y_master = np.asarray(ens.apply({"master": master, "folds": None}, x))
    np.testing.assert_allclose(y_master, ym, atol=1e-6)


def test_tdnn_window_math():
    net = TDNN(units=(8, 8), num_classes=C, ksize=(5, 5))
    assert net.input_win_size == 9
    params = net.init(KEY, 9 * 4)
    x = jnp.zeros((3, 36), jnp.float32)
    assert net.apply(params, x).shape == (3, C)
    with pytest.raises(ValueError):
        TDNN(units=(8,), num_classes=C, ksize=(5, 5))


def test_factory_rejects_unknown():
    with pytest.raises(ValueError):
        get_network("transformer", 2, [8], C)


def test_bf16_inference_close_to_f32(rng):
    """HalfPrecisionNet: bf16 compute stays within bf16-scale error of
    the f32 path for FF and recurrent nets."""
    from nnacousticmodeling_tpu.models.precision import HalfPrecisionNet

    ff = MLP(units=64, num_classes=C, layers=2)
    p = ff.init(KEY, 10)
    x = jnp.asarray(rng.standard_normal((20, 10)), jnp.float32)
    half = HalfPrecisionNet(ff)
    y32 = np.asarray(ff.apply(p, x))
    y16 = np.asarray(half.apply(half.cast(p), x))
    assert y16.dtype == np.float32
    denom = np.maximum(np.abs(y32), 1.0)
    assert (np.abs(y32 - y16) / denom).max() < 0.1

    lstm = LSTM(units=32, num_classes=C, layers=2)
    pl = lstm.init(KEY, 10)
    xs = jnp.asarray(rng.standard_normal((2, 15, 10)), jnp.float32)
    halfr = HalfPrecisionNet(lstm)
    y32, _ = lstm.apply_sequence(pl, xs)
    y16, _ = halfr.apply_sequence(halfr.cast(pl), xs)
    denom = np.maximum(np.abs(np.asarray(y32)), 1.0)
    assert (np.abs(np.asarray(y32) - np.asarray(y16)) / denom).max() < 0.15


def test_bf16_composes_with_inference_helpers(rng):
    from nnacousticmodeling_tpu.models.precision import HalfPrecisionNet
    from nnacousticmodeling_tpu.infer import ff_log_posteriors

    ff = MLP(units=32, num_classes=C, layers=1)
    p = ff.init(KEY, 8)
    half = HalfPrecisionNet(ff)
    x = rng.standard_normal((50, 8)).astype(np.float32)
    lp = ff_log_posteriors(half, half.cast(p), x, chunk=32)
    assert lp.shape == (50, C) and lp.dtype == np.float32
    np.testing.assert_allclose(np.exp(lp).sum(1), 1.0, atol=1e-2)
