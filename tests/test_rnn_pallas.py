"""Weight-resident Pallas LSTM scan (ops/rnn_pallas.py).

Runs in interpret mode on the CPU test platform; the contract under
test is lax.scan equivalence — same hiddens, same final carry — for
the mixed-precision recipe (bf16 matmul operands, f32 gates/carry),
plus the end-to-end ``scan_impl="pallas"`` runner path in
models/networks.py.  Workload shape mirrors the reference's eval loop
(evaluateModelForTest.py:52-93).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnacousticmodeling_tpu.models import networks
from nnacousticmodeling_tpu.ops.rnn_pallas import (
    lstm_scan_pallas,
    lstm_scan_mixed_reference,
)


def _rand_case(rng, t, b, h):
    proj = jnp.asarray(rng.standard_normal((t, b, 4 * h)), jnp.float32) * 0.5
    wh = jnp.asarray(rng.standard_normal((h, 4 * h)), jnp.float32) * 0.1
    c0 = jnp.asarray(rng.standard_normal((b, h)), jnp.float32) * 0.1
    h0 = jnp.asarray(rng.standard_normal((b, h)), jnp.float32) * 0.1
    return proj, wh, c0, h0


@pytest.mark.parametrize("t,tb", [(7, 2), (8, 8), (3, 8), (16, 4)])
def test_matches_mixed_reference(t, tb):
    rng = np.random.default_rng(0)
    proj, wh, c0, h0 = _rand_case(rng, t, 8, 128)
    (ct_r, ht_r), hs_r = lstm_scan_mixed_reference(proj, wh, c0, h0)
    (ct_p, ht_p), hs_p = lstm_scan_pallas(proj, wh, c0, h0, time_block=tb)
    # final carry must be the step-T state even when T pads up to a
    # partial last time block
    np.testing.assert_allclose(ct_p, ct_r, atol=5e-5)
    np.testing.assert_allclose(ht_p, ht_r, atol=5e-5)
    np.testing.assert_allclose(hs_p, hs_r, atol=2e-3)
    assert hs_p.shape == (t, 8, 128)


def test_batch_split_variant_matches():
    rng = np.random.default_rng(1)
    proj, wh, c0, h0 = _rand_case(rng, 6, 8, 128)
    (_, ht_r), hs_r = lstm_scan_mixed_reference(proj, wh, c0, h0)
    (_, ht_p), hs_p = lstm_scan_pallas(proj, wh, c0, h0, time_block=2,
                                       batch_split=True)
    np.testing.assert_allclose(ht_p, ht_r, atol=5e-5)
    np.testing.assert_allclose(hs_p, hs_r, atol=2e-3)


def test_carry_dtype_preserved():
    rng = np.random.default_rng(2)
    proj, wh, c0, h0 = _rand_case(rng, 4, 8, 128)
    c0 = c0.astype(jnp.bfloat16)
    h0 = h0.astype(jnp.bfloat16)
    (ct, ht), hs = lstm_scan_pallas(proj.astype(jnp.bfloat16), wh, c0, h0)
    assert ct.dtype == jnp.bfloat16 and ht.dtype == jnp.bfloat16
    assert hs.dtype == jnp.bfloat16


def test_network_scan_impl_pallas_matches_xla():
    """LSTM stack forward with scan_impl='pallas' vs the lax.scan
    runner — full model path (input projections, inter-layer wiring,
    output head) within mixed-precision tolerance."""
    net = networks.LSTM(layers=2, units=128, num_classes=40)
    net_pl = dataclasses.replace(net, scan_impl="pallas")
    params = net.init(jax.random.PRNGKey(0), 39)
    xs = jnp.asarray(
        np.random.default_rng(3).standard_normal((4, 11, 39)), jnp.float32)
    ys, st = net.apply_sequence(params, xs)
    ys_p, st_p = net_pl.apply_sequence(params, xs)
    np.testing.assert_allclose(ys_p, ys, atol=5e-2)
    for (c, h), (cp, hp) in zip(st, st_p):
        np.testing.assert_allclose(cp, c, atol=1e-2)
        np.testing.assert_allclose(hp, h, atol=1e-2)


def test_network_pallas_train_falls_back():
    """train=True must keep the lax.scan path (dropout rng per step);
    the pallas hook is inference-only."""
    net = dataclasses.replace(
        networks.LSTM(layers=1, units=128, num_classes=40, dropout=0.5),
        scan_impl="pallas")
    params = net.init(jax.random.PRNGKey(0), 39)
    xs = jnp.ones((2, 5, 39), jnp.float32)
    ys, _ = net.apply_sequence(params, xs, rng=jax.random.PRNGKey(1),
                               train=True)
    assert bool(jnp.isfinite(ys).all())


def test_peephole_pallas_falls_back_to_scan():
    """Cells without a Pallas kernel silently use lax.scan."""
    net = dataclasses.replace(
        networks.PeepholeLSTM(layers=1, units=64, num_classes=10),
        scan_impl="pallas")
    params = net.init(jax.random.PRNGKey(0), 13)
    xs = jnp.ones((2, 4, 13), jnp.float32)
    ys, _ = net.apply_sequence(params, xs)
    assert ys.shape == (2, 4, 10)


# ---------------------------------------------------------------------------
# gated (GRU / MGRU) weight-resident scan
# ---------------------------------------------------------------------------

from nnacousticmodeling_tpu.ops.rnn_pallas import (
    gated_scan_pallas,
    gated_scan_mixed_reference,
)


def _gated_case(rng, t, b, h, gp):
    proj = jnp.asarray(rng.standard_normal((t, b, gp * h)), jnp.float32) * 0.5
    w1 = jnp.asarray(rng.standard_normal((h, 2 * h)), jnp.float32) * 0.1
    w2 = jnp.asarray(rng.standard_normal((h, h)), jnp.float32) * 0.1
    h0 = jnp.asarray(rng.standard_normal((b, h)), jnp.float32) * 0.1
    return proj, w1, w2, h0


@pytest.mark.parametrize("kind,gp,t,tb", [
    ("gru", 3, 7, 2), ("gru", 3, 8, 8),
    ("mgru_r", 3, 7, 4), ("mgru", 2, 9, 8),
])
def test_gated_matches_mixed_reference(kind, gp, t, tb):
    rng = np.random.default_rng(4)
    proj, w1, w2, h0 = _gated_case(rng, t, 8, 128, gp)
    act = jax.nn.relu if kind.startswith("mgru") else jnp.tanh
    w2_arg = None if kind == "mgru" else w2
    ht_r, hs_r = gated_scan_mixed_reference(proj, w1, w2_arg, h0, kind=kind,
                                            activation=act)
    ht_p, hs_p = gated_scan_pallas(proj, w1, w2_arg, h0, kind=kind,
                                   activation=act, time_block=tb)
    # reference hiddens round through bf16; relu-MGRU hiddens are
    # unbounded, so allow the matching relative slack
    np.testing.assert_allclose(ht_p, ht_r, atol=5e-5, rtol=5e-4)
    np.testing.assert_allclose(hs_p, hs_r, atol=2e-3, rtol=5e-3)
    assert hs_p.shape == (t, 8, 128)


@pytest.mark.parametrize("maker", [
    lambda: networks.GRU(layers=2, units=128, num_classes=40),
    lambda: networks.MGRUNet(layers=2, units=128, num_classes=40,
                             activation="relu"),
    lambda: networks.MGRUNet(layers=2, units=128, num_classes=40,
                             activation="relu", use_reset_gate=True),
])
def test_network_gated_pallas_matches_xla(maker):
    net = maker()
    net_pl = dataclasses.replace(net, scan_impl="pallas")
    params = net.init(jax.random.PRNGKey(0), 39)
    xs = jnp.asarray(
        np.random.default_rng(5).standard_normal((4, 11, 39)), jnp.float32)
    ys, st = net.apply_sequence(params, xs)
    ys_p, st_p = net_pl.apply_sequence(params, xs)
    np.testing.assert_allclose(ys_p, ys, atol=5e-2)
    for (h, f), (hp, fp) in zip(st, st_p):
        np.testing.assert_allclose(hp, h, atol=1e-2)
        np.testing.assert_allclose(fp, f)


def test_network_gated_pallas_converted_bias_first_step():
    """Converted-checkpoint U biases ('bu') must stay gated off on the
    fresh first step in the pallas path (Chainer h-is-None rule)."""
    net = networks.GRU(layers=1, units=64, num_classes=10)
    params = net.init(jax.random.PRNGKey(0), 13)
    params["cells"][0]["bu"] = jnp.asarray(
        np.random.default_rng(6).standard_normal(3 * 64), jnp.float32)
    net_pl = dataclasses.replace(net, scan_impl="pallas")
    xs = jnp.asarray(
        np.random.default_rng(7).standard_normal((3, 6, 13)), jnp.float32)
    ys, _ = net.apply_sequence(params, xs)
    ys_p, _ = net_pl.apply_sequence(params, xs)
    np.testing.assert_allclose(ys_p, ys, atol=5e-2)
    # carried (non-fresh) state: biases live from step 0 of the 2nd call
    _, st = net.apply_sequence(params, xs)
    ys2, _ = net.apply_sequence(params, xs, state=st)
    _, st_p = net_pl.apply_sequence(params, xs)
    ys2_p, _ = net_pl.apply_sequence(params, xs, state=st_p)
    np.testing.assert_allclose(ys2_p, ys2, atol=5e-2)


# --- trainable custom-VJP scan ----------------------------------------

def test_lstm_train_scan_forward_matches_inference_kernel():
    """The trainable kernel's forward must equal lstm_scan_pallas
    bit-for-bit (same math, same precision contract)."""
    from nnacousticmodeling_tpu.ops.rnn_pallas import (
        lstm_scan_pallas, lstm_scan_pallas_train)
    rng = np.random.default_rng(31)
    T, B, H = 13, 8, 16
    proj = jnp.asarray(rng.standard_normal((T, B, 4 * H)).astype(np.float32))
    wh = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.2)
    c0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32) * 0.1)
    h0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32) * 0.1)
    (ct_a, ht_a), hs_a = lstm_scan_pallas(proj, wh, c0, h0)
    (ct_b, ht_b), hs_b = lstm_scan_pallas_train(proj, wh, c0, h0)
    np.testing.assert_array_equal(np.asarray(hs_a), np.asarray(hs_b))
    np.testing.assert_array_equal(np.asarray(ct_a), np.asarray(ct_b))
    np.testing.assert_array_equal(np.asarray(ht_a), np.asarray(ht_b))


def test_lstm_train_scan_grads_match_autodiff():
    """Gradients from the custom reverse-time kernel vs autodiff
    through the mixed-precision reference scan. Residuals are stored
    bf16, so tolerances are bf16-level."""
    from nnacousticmodeling_tpu.ops.rnn_pallas import (
        lstm_scan_mixed_reference, lstm_scan_pallas_train)
    rng = np.random.default_rng(32)
    T, B, H = 11, 8, 16
    proj = jnp.asarray(rng.standard_normal((T, B, 4 * H)).astype(np.float32))
    wh = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.2)
    c0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32) * 0.1)
    h0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32) * 0.1)
    w_out = jnp.asarray(rng.standard_normal((H, 4)).astype(np.float32))

    def loss_kernel(proj, wh, c0, h0):
        (ct, ht), hs = lstm_scan_pallas_train(proj, wh, c0, h0)
        return (jnp.tanh(hs.astype(jnp.float32) @ w_out).sum()
                + 0.5 * ct.sum() + 0.25 * ht.sum())

    def loss_ref(proj, wh, c0, h0):
        (ct, ht), hs = lstm_scan_mixed_reference(proj, wh, c0, h0)
        return (jnp.tanh(hs.astype(jnp.float32) @ w_out).sum()
                + 0.5 * ct.sum() + 0.25 * ht.sum())

    g_k = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(proj, wh, c0, h0)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(proj, wh, c0, h0)
    for a, b, name in zip(g_k, g_r, ["dproj", "dwh", "dc0", "dh0"]):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a, b, atol=0.03 * scale, err_msg=name)


def test_train_scan_batch_split_coverage():
    """b=32 coverage of the train kernels at a sublane-multiple batch.

    (r5 note: a two-chain batch-split port of the inference kernel's
    trick into these train kernels was measured on v5e and REJECTED —
    interleaved A/B medians 8.91 vs 8.70 ms/step bf16, i.e. ~2% slower;
    the train kernels are residual-store-bound, not matmul/VPU
    phase-bound, so the counter-phase overlap has nothing to hide.)"""
    from nnacousticmodeling_tpu.ops.rnn_pallas import (
        lstm_scan_mixed_reference, lstm_scan_pallas_train,
        gated_scan_mixed_reference, gated_scan_pallas_train)
    rng = np.random.default_rng(55)
    T, B, H = 9, 32, 16
    proj = jnp.asarray(rng.standard_normal((T, B, 4 * H)).astype(np.float32))
    wh = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.2)
    c0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32) * 0.1)
    h0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32) * 0.1)
    w_out = jnp.asarray(rng.standard_normal((H, 4)).astype(np.float32))

    (ct_r, ht_r), hs_r = lstm_scan_mixed_reference(proj, wh, c0, h0)
    (ct_k, ht_k), hs_k = lstm_scan_pallas_train(proj, wh, c0, h0)
    # CPU matmul blocking differs by shape -> ulp-level drift allowed
    np.testing.assert_allclose(np.asarray(ct_k), np.asarray(ct_r), atol=5e-5)
    np.testing.assert_allclose(np.asarray(hs_k, np.float32),
                               np.asarray(hs_r, np.float32), atol=2e-3)

    def loss_k(proj, wh, c0, h0):
        (ct, ht), hs = lstm_scan_pallas_train(proj, wh, c0, h0)
        return jnp.tanh(hs.astype(jnp.float32) @ w_out).sum() + ct.sum()

    def loss_r(proj, wh, c0, h0):
        (ct, ht), hs = lstm_scan_mixed_reference(proj, wh, c0, h0)
        return jnp.tanh(hs.astype(jnp.float32) @ w_out).sum() + ct.sum()

    g_k = jax.grad(loss_k, argnums=(0, 1, 2, 3))(proj, wh, c0, h0)
    g_r = jax.grad(loss_r, argnums=(0, 1, 2, 3))(proj, wh, c0, h0)
    for a, b, name in zip(g_k, g_r, ["dproj", "dwh", "dc0", "dh0"]):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a, b, atol=0.03 * scale, err_msg=name)

    gproj = jnp.asarray(rng.standard_normal((T, B, 3 * H)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((H, 2 * H)).astype(np.float32) * 0.2)
    w2 = jnp.asarray(rng.standard_normal((H, H)).astype(np.float32) * 0.2)
    ht_r2, hs_r2 = gated_scan_mixed_reference(gproj, w1, w2, h0, kind="gru",
                                              activation=jnp.tanh)
    ht_k2, hs_k2 = gated_scan_pallas_train(gproj, w1, w2, h0, kind="gru",
                                           activation="tanh")
    np.testing.assert_allclose(np.asarray(hs_k2, np.float32),
                               np.asarray(hs_r2, np.float32), atol=2e-3)

    def gloss_k(proj, w1, w2, h0):
        ht, hs = gated_scan_pallas_train(proj, w1, w2, h0, kind="gru",
                                         activation="tanh")
        return jnp.tanh(hs.astype(jnp.float32) @ w_out).sum() + ht.sum()

    def gloss_r(proj, w1, w2, h0):
        ht, hs = gated_scan_mixed_reference(proj, w1, w2, h0, kind="gru",
                                            activation=jnp.tanh)
        return jnp.tanh(hs.astype(jnp.float32) @ w_out).sum() + ht.sum()

    g_k = jax.grad(gloss_k, argnums=(0, 1, 2, 3))(gproj, w1, w2, h0)
    g_r = jax.grad(gloss_r, argnums=(0, 1, 2, 3))(gproj, w1, w2, h0)
    for a, b, name in zip(g_k, g_r, ["dproj", "dw1", "dw2", "dh0"]):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a, b, atol=0.03 * scale, err_msg=name)


@pytest.mark.parametrize("t", [5, 6, 7])
def test_train_scan_grads_awkward_lengths(t):
    """T=5..7 regression: the forward pads to a multiple of min(8, T),
    which is NOT a multiple of the backward kernel's time_block=4 —
    the backward must cover every timestep anyway (r4 advisor bug:
    nb = tp // tb silently dropped the tail and corrupted grads)."""
    from nnacousticmodeling_tpu.ops.rnn_pallas import (
        lstm_scan_mixed_reference, lstm_scan_pallas_train,
        gated_scan_mixed_reference, gated_scan_pallas_train)
    rng = np.random.default_rng(100 + t)
    B, H = 8, 16
    w_out = jnp.asarray(rng.standard_normal((H, 4)).astype(np.float32))

    proj = jnp.asarray(rng.standard_normal((t, B, 4 * H)).astype(np.float32))
    wh = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.2)
    c0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32) * 0.1)
    h0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32) * 0.1)

    def loss_k(proj, wh, c0, h0):
        (ct, ht), hs = lstm_scan_pallas_train(proj, wh, c0, h0)
        return (jnp.tanh(hs.astype(jnp.float32) @ w_out).sum()
                + 0.5 * ct.sum() + 0.25 * ht.sum())

    def loss_r(proj, wh, c0, h0):
        (ct, ht), hs = lstm_scan_mixed_reference(proj, wh, c0, h0)
        return (jnp.tanh(hs.astype(jnp.float32) @ w_out).sum()
                + 0.5 * ct.sum() + 0.25 * ht.sum())

    g_k = jax.grad(loss_k, argnums=(0, 1, 2, 3))(proj, wh, c0, h0)
    g_r = jax.grad(loss_r, argnums=(0, 1, 2, 3))(proj, wh, c0, h0)
    for a, b, name in zip(g_k, g_r, ["dproj", "dwh", "dc0", "dh0"]):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a, b, atol=0.03 * scale,
                                   err_msg=f"lstm T={t} {name}")

    gproj = jnp.asarray(rng.standard_normal((t, B, 3 * H)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((H, 2 * H)).astype(np.float32) * 0.2)
    w2 = jnp.asarray(rng.standard_normal((H, H)).astype(np.float32) * 0.2)

    def gloss_k(proj, w1, w2, h0):
        ht, hs = gated_scan_pallas_train(proj, w1, w2, h0, kind="gru",
                                         activation="tanh")
        return (jnp.tanh(hs.astype(jnp.float32) @ w_out).sum()
                + 0.5 * ht.sum())

    def gloss_r(proj, w1, w2, h0):
        ht, hs = gated_scan_mixed_reference(proj, w1, w2, h0, kind="gru",
                                            activation=jnp.tanh)
        return (jnp.tanh(hs.astype(jnp.float32) @ w_out).sum()
                + 0.5 * ht.sum())

    g_k = jax.grad(gloss_k, argnums=(0, 1, 2, 3))(gproj, w1, w2, h0)
    g_r = jax.grad(gloss_r, argnums=(0, 1, 2, 3))(gproj, w1, w2, h0)
    for a, b, name in zip(g_k, g_r, ["dproj", "dw1", "dw2", "dh0"]):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a, b, atol=0.03 * scale,
                                   err_msg=f"gru T={t} {name}")


def test_lstm_network_trains_with_pallas_scan():
    """End-to-end: an LSTM net with scan_impl='pallas' trains (loss
    decreases) through the custom-VJP kernel."""
    import dataclasses
    import optax
    from nnacousticmodeling_tpu.models import get_network
    rng = np.random.default_rng(33)
    net = get_network("lstm", 1, [16], 8)
    net = dataclasses.replace(net, scan_impl="pallas")
    params = net.init(jax.random.PRNGKey(0), 6)
    x = jnp.asarray(rng.standard_normal((4, 12, 6)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 8, (4, 12)).astype(np.int32))
    opt = optax.adam(3e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits, _ = net.apply_sequence(p, x, train=True)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]


@pytest.mark.parametrize("kind,act", [("gru", "tanh"), ("mgru", "relu"),
                                      ("mgru_r", "relu")])
def test_gated_train_scan_forward_and_grads(kind, act):
    """Trainable GRU/MGRU kernels: forward equals the inference kernel
    bit-for-bit; grads match autodiff through the mixed reference."""
    from nnacousticmodeling_tpu.ops.rnn_pallas import (
        gated_scan_mixed_reference, gated_scan_pallas,
        gated_scan_pallas_train)
    rng = np.random.default_rng(41)
    T, B, H = 11, 8, 16
    gp = 2 if kind == "mgru" else 3
    proj = jnp.asarray(rng.standard_normal((T, B, gp * H)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((H, 2 * H)).astype(np.float32) * 0.2)
    w2 = (None if kind == "mgru" else
          jnp.asarray(rng.standard_normal((H, H)).astype(np.float32) * 0.2))
    h0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32) * 0.1)
    act_fn = {"tanh": jnp.tanh, "relu": jax.nn.relu}[act]

    ht_a, hs_a = gated_scan_pallas(proj, w1, w2, h0, kind=kind,
                                   activation=act_fn)
    ht_b, hs_b = gated_scan_pallas_train(proj, w1, w2, h0, kind=kind,
                                         activation=act)
    np.testing.assert_array_equal(np.asarray(hs_a), np.asarray(hs_b))
    np.testing.assert_array_equal(np.asarray(ht_a), np.asarray(ht_b))

    w_out = jnp.asarray(rng.standard_normal((H, 4)).astype(np.float32))

    def loss_kernel(proj, w1, w2, h0):
        ht, hs = gated_scan_pallas_train(proj, w1, w2, h0, kind=kind,
                                         activation=act)
        return (jnp.tanh(hs.astype(jnp.float32) @ w_out).sum()
                + 0.5 * ht.sum())

    def loss_ref(proj, w1, w2, h0):
        ht, hs = gated_scan_mixed_reference(proj, w1, w2, h0, kind=kind,
                                            activation=act_fn)
        return (jnp.tanh(hs.astype(jnp.float32) @ w_out).sum()
                + 0.5 * ht.sum())

    args = (proj, w1, w2, h0)
    dif_idx = (0, 1, 3) if kind == "mgru" else (0, 1, 2, 3)
    g_k = jax.grad(loss_kernel, argnums=dif_idx)(*args)
    g_r = jax.grad(loss_ref, argnums=dif_idx)(*args)
    for a, b in zip(g_k, g_r):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a, b, atol=0.03 * scale)


@pytest.mark.parametrize("name", ["gru", "mgrurelu", "mgrurelur"])
def test_gated_network_trains_with_pallas_scan(name):
    import dataclasses
    import optax
    from nnacousticmodeling_tpu.models import get_network
    rng = np.random.default_rng(43)
    net = get_network(name, 1, [16], 8)
    net = dataclasses.replace(net, scan_impl="pallas")
    params = net.init(jax.random.PRNGKey(0), 6)
    x = jnp.asarray(rng.standard_normal((4, 12, 6)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 8, (4, 12)).astype(np.int32))
    opt = optax.adam(3e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits, _ = net.apply_sequence(p, x, train=True)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]


def test_peephole_scan_pallas_matches_mixed_reference():
    """Weight-resident Peephole-LSTM kernel == mixed-precision scan."""
    from nnacousticmodeling_tpu.ops.rnn_pallas import (
        peephole_scan_mixed_reference, peephole_scan_pallas)
    rng = np.random.default_rng(51)
    T, B, H = 13, 8, 16
    # bf16 proj: both sides then emit bf16 hiddens, so the comparison
    # is exact (the reference twin emits hs in proj's dtype)
    proj = jnp.asarray(rng.standard_normal(
        (T, B, 4 * H)).astype(np.float32)).astype(jnp.bfloat16)
    wh = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.2)
    peeps = [jnp.asarray(rng.standard_normal((H, H)).astype(np.float32) * 0.2)
             for _ in range(3)]
    c0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32) * 0.1)
    h0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32) * 0.1)
    (ct_a, ht_a), hs_a = peephole_scan_pallas(proj, wh, *peeps, c0, h0)
    (ct_b, ht_b), hs_b = peephole_scan_mixed_reference(proj, wh, *peeps,
                                                       c0, h0)
    np.testing.assert_array_equal(np.asarray(hs_a, np.float32),
                                  np.asarray(hs_b, np.float32))
    np.testing.assert_allclose(np.asarray(ct_a), np.asarray(ct_b),
                               rtol=0, atol=2e-7)


@pytest.mark.parametrize("t", [6, 11])
def test_peephole_train_scan_forward_and_grads(t):
    """Trainable peephole kernel: forward equals the inference kernel
    bit-for-bit; grads (incl. the three peephole matrices) match
    autodiff through the mixed reference. T=6 covers the backward
    tb=4 padding path."""
    from nnacousticmodeling_tpu.ops.rnn_pallas import (
        peephole_scan_mixed_reference, peephole_scan_pallas,
        peephole_scan_pallas_train)
    rng = np.random.default_rng(61)
    B, H = 8, 16
    proj = jnp.asarray(rng.standard_normal((t, B, 4 * H)).astype(np.float32))
    wh = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.2)
    peeps = [jnp.asarray(rng.standard_normal((H, H)).astype(np.float32) * 0.2)
             for _ in range(3)]
    c0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32) * 0.1)
    h0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32) * 0.1)
    w_out = jnp.asarray(rng.standard_normal((H, 4)).astype(np.float32))

    (ct_a, ht_a), hs_a = peephole_scan_pallas(proj, wh, *peeps, c0, h0)
    (ct_b, ht_b), hs_b = peephole_scan_pallas_train(proj, wh, *peeps,
                                                    c0, h0)
    np.testing.assert_array_equal(np.asarray(hs_a), np.asarray(hs_b))
    np.testing.assert_array_equal(np.asarray(ct_a), np.asarray(ct_b))

    def loss_k(proj, wh, pi, pf, po, c0, h0):
        (ct, ht), hs = peephole_scan_pallas_train(proj, wh, pi, pf, po,
                                                  c0, h0)
        return (jnp.tanh(hs.astype(jnp.float32) @ w_out).sum()
                + 0.5 * ct.sum() + 0.25 * ht.sum())

    def loss_r(proj, wh, pi, pf, po, c0, h0):
        (ct, ht), hs = peephole_scan_mixed_reference(proj, wh, pi, pf, po,
                                                     c0, h0)
        return (jnp.tanh(hs.astype(jnp.float32) @ w_out).sum()
                + 0.5 * ct.sum() + 0.25 * ht.sum())

    args = (proj, wh, *peeps, c0, h0)
    g_k = jax.grad(loss_k, argnums=tuple(range(7)))(*args)
    g_r = jax.grad(loss_r, argnums=tuple(range(7)))(*args)
    names = ["dproj", "dwh", "dpi", "dpf", "dpo", "dc0", "dh0"]
    for a, b, name in zip(g_k, g_r, names):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a, b, atol=0.03 * scale,
                                   err_msg=f"T={t} {name}")


def test_peephole_network_trains_with_pallas_scan():
    """End-to-end: a PeepholeLSTM net with scan_impl='pallas' trains
    (loss decreases) through the custom-VJP kernel."""
    import optax
    from nnacousticmodeling_tpu.models import get_network
    rng = np.random.default_rng(62)
    net = get_network("peepholelstm", 1, [16], 8)
    net = dataclasses.replace(net, scan_impl="pallas")
    params = net.init(jax.random.PRNGKey(0), 6)
    x = jnp.asarray(rng.standard_normal((4, 12, 6)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 8, (4, 12)).astype(np.int32))
    opt = optax.adam(3e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits, _ = net.apply_sequence(p, x, train=True)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]


def test_peephole_network_pallas_eval_close_to_xla():
    """PeepholeLSTM net with scan_impl='pallas' matches the f32 XLA
    runner to mixed-precision tolerance at eval time."""
    import dataclasses
    from nnacousticmodeling_tpu.models import get_network
    rng = np.random.default_rng(52)
    net = get_network("peepholelstm", 2, [16], 8)
    params = net.init(jax.random.PRNGKey(0), 6)
    x = jnp.asarray(rng.standard_normal((3, 12, 6)).astype(np.float32))
    y_xla, _ = net.apply_sequence(params, x)
    net_pl = dataclasses.replace(net, scan_impl="pallas")
    y_pl, _ = net_pl.apply_sequence(params, x)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_xla),
                               atol=5e-2)
