"""Chainer-checkpoint converter tests.

Chainer itself is not installed, so the oracle is a direct numpy
transcription of Chainer's layer semantics (interleaved LSTM gates,
six-Linear GRU/MGRU with double biases) run on random chainer-layout
weights; the converted params through our cells must match framewise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nnacousticmodeling_tpu.models import LSTM, GRU, MGRUNet, PeepholeLSTM
from nnacousticmodeling_tpu.models.convert import (
    convert_gru, convert_lstm, convert_mgru, convert_mlp,
    convert_peephole_lstm, convert_rpl4,
)
from nnacousticmodeling_tpu.models import MLP, RPL4


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _rand_linear(rng, out, inp, bias=True):
    d = {"W": rng.standard_normal((out, inp)).astype(np.float32) * 0.3}
    if bias:
        d["b"] = rng.standard_normal(out).astype(np.float32) * 0.1
    return d


def test_mlp_conversion(rng):
    layers, in_dim, units, classes = 2, 5, 7, 4
    src = {}
    dims = [in_dim, units, units]
    for l in range(layers):
        lin = _rand_linear(rng, units, dims[l])
        src[f"predictor/layer_{l}/W"] = lin["W"]
        src[f"predictor/layer_{l}/b"] = lin["b"]
    out = _rand_linear(rng, classes, units)
    src["predictor/out/W"] = out["W"]
    src["predictor/out/b"] = out["b"]

    params = convert_mlp(src, layers)
    net = MLP(units=units, num_classes=classes, layers=layers)
    x = rng.standard_normal((3, in_dim)).astype(np.float32)
    got = np.asarray(net.apply(params, jnp.asarray(x)))

    # numpy oracle of the chainer MLP (relu, no dropout at eval)
    h = x
    for l in range(layers):
        h = np.maximum(h @ src[f"predictor/layer_{l}/W"].T
                       + src[f"predictor/layer_{l}/b"], 0)
    ref = h @ out["W"].T + out["b"]
    np.testing.assert_allclose(got, ref, atol=1e-5)


def _chainer_lstm_oracle(src, prefix, x_seq):
    """Chainer L.LSTM semantics: interleaved gates a,i,f,o at rows
    h*4+g; c,h start at zero."""
    wu = src[f"{prefix}/upward/W"]
    bu = src[f"{prefix}/upward/b"]
    wl = src[f"{prefix}/lateral/W"]
    hdim = wu.shape[0] // 4
    c = np.zeros((x_seq.shape[0], hdim), np.float32)
    h = np.zeros_like(c)
    outs = []
    for t in range(x_seq.shape[1]):
        z = x_seq[:, t] @ wu.T + bu + h @ wl.T
        zr = z.reshape(z.shape[0], hdim, 4)
        a, i, f, o = np.tanh(zr[:, :, 0]), _sigmoid(zr[:, :, 1]), \
            _sigmoid(zr[:, :, 2]), _sigmoid(zr[:, :, 3])
        c = f * c + i * a
        h = o * np.tanh(c)
        outs.append(h)
    return np.stack(outs, axis=1)


def test_lstm_conversion(rng):
    in_dim, units, B, T = 5, 6, 2, 7
    src = {}
    src["predictor/layer_0/upward/W"] = rng.standard_normal(
        (4 * units, in_dim)).astype(np.float32) * 0.3
    src["predictor/layer_0/upward/b"] = rng.standard_normal(
        4 * units).astype(np.float32) * 0.1
    src["predictor/layer_0/lateral/W"] = rng.standard_normal(
        (4 * units, units)).astype(np.float32) * 0.3
    out = _rand_linear(rng, 3, units)
    src["predictor/out/W"] = out["W"]
    src["predictor/out/b"] = out["b"]

    params = convert_lstm(src, 1)
    net = LSTM(units=units, num_classes=3, layers=1, dropout=0.0)
    xs = rng.standard_normal((B, T, in_dim)).astype(np.float32)
    got, _ = net.apply_sequence(params, jnp.asarray(xs))

    h_ref = _chainer_lstm_oracle(src, "predictor/layer_0", xs)
    ref = h_ref @ out["W"].T + out["b"]
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def test_gru_conversion(rng):
    in_dim, units, B, T = 4, 5, 2, 6
    src = {}
    p = "predictor/layer_0"
    for name, (o, i) in [("W_r", (units, in_dim)), ("U_r", (units, units)),
                         ("W_z", (units, in_dim)), ("U_z", (units, units)),
                         ("W", (units, in_dim)), ("U", (units, units))]:
        lin = _rand_linear(rng, o, i)
        src[f"{p}/{name}/W"] = lin["W"]
        src[f"{p}/{name}/b"] = lin["b"]
    out = _rand_linear(rng, 3, units)
    src["predictor/out/W"] = out["W"]
    src["predictor/out/b"] = out["b"]

    params = convert_gru(src, 1)
    net = GRU(units=units, num_classes=3, layers=1, dropout=0.0)
    xs = rng.standard_normal((B, T, in_dim)).astype(np.float32)
    got, _ = net.apply_sequence(params, jnp.asarray(xs))

    # chainer StatefulGRU oracle (gru.py semantics, which the
    # reference's MGRU copies): h' = z*h_bar + (1-z)*h with
    # h_bar = tanh(W x + U (r*h)); every link has a bias, and the FIRST
    # step skips the U links entirely (h is None)
    def L(n, v):
        return v @ src[f"{p}/{n}/W"].T + src[f"{p}/{n}/b"]
    h = None
    outs = []
    for t in range(T):
        x = xs[:, t]
        if h is None:
            z = _sigmoid(L("W_z", x))
            h_bar = np.tanh(L("W", x))
            h = z * h_bar
        else:
            r = _sigmoid(L("W_r", x) + L("U_r", h))
            z = _sigmoid(L("W_z", x) + L("U_z", h))
            h_bar = np.tanh(L("W", x) + L("U", r * h))
            h = z * h_bar + (1 - z) * h
        outs.append(h)
    ref = np.stack(outs, axis=1) @ out["W"].T + out["b"]
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


@pytest.mark.parametrize("use_reset", [False, True])
def test_mgru_conversion(rng, use_reset):
    in_dim, units, B, T = 4, 5, 2, 6
    src = {}
    p = "predictor/layer_0"
    names = [("W_z", (units, in_dim)), ("U_z", (units, units)),
             ("W", (units, in_dim)), ("U", (units, units))]
    if use_reset:
        names += [("W_r", (units, in_dim)), ("U_r", (units, units))]
    for name, (o, i) in names:
        lin = _rand_linear(rng, o, i)
        src[f"{p}/{name}/W"] = lin["W"]
        src[f"{p}/{name}/b"] = lin["b"]
    out = _rand_linear(rng, 3, units)
    src["predictor/out/W"] = out["W"]
    src["predictor/out/b"] = out["b"]

    params = convert_mgru(src, 1, use_reset)
    net = MGRUNet(units=units, num_classes=3, layers=1, dropout=0.0,
                  use_reset_gate=use_reset)
    xs = rng.standard_normal((B, T, in_dim)).astype(np.float32)
    got, _ = net.apply_sequence(params, jnp.asarray(xs))

    # MGRU.py:67-85 oracle: h' = z*h_bar + (1-z)*h, relu activation;
    # the first step (h is None) skips the U links entirely
    def L(n, v):
        return v @ src[f"{p}/{n}/W"].T + src[f"{p}/{n}/b"]
    h = None
    outs = []
    for t in range(T):
        x = xs[:, t]
        if h is None:
            z = _sigmoid(L("W_z", x))
            h_bar = np.maximum(L("W", x), 0)
            h = z * h_bar
        else:
            z = _sigmoid(L("W_z", x) + L("U_z", h))
            if use_reset:
                r = _sigmoid(L("W_r", x) + L("U_r", h))
                h_bar = np.maximum(L("W", x) + L("U", r * h), 0)
            else:
                h_bar = np.maximum(L("W", x) + L("U", h), 0)
            h = z * h_bar + (1 - z) * h
        outs.append(h)
    ref = np.stack(outs, axis=1) @ out["W"].T + out["b"]
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def test_peephole_conversion_runs(rng):
    in_dim, units = 4, 5
    src = {}
    p = "predictor/layer_0"
    src[f"{p}/upward/W"] = rng.standard_normal((4 * units, in_dim)).astype(np.float32)
    src[f"{p}/upward/b"] = rng.standard_normal(4 * units).astype(np.float32)
    src[f"{p}/lateral/W"] = rng.standard_normal((4 * units, units)).astype(np.float32)
    for n in ["peep_i", "peep_f", "peep_o"]:
        src[f"{p}/{n}/W"] = rng.standard_normal((units, units)).astype(np.float32)
    out = _rand_linear(rng, 3, units)
    src["predictor/out/W"] = out["W"]
    src["predictor/out/b"] = out["b"]
    params = convert_peephole_lstm(src, 1)
    net = PeepholeLSTM(units=units, num_classes=3, layers=1, dropout=0.0)
    xs = rng.standard_normal((2, 5, in_dim)).astype(np.float32)
    got, _ = net.apply_sequence(params, jnp.asarray(xs))
    assert np.isfinite(np.asarray(got)).all()


def test_rpl4_conversion(rng):
    src = {"predictor/W": rng.standard_normal((1, 6)).astype(np.float32),
           "predictor/b": rng.standard_normal((1, 6)).astype(np.float32),
           "predictor/lb": np.full((1, 6), -20.0, np.float32)}
    params = convert_rpl4(src)
    rpl = RPL4(6)
    x = jnp.asarray(rng.standard_normal((3, 6)).astype(np.float32))
    got = rpl.apply(params, x)
    assert np.isfinite(np.asarray(got)).all()


def test_tdnn_conversion(rng):
    """Numpy oracle of the chainer TDNN semantics (scrambled reshape +
    (1,k) convs) vs our chainer_layout TDNN with converted weights."""
    from nnacousticmodeling_tpu.models import TDNN
    from nnacousticmodeling_tpu.models.convert import convert_tdnn

    D, ks, units, classes = 3, (3, 3), (4, 5), 6
    winlen = sum(ks) - len(ks) + 1          # 5
    src = {}
    in_c = D
    for l, (k, u) in enumerate(zip(ks, units)):
        src[f"predictor/layer_{l}/W"] = rng.standard_normal(
            (u, in_c, 1, k)).astype(np.float32) * 0.3
        src[f"predictor/layer_{l}/b"] = rng.standard_normal(u).astype(
            np.float32) * 0.1
        in_c = u
    out = _rand_linear(rng, classes, units[-1])
    src["predictor/out/W"] = out["W"]
    src["predictor/out/b"] = out["b"]

    x = rng.standard_normal((4, winlen * D)).astype(np.float32)

    # chainer oracle
    h = x.reshape(4, -1, 1, winlen)         # (N, C=D, 1, W)
    for l, k in enumerate(ks):
        w = src[f"predictor/layer_{l}/W"]
        b = src[f"predictor/layer_{l}/b"]
        n, c, _, wlen = h.shape
        out_w = wlen - k + 1
        new = np.zeros((n, w.shape[0], 1, out_w), np.float32)
        for pos in range(out_w):
            patch = h[:, :, 0, pos:pos + k]            # (N, C, k)
            new[:, :, 0, pos] = np.einsum("nck,ock->no", patch, w[:, :, 0, :])
        h = np.maximum(new + b[None, :, None, None], 0)
    ref = h.reshape(4, -1) @ out["W"].T + out["b"]

    net = TDNN(units=units, num_classes=classes, ksize=ks,
               chainer_layout=True)
    params = convert_tdnn(src, len(ks))
    got = np.asarray(net.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_parity_cli_roundtrip(tmp_path, rng):
    """Full parity-gate drive: synthesize a chainer-layout checkpoint,
    compute 'reference' posteriors with the numpy LSTM oracle, and the
    CLI must declare parity."""
    from nnacousticmodeling_tpu.pipeline.parity import main as parity_main
    from nnacousticmodeling_tpu.ops.numerics import ref_logsum

    in_dim, units, T = 6, 5, 40
    src = {}
    src["predictor/layer_0/upward/W"] = rng.standard_normal(
        (4 * units, in_dim)).astype(np.float32) * 0.3
    src["predictor/layer_0/upward/b"] = rng.standard_normal(
        4 * units).astype(np.float32) * 0.1
    src["predictor/layer_0/lateral/W"] = rng.standard_normal(
        (4 * units, units)).astype(np.float32) * 0.3
    out = _rand_linear(rng, 7, units)
    src["predictor/out/W"] = out["W"]
    src["predictor/out/b"] = out["b"]
    np.savez(tmp_path / "model.npz", **src)

    x = rng.standard_normal((T, in_dim)).astype(np.float32)
    offsets = np.array([0, 25, T])
    np.save(tmp_path / "data_test.npy", x)
    np.save(tmp_path / "offsets_test.npy", offsets)

    # reference posteriors via the chainer-semantics oracle per utterance
    refs = []
    for u in range(2):
        seg = x[offsets[u]:offsets[u + 1]][None]
        h = _chainer_lstm_oracle(src, "predictor/layer_0", seg)[0]
        logits = h @ out["W"].T + out["b"]
        refs.append(logits - ref_logsum(logits, axis=1))
    np.save(tmp_path / "ref_post.npy", np.concatenate(refs, axis=0))

    ok = parity_main([
        "--checkpoint", str(tmp_path / "model.npz"),
        "-n", "lstm", "-l", "1", "-u", "5", "--num-classes", "7",
        "--data-dir", str(tmp_path), "--offset-dir", str(tmp_path),
        "--out", str(tmp_path / "ours.npy"),
        "--reference-posteriors", str(tmp_path / "ref_post.npy"),
        "--atol", "1e-4",
    ])
    assert ok is True


# ---------------------------------------------------------------------------
# full-model parity THROUGH the data-prep path (train.py:224-264):
# splice -> feature transform -> i-vector concat -> time delay
# ---------------------------------------------------------------------------

def _write_ft_file(path, rng, in_dim, shifts):
    """Synthesize a Kaldi nnet1 feature transform in the reference's
    fixed-line format (kaldi/final.feature_transform:1-7)."""
    dim_out = in_dim * len(shifts)
    add = rng.standard_normal(dim_out).astype(np.float32) * 0.2
    scale = (rng.random(dim_out).astype(np.float32) * 0.5 + 0.75)
    fmt = lambda v: " ".join(repr(float(f)) for f in v)
    path.write_text(
        "<Nnet> \n"
        f"<Splice> {dim_out} {in_dim} \n"
        f"[ {' '.join(str(s) for s in shifts)} ]\n"
        f"<AddShift> {dim_out} {dim_out} \n"
        f"<LearnRateCoef> 0  [ {fmt(add)} ]\n"
        f"<Rescale> {dim_out} {dim_out} \n"
        f"<LearnRateCoef> 0  [ {fmt(scale)} ]\n"
        "</Nnet> \n")
    return add, scale


def _ref_splice(x, shifts):
    """Reference splicing (kw_utils.py:24-36): per-shift row clamp at
    the CORPUS edges (utterance boundaries are crossed), shift-major
    column blocks."""
    n = x.shape[0]
    cols = [x[np.clip(np.arange(n) + s, 0, n - 1)] for s in shifts]
    return np.concatenate(cols, axis=1)


def test_parity_full_prep_ff(tmp_path, rng):
    """FF parity gate through the real prep: splice ±2 -> (x+shift)*scale
    -> i-vector concat -> MLP -> log-softmax, vs an independent numpy
    transcription of the reference chain."""
    from nnacousticmodeling_tpu.pipeline.parity import main as parity_main
    from nnacousticmodeling_tpu.ops.numerics import ref_logsum

    in_dim, iv_dim, units, classes, T = 4, 3, 6, 7, 30
    shifts = list(range(-2, 3))
    add, scale = _write_ft_file(tmp_path / "ft.txt", rng, in_dim, shifts)

    model_in = in_dim * len(shifts) + iv_dim
    src = {}
    dims = [model_in, units]
    for l in range(2):
        lin = _rand_linear(rng, units, dims[min(l, 1)])
        src[f"predictor/layer_{l}/W"] = lin["W"]
        src[f"predictor/layer_{l}/b"] = lin["b"]
    out = _rand_linear(rng, classes, units)
    src["predictor/out/W"] = out["W"]
    src["predictor/out/b"] = out["b"]
    np.savez(tmp_path / "model.npz", **src)

    x = rng.standard_normal((T, in_dim)).astype(np.float32)
    iv = rng.standard_normal((T, iv_dim)).astype(np.float32)
    np.save(tmp_path / "data_test.npy", x)
    np.save(tmp_path / "ivectors_test.npy", iv)
    np.save(tmp_path / "offsets_test.npy", np.array([0, T]))

    # independent oracle of the whole reference chain
    h = (_ref_splice(x, shifts) + add) * scale
    h = np.concatenate([h, iv], axis=1).astype(np.float32)
    for l in range(2):
        h = np.maximum(h @ src[f"predictor/layer_{l}/W"].T
                       + src[f"predictor/layer_{l}/b"], 0)
    logits = h @ out["W"].T + out["b"]
    ref = logits - ref_logsum(logits, axis=1)
    np.save(tmp_path / "ref_post.npy", ref)

    ok = parity_main([
        "--checkpoint", str(tmp_path / "model.npz"),
        "-n", "ff", "-l", "2", "-u", str(units),
        "--num-classes", str(classes),
        "--splice", "2", "--ft", "ft.txt",
        "--data-dir", str(tmp_path), "--offset-dir", str(tmp_path),
        "--ivector-dir", str(tmp_path),
        "--out", str(tmp_path / "ours.npy"),
        "--reference-posteriors", str(tmp_path / "ref_post.npy"),
        "--atol", "1e-4",
    ])
    assert ok is True


def test_parity_full_prep_lstm_timedelay(tmp_path, rng):
    """Recurrent parity gate through the real prep: center-specialized
    feature transform -> i-vector concat -> timedelay-2 inference with
    the reference's quirks (first k outputs dropped, last k rows zero —
    predict_folds.py:49-64)."""
    from nnacousticmodeling_tpu.pipeline.parity import main as parity_main
    from nnacousticmodeling_tpu.ops.numerics import ref_logsum

    in_dim, iv_dim, units, classes, delay = 4, 2, 5, 6, 2
    shifts = list(range(-2, 3))
    add, scale = _write_ft_file(tmp_path / "ft.txt", rng, in_dim, shifts)
    zi = shifts.index(0)
    add_c = add[zi * in_dim:(zi + 1) * in_dim]
    scale_c = scale[zi * in_dim:(zi + 1) * in_dim]

    model_in = in_dim + iv_dim
    src = {}
    src["predictor/layer_0/upward/W"] = rng.standard_normal(
        (4 * units, model_in)).astype(np.float32) * 0.3
    src["predictor/layer_0/upward/b"] = rng.standard_normal(
        4 * units).astype(np.float32) * 0.1
    src["predictor/layer_0/lateral/W"] = rng.standard_normal(
        (4 * units, units)).astype(np.float32) * 0.3
    out = _rand_linear(rng, classes, units)
    src["predictor/out/W"] = out["W"]
    src["predictor/out/b"] = out["b"]
    np.savez(tmp_path / "model.npz", **src)

    lengths = [17, 11]
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    T = int(offsets[-1])
    x = rng.standard_normal((T, in_dim)).astype(np.float32)
    iv = rng.standard_normal((T, iv_dim)).astype(np.float32)
    np.save(tmp_path / "data_test.npy", x)
    np.save(tmp_path / "ivectors_test.npy", iv)
    np.save(tmp_path / "offsets_test.npy", offsets)

    # oracle: center ft -> iv concat, then per-utterance chainer LSTM
    # over steps [0, l); output row r = log-softmax(step r+delay) for
    # r < l-delay, rows [l-delay, l) stay 0.0
    feats = np.concatenate([(x + add_c) * scale_c, iv],
                           axis=1).astype(np.float32)
    refs = []
    for u in range(len(lengths)):
        seg = feats[offsets[u]:offsets[u + 1]][None]
        h = _chainer_lstm_oracle(src, "predictor/layer_0", seg)[0]
        logits = h @ out["W"].T + out["b"]
        lp = logits - ref_logsum(logits, axis=1)
        o = np.zeros_like(lp)
        o[:lengths[u] - delay] = lp[delay:]
        refs.append(o)
    np.save(tmp_path / "ref_post.npy", np.concatenate(refs, axis=0))

    ok = parity_main([
        "--checkpoint", str(tmp_path / "model.npz"),
        "-n", "lstm", "-l", "1", "-u", str(units),
        "--num-classes", str(classes),
        "--timedelay", str(delay), "--ft", "ft.txt",
        "--data-dir", str(tmp_path), "--offset-dir", str(tmp_path),
        "--ivector-dir", str(tmp_path),
        "--out", str(tmp_path / "ours.npy"),
        "--reference-posteriors", str(tmp_path / "ref_post.npy"),
        "--atol", "1e-4",
    ])
    assert ok is True
