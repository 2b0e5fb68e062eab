"""Acoustic model zoo: behavioral twins of the reference networks
(``scripts/common/chainer_networks.py``) re-designed for TPU execution.

Uniform functional interface:

* ``net.init(key, in_dim) -> params`` (pytree of jnp arrays)
* feed-forward: ``net.apply(params, x, rng, train) -> logits`` on (N, D)
* recurrent: ``net.init_state(batch) -> state``;
  ``net.step(params, state, x, rng, train) -> (state, logits)`` on (B, D);
  ``net.apply_sequence(params, xs, state, rng, train) -> (logits, state)``
  on (B, T, D) — the hot path: each layer hoists its input projection out
  of the ``lax.scan`` as one large MXU matmul over all timesteps, only
  the (H, G*H) recurrent product runs per step.

Dropout placement matches the reference exactly: recurrent nets apply
dropout to the input and after every recurrent layer
(chainer_networks.py:58-62,137-141); MLP after each hidden activation;
TDNN after each conv activation; ZoneoutLSTM has no dropout at all.
Fresh dropout masks per timestep (Chainer draws a mask per call).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import cells

Activation = Callable[[jnp.ndarray], jnp.ndarray]

ACTIVATIONS = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
}


def dropout(rng, x, rate, train):
    """Inverted dropout, Chainer-compatible scaling (x/(1-rate) kept)."""
    if not train or rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _split(rng, n):
    if rng is None:
        return [None] * n
    return list(jax.random.split(rng, n))


# ---------------------------------------------------------------------------
# Feed-forward
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MLP:
    """MLP twin (chainer_networks.py:8-22): ``layers`` hidden layers of
    ``units``, activation+dropout after each, linear output."""

    units: int
    num_classes: int
    layers: int = 2
    dropout: float = 0.0
    activation: str = "relu"

    is_recurrent: bool = False

    def init(self, key, in_dim):
        keys = _split(key, self.layers + 1)
        params = {"hidden": [], "out": None}
        d = in_dim
        for l in range(self.layers):
            params["hidden"].append(cells.dense_params(keys[l], d, self.units))
            d = self.units
        params["out"] = cells.dense_params(keys[-1], d, self.num_classes)
        return params

    def apply(self, params, x, rng=None, train=False):
        act = ACTIVATIONS[self.activation]
        keys = _split(rng, self.layers)
        for l in range(self.layers):
            x = dropout(keys[l], act(cells.dense(params["hidden"][l], x)),
                        self.dropout, train)
        return cells.dense(params["out"], x)


@dataclass(frozen=True)
class TDNN:
    """TDNN twin (chainer_networks.py:24-42): 1-D convs over the splice
    window with per-layer kernel sizes, linear output on the collapsed
    window.

    Input is the spliced flat layout (N, winlen*D) with shift-major
    blocks (as produced by ``ops.splice_flat``); we reshape it to
    (N, winlen, D) and convolve over time with D input channels. The
    reference reshapes the same buffer to (N, D, 1, winlen) — a
    different (scrambled) channel/time assignment; both are linear
    re-indexings of the same window, so capacity and behavior under
    training match, and the weight converter maps one layout onto the
    other for parity checks.
    """

    units: Sequence[int]
    num_classes: int
    ksize: Sequence[int]
    dropout: float = 0.0
    activation: str = "relu"
    #: reproduce the reference's raw reshape of the spliced vector to
    #: (channels=D, width=winlen) — chainer_networks.py:39 — whose
    #: "channels" are scrambled mixtures of shifts; needed only for
    #: converting reference-trained TDNN checkpoints
    chainer_layout: bool = False

    is_recurrent: bool = False

    def __post_init__(self):
        if len(self.units) != len(self.ksize):
            raise ValueError("TDNN units must have the same length as ksize")

    @property
    def input_win_size(self) -> int:
        return sum(self.ksize) - len(self.ksize) + 1

    def init(self, key, in_dim):
        winlen = self.input_win_size
        if in_dim % winlen != 0:
            raise ValueError(
                f"TDNN input dim {in_dim} not divisible by window {winlen}")
        d = in_dim // winlen
        keys = _split(key, len(self.units) + 1)
        params = {"conv": [], "out": None}
        for l, (u, k) in enumerate(zip(self.units, self.ksize)):
            # conv kernel (k, d_in, d_out) for conv over the window axis
            scale = 1.0 / jnp.sqrt(k * d)
            w = jax.random.normal(keys[l], (k, d, u), dtype=jnp.float32) * scale
            params["conv"].append({"w": w, "b": jnp.zeros((u,), jnp.float32)})
            d = u
        params["out"] = cells.dense_params(keys[-1], d, self.num_classes)
        return params

    def apply(self, params, x, rng=None, train=False):
        act = ACTIVATIONS[self.activation]
        n = x.shape[0]
        winlen = self.input_win_size
        if self.chainer_layout:
            # (N, C=D, W) raw row-major reshape, then to NWC
            x = x.reshape(n, -1, winlen).transpose(0, 2, 1)
        else:
            x = x.reshape(n, winlen, -1)           # (N, W, D)
        keys = _split(rng, len(self.units))
        for l, k in enumerate(self.ksize):
            w = params["conv"][l]["w"]
            x = jax.lax.conv_general_dilated(
                x, w, window_strides=(1,), padding="VALID",
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=jnp.float32,
            ) + params["conv"][l]["b"]
            x = dropout(keys[l], act(x), self.dropout, train)
        x = x.reshape(n, -1)                       # window collapsed to 1
        return cells.dense(params["out"], x)


# ---------------------------------------------------------------------------
# Recurrent stacks
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class _RecurrentStack:
    """Shared machinery for stacked recurrent nets."""

    units: int
    num_classes: int
    layers: int = 2

    is_recurrent: bool = True

    # subclass hooks ---------------------------------------------------
    def _cell_init(self, key, in_dim):
        raise NotImplementedError

    def _cell_input_proj(self, params, x):
        raise NotImplementedError

    def _cell_step(self, params, carry, x_proj, rng, train):
        raise NotImplementedError

    def _cell_state(self, batch):
        raise NotImplementedError

    def _cell_scan_pallas(self, params, carry, proj):
        """Optional whole-sequence kernel: (carry, (T, B, G*H) proj) ->
        (carry', (T, B, H) hiddens), or None if this cell has no
        Pallas scan (the runner then falls back to ``lax.scan``)."""
        return None

    def _cell_scan_pallas_train(self, params, carry, proj):
        """Optional DIFFERENTIABLE whole-sequence kernel (custom VJP)
        for the training path; None falls back to lax.scan autodiff."""
        return None

    # dropout placement hooks (reference: dropout on input and after
    # every recurrent layer; ZoneoutLSTM overrides both off)
    input_dropout_rate: float = 0.0
    layer_dropout_rate: float = 0.0
    #: lax.scan unroll factor for the sequence runners — amortizes
    #: per-step dispatch on TPU (numerics unchanged); settable via
    #: ``dataclasses.replace`` for inference-heavy paths
    scan_unroll: int = 1
    #: "xla" (lax.scan) or "pallas" — the weight-resident VMEM kernels
    #: (ops/rnn_pallas.py) for cells that have one (LSTM, eval-time
    #: ZoneoutLSTM, GRU, MGRU±reset); plain LSTM also has a
    #: differentiable custom-VJP kernel for the TRAINING path
    #: (lstm_scan_pallas_train). Cells without a kernel fall back to
    #: lax.scan.
    scan_impl: str = "xla"

    def init(self, key, in_dim):
        keys = _split(key, self.layers + 1)
        params = {"cells": [], "out": None}
        d = in_dim
        for l in range(self.layers):
            params["cells"].append(self._cell_init(keys[l], d))
            d = self.units
        params["out"] = cells.dense_params(keys[-1], d, self.num_classes)
        return params

    def init_state(self, batch):
        return [self._cell_state(batch) for _ in range(self.layers)]

    def step(self, params, state, x, rng=None, train=False):
        """One timestep (B, D) -> (B, C)."""
        keys = _split(rng, self.layers + 1)
        x = dropout(keys[0], x, self.input_dropout_rate, train)
        new_state = []
        for l in range(self.layers):
            x_proj = self._cell_input_proj(params["cells"][l], x)
            carry, h = self._cell_step(params["cells"][l], state[l], x_proj,
                                       keys[l + 1], train)
            new_state.append(carry)
            x = dropout(keys[l + 1], h, self.layer_dropout_rate, train)
        return new_state, cells.dense(params["out"], x)

    def hidden_sequence(self, params, xs, state=None, rng=None, train=False):
        """(B, T, D) -> ((B, T, H) last-layer hiddens, state).
        Layer-by-layer scans with hoisted input projections; shared by
        ``apply_sequence`` and wrappers that replace the output
        projection (e.g. the CTC head)."""
        b, t, _ = xs.shape
        if state is None:
            state = self.init_state(b)
        keys = _split(rng, self.layers + 1)
        xs = dropout(keys[0], xs, self.input_dropout_rate, train)
        new_state = []
        for l in range(self.layers):
            layer_params = params["cells"][l]
            # hoisted input projection: one big MXU matmul over B*T rows
            proj = self._cell_input_proj(layer_params, xs.reshape(b * t, -1))
            proj = proj.reshape(b, t, -1).transpose(1, 0, 2)   # (T, B, G*H)
            step_keys = (jax.random.split(keys[l + 1], t)
                         if keys[l + 1] is not None else jnp.zeros((t, 2), jnp.uint32))

            pallas_res = None
            if self.scan_impl == "pallas":
                if train:
                    pallas_res = self._cell_scan_pallas_train(
                        layer_params, state[l], proj)
                else:
                    pallas_res = self._cell_scan_pallas(layer_params,
                                                        state[l], proj)
            if pallas_res is not None:
                carry, hs = pallas_res
            else:
                def scan_fn(carry, inp, _lp=layer_params):
                    x_proj, k = inp
                    k = k if rng is not None else None
                    return self._cell_step(_lp, carry, x_proj, k, train)

                carry, hs = jax.lax.scan(scan_fn, state[l], (proj, step_keys),
                                         unroll=self.scan_unroll)
            new_state.append(carry)
            xs = dropout(keys[l + 1], hs.transpose(1, 0, 2),
                         self.layer_dropout_rate, train)       # (B, T, H)
        return xs, new_state

    def apply_sequence(self, params, xs, state=None, rng=None, train=False):
        """(B, T, D) -> ((B, T, C), state)."""
        b, t, _ = xs.shape
        hs, new_state = self.hidden_sequence(params, xs, state, rng, train)
        logits = cells.dense(params["out"], hs.reshape(b * t, -1))
        return logits.reshape(b, t, -1), new_state


@dataclass(frozen=True)
class LSTM(_RecurrentStack):
    """LSTM stack twin (chainer_networks.py:44-62)."""

    dropout: float = 0.0

    def __post_init__(self):
        object.__setattr__(self, "input_dropout_rate", self.dropout)
        object.__setattr__(self, "layer_dropout_rate", self.dropout)

    def _cell_init(self, key, in_dim):
        return cells.lstm_init(key, in_dim, self.units)

    def _cell_input_proj(self, params, x):
        return cells.lstm_input_proj(params, x)

    def _cell_step(self, params, carry, x_proj, rng, train):
        return cells.lstm_step(params, carry, x_proj)

    def _cell_state(self, batch):
        return cells.lstm_init_state(batch, self.units)

    def _cell_scan_pallas(self, params, carry, proj):
        from ..ops.rnn_pallas import lstm_scan_pallas
        c, h = carry
        return lstm_scan_pallas(proj, params["wh"], c, h)

    def _cell_scan_pallas_train(self, params, carry, proj):
        from ..ops.rnn_pallas import lstm_scan_pallas_train
        c, h = carry
        return lstm_scan_pallas_train(proj, params["wh"], c, h)


@dataclass(frozen=True)
class ZoneoutLSTM(_RecurrentStack):
    """Zoneout LSTM stack twin (chainer_networks.py:64-81): zoneout on
    c and h, no dropout anywhere."""

    c_ratio: float = 0.5
    h_ratio: float = 0.5

    def _cell_init(self, key, in_dim):
        return cells.lstm_init(key, in_dim, self.units)

    def _cell_input_proj(self, params, x):
        return cells.lstm_input_proj(params, x)

    def _cell_step(self, params, carry, x_proj, rng, train):
        if rng is None:
            rng = jax.random.PRNGKey(0)  # eval path ignores it
        return cells.zoneout_lstm_step(
            params, carry, x_proj, rng=rng,
            c_ratio=self.c_ratio, h_ratio=self.h_ratio, train=train)

    def _cell_scan_pallas(self, params, carry, proj):
        # eval-time zoneout is a pass-through (cells.zoneout), so the
        # inference recurrence is exactly the plain-LSTM one
        from ..ops.rnn_pallas import lstm_scan_pallas
        c, h = carry
        return lstm_scan_pallas(proj, params["wh"], c, h)

    def _cell_state(self, batch):
        return cells.lstm_init_state(batch, self.units)


@dataclass(frozen=True)
class ZoneoutDropoutLSTM(ZoneoutLSTM):
    """Zoneout LSTM with input/inter-layer dropout on top
    (chainer_networks.py:83-101)."""

    dropout: float = 0.0

    def __post_init__(self):
        object.__setattr__(self, "input_dropout_rate", self.dropout)
        object.__setattr__(self, "layer_dropout_rate", self.dropout)


@dataclass(frozen=True)
class PeepholeLSTM(_RecurrentStack):
    """Peephole LSTM stack twin (chainer_networks.py:103-121)."""

    dropout: float = 0.0

    def __post_init__(self):
        object.__setattr__(self, "input_dropout_rate", self.dropout)
        object.__setattr__(self, "layer_dropout_rate", self.dropout)

    def _cell_init(self, key, in_dim):
        return cells.peephole_lstm_init(key, in_dim, self.units)

    def _cell_input_proj(self, params, x):
        return cells.lstm_input_proj(params, x)

    def _cell_step(self, params, carry, x_proj, rng, train):
        return cells.peephole_lstm_step(params, carry, x_proj)

    def _cell_scan_pallas(self, params, carry, proj):
        from ..ops.rnn_pallas import peephole_scan_pallas
        c, h = carry
        return peephole_scan_pallas(proj, params["wh"], params["peep_i"],
                                    params["peep_f"], params["peep_o"],
                                    c, h)

    def _cell_scan_pallas_train(self, params, carry, proj):
        from ..ops.rnn_pallas import peephole_scan_pallas_train
        c, h = carry
        return peephole_scan_pallas_train(
            proj, params["wh"], params["peep_i"], params["peep_f"],
            params["peep_o"], c, h)

    def _cell_state(self, batch):
        return cells.lstm_init_state(batch, self.units)


@dataclass(frozen=True)
class GRU(_RecurrentStack):
    """GRU stack twin (chainer_networks.py:123-141)."""

    dropout: float = 0.0

    def __post_init__(self):
        object.__setattr__(self, "input_dropout_rate", self.dropout)
        object.__setattr__(self, "layer_dropout_rate", self.dropout)

    def _cell_init(self, key, in_dim):
        return cells.gru_init(key, in_dim, self.units)

    def _cell_input_proj(self, params, x):
        return cells.gru_input_proj(params, x)

    def _cell_step(self, params, carry, x_proj, rng, train):
        return cells.gru_step(params, carry, x_proj)

    def _cell_state(self, batch):
        return cells.gru_init_state(batch, self.units)

    def _cell_scan_pallas(self, params, carry, proj):
        from ..ops.rnn_pallas import gated_scan_pallas
        h, fresh = carry
        if "bu" in params:
            # converted checkpoints: Chainer skips the whole U term
            # (incl. its bias) while h is None (MGRU.py:70-76) — fold
            # the live-gated bias into the proj stream so the kernel
            # sees a plain recurrence (live = 0 only at a fresh step 0)
            proj = proj + params["bu"]
            proj = proj.at[0].add(-fresh * params["bu"])
        h_t, hs = gated_scan_pallas(proj, params["wh_rz"],
                                    params["wh_c"], h, kind="gru")
        return (h_t, jnp.zeros_like(fresh)), hs

    def _cell_scan_pallas_train(self, params, carry, proj):
        from ..ops.rnn_pallas import gated_scan_pallas_train
        h, fresh = carry
        if "bu" in params:
            proj = proj + params["bu"]
            proj = proj.at[0].add(-fresh * params["bu"])
        h_t, hs = gated_scan_pallas_train(proj, params["wh_rz"],
                                          params["wh_c"], h, kind="gru")
        return (h_t, jnp.zeros_like(fresh)), hs


@dataclass(frozen=True)
class MGRUNet(_RecurrentStack):
    """Minimal-GRU stack twin (chainer_networks.py:143-161, MGRU.py)."""

    dropout: float = 0.0
    use_reset_gate: bool = False
    activation: str = "relu"

    def __post_init__(self):
        object.__setattr__(self, "input_dropout_rate", self.dropout)
        object.__setattr__(self, "layer_dropout_rate", self.dropout)

    def _cell_init(self, key, in_dim):
        return cells.mgru_init(key, in_dim, self.units, self.use_reset_gate)

    def _cell_input_proj(self, params, x):
        return cells.mgru_input_proj(params, x, self.use_reset_gate)

    def _cell_step(self, params, carry, x_proj, rng, train):
        return cells.mgru_step(params, carry, x_proj,
                               use_reset_gate=self.use_reset_gate,
                               activation=ACTIVATIONS[self.activation])

    def _cell_state(self, batch):
        return cells.gru_init_state(batch, self.units)

    def _cell_scan_pallas(self, params, carry, proj):
        from ..ops.rnn_pallas import gated_scan_pallas
        h, fresh = carry
        u = self.units
        # fold the live-gated converted-checkpoint U biases into the
        # proj stream (see the GRU hook; layout [z, cand, r?])
        if "bu_z" in params or "bu_r" in params:
            z = jnp.zeros((u,), jnp.float32)
            bu = jnp.concatenate(
                [params.get("bu_z", z), params.get("bu", z)]
                + ([params.get("bu_r", z)] if self.use_reset_gate else []))
            proj = proj + bu
            proj = proj.at[0].add(-fresh * bu)
        if self.use_reset_gate:
            w1 = jnp.concatenate([params["u_z"], params["u_r"]], axis=1)
            h_t, hs = gated_scan_pallas(
                proj, w1, params["u"], h, kind="mgru_r",
                activation=ACTIVATIONS[self.activation])
        else:
            w1 = jnp.concatenate([params["u_z"], params["u"]], axis=1)
            h_t, hs = gated_scan_pallas(
                proj, w1, None, h, kind="mgru",
                activation=ACTIVATIONS[self.activation])
        return (h_t, jnp.zeros_like(fresh)), hs

    def _cell_scan_pallas_train(self, params, carry, proj):
        from ..ops.rnn_pallas import gated_scan_pallas_train
        h, fresh = carry
        u = self.units
        if "bu_z" in params or "bu_r" in params:
            z = jnp.zeros((u,), jnp.float32)
            bu = jnp.concatenate(
                [params.get("bu_z", z), params.get("bu", z)]
                + ([params.get("bu_r", z)] if self.use_reset_gate else []))
            proj = proj + bu
            proj = proj.at[0].add(-fresh * bu)
        if self.use_reset_gate:
            w1 = jnp.concatenate([params["u_z"], params["u_r"]], axis=1)
            h_t, hs = gated_scan_pallas_train(
                proj, w1, params["u"], h, kind="mgru_r",
                activation=self.activation)
        else:
            w1 = jnp.concatenate([params["u_z"], params["u"]], axis=1)
            h_t, hs = gated_scan_pallas_train(
                proj, w1, None, h, kind="mgru",
                activation=self.activation)
        return (h_t, jnp.zeros_like(fresh)), hs


# ---------------------------------------------------------------------------
# Factory — twin of get_nn (chainer_networks.py:163-187)
# ---------------------------------------------------------------------------

def get_network(network: str, layers: int, units: Sequence[int],
                num_classes: int, activation: str = "relu",
                tdnn_ksize: Sequence[int] = (5,),
                dropout: Sequence[float] = (0.0,)):
    dropout = list(dropout) if not isinstance(dropout, (int, float)) else [dropout]
    if network == "ff":
        return MLP(units=units[0], num_classes=num_classes, layers=layers,
                   dropout=dropout[0], activation=activation)
    if network == "tdnn":
        return TDNN(units=tuple(units), num_classes=num_classes,
                    ksize=tuple(tdnn_ksize), dropout=dropout[0],
                    activation=activation)
    if network == "lstm":
        return LSTM(units=units[0], num_classes=num_classes, layers=layers,
                    dropout=dropout[0])
    if network == "zoneoutlstm":
        # reference: ZoneoutLSTM(units, classes, layers, *dropout) —
        # dropout values map positionally onto (c_ratio, h_ratio) with
        # 0.5 defaults (chainer_networks.py:65,171)
        c = dropout[0] if len(dropout) >= 1 else 0.5
        h = dropout[1] if len(dropout) >= 2 else 0.5
        return ZoneoutLSTM(units=units[0], num_classes=num_classes,
                           layers=layers, c_ratio=c, h_ratio=h)
    if network == "zoneoutdropoutlstm":
        # reference: (..., layers, *dropout) -> (dropout, c_ratio, h_ratio)
        d = dropout[0] if len(dropout) >= 1 else 0.0
        c = dropout[1] if len(dropout) >= 2 else 0.5
        h = dropout[2] if len(dropout) >= 3 else 0.5
        return ZoneoutDropoutLSTM(units=units[0], num_classes=num_classes,
                                  layers=layers, dropout=d,
                                  c_ratio=c, h_ratio=h)
    if network == "peepholelstm":
        return PeepholeLSTM(units=units[0], num_classes=num_classes,
                            layers=layers, dropout=dropout[0])
    if network == "gru":
        return GRU(units=units[0], num_classes=num_classes, layers=layers,
                   dropout=dropout[0])
    if network == "mgrurelu":
        return MGRUNet(units=units[0], num_classes=num_classes, layers=layers,
                       dropout=dropout[0], use_reset_gate=False)
    if network == "mgrurelur":
        return MGRUNet(units=units[0], num_classes=num_classes, layers=layers,
                       dropout=dropout[0], use_reset_gate=True)
    raise ValueError(f"unknown network type: {network}")


def is_recurrent(network: str) -> bool:
    """Name-based predicate, twin of is_nn_recurrent
    (chainer_networks.py:186-187)."""
    return (network.endswith("lstm") or network.startswith("gru")
            or network.startswith("mgru"))
