"""Recurrent cells as pure step functions for ``lax.scan``.

Each cell is defined by ``init(key, in_dim, units) -> params`` and
``step(params, carry, x, *, rng, train) -> (carry, h)`` operating on one
timestep ``x`` of shape (B, D). Gate equations are behavioral twins of
the Chainer links the reference uses (chainer_networks.py:44-161,
MGRU.py:67-85), with zero initial state matching Chainer's ``h is None``
semantics; parameter layout is our own (dense (in, out) matrices, block
gate packing) — a Chainer-weight converter maps the reference layout
onto this one for parity checks.

Design note (TPU): all per-step matmuls on the input x are hoisted out
of the scan by the sequence runners in ``networks.py`` — the input
projections for the whole sequence are computed as one large (B*T, D) @
(D, G*H) MXU matmul, and only the recurrent H @ (H, G*H) product stays
inside the scan. This keeps the MXU busy and minimizes per-step
overhead, instead of translating Chainer's per-frame loop.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


def _dense_init(key, in_dim, out_dim, scale=None):
    """LeCun-normal-ish init matching Chainer's default
    (``initializers.LeCunNormal`` scaled by 1/sqrt(fan_in))."""
    if scale is None:
        scale = 1.0 / jnp.sqrt(in_dim)
    return jax.random.normal(key, (in_dim, out_dim), dtype=jnp.float32) * scale


def dense_params(key, in_dim, out_dim):
    wkey, _ = jax.random.split(key)
    return {"w": _dense_init(wkey, in_dim, out_dim),
            "b": jnp.zeros((out_dim,), dtype=jnp.float32)}


def dense(params, x):
    return x @ params["w"] + params["b"]


# ---------------------------------------------------------------------------
# LSTM (Chainer L.LSTM twin: gates a,i,f,o; forget bias init 1)
# ---------------------------------------------------------------------------

def lstm_init(key, in_dim, units):
    k1, k2 = jax.random.split(key)
    b = jnp.zeros((4 * units,), dtype=jnp.float32)
    # forget gate bias 1.0 (Chainer L.LSTM forget_bias_init=1)
    b = b.at[2 * units:3 * units].set(1.0)
    return {
        "wx": _dense_init(k1, in_dim, 4 * units),
        "wh": _dense_init(k2, units, 4 * units),
        "b": b,
    }


def lstm_gates(units, z):
    """Split a (B, 4H) pre-activation into a (candidate), i, f, o."""
    a = jnp.tanh(z[:, 0 * units:1 * units])
    i = jax.nn.sigmoid(z[:, 1 * units:2 * units])
    f = jax.nn.sigmoid(z[:, 2 * units:3 * units])
    o = jax.nn.sigmoid(z[:, 3 * units:4 * units])
    return a, i, f, o


def lstm_step(params, carry, x_proj):
    """One LSTM step. ``x_proj`` is the precomputed input projection
    (B, 4H); the recurrent projection happens here."""
    c, h = carry
    units = c.shape[-1]
    z = x_proj + h @ params["wh"]
    a, i, f, o = lstm_gates(units, z)
    c_new = f * c + i * a
    h_new = o * jnp.tanh(c_new)
    return (c_new, h_new), h_new


def lstm_input_proj(params, x):
    return x @ params["wx"] + params["b"]


def lstm_init_state(batch, units, dtype=jnp.float32):
    z = jnp.zeros((batch, units), dtype=dtype)
    return (z, z)


# ---------------------------------------------------------------------------
# Zoneout LSTM (Chainer L.StatefulZoneoutLSTM twin)
# ---------------------------------------------------------------------------

def zoneout(rng, ratio, prev, new, train):
    """Zoneout: keep the previous state element-wise with prob ``ratio``
    during training; pass the new state through at eval (Chainer
    F.zoneout semantics)."""
    if not train or ratio == 0.0:
        return new
    keep = jax.random.bernoulli(rng, ratio, new.shape)
    return jnp.where(keep, prev, new)


def zoneout_lstm_step(params, carry, x_proj, *, rng, c_ratio, h_ratio, train):
    c, h = carry
    units = c.shape[-1]
    z = x_proj + h @ params["wh"]
    a, i, f, o = lstm_gates(units, z)
    c_cand = f * c + i * a
    h_cand = o * jnp.tanh(c_cand)
    rc, rh = jax.random.split(rng)
    c_new = zoneout(rc, c_ratio, c, c_cand, train)
    h_new = zoneout(rh, h_ratio, h, h_cand, train)
    return (c_new, h_new), h_new


# ---------------------------------------------------------------------------
# Peephole LSTM (Chainer L.StatefulPeepholeLSTM twin)
# ---------------------------------------------------------------------------

def peephole_lstm_init(key, in_dim, units):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    # Chainer StatefulPeepholeLSTM: upward has a plain zero bias (no
    # forget-bias special case) and the peephole connections are FULL
    # (H, H) matrices, not diagonals.
    return {
        "wx": _dense_init(k1, in_dim, 4 * units),
        "wh": _dense_init(k2, units, 4 * units),
        "b": jnp.zeros((4 * units,), dtype=jnp.float32),
        "peep_i": _dense_init(k3, units, units),
        "peep_f": _dense_init(k4, units, units),
        "peep_o": _dense_init(k5, units, units),
    }


def peephole_lstm_step(params, carry, x_proj):
    c, h = carry
    units = c.shape[-1]
    z = x_proj + h @ params["wh"]
    a = jnp.tanh(z[:, 0 * units:1 * units])
    i = jax.nn.sigmoid(z[:, 1 * units:2 * units] + c @ params["peep_i"])
    f = jax.nn.sigmoid(z[:, 2 * units:3 * units] + c @ params["peep_f"])
    c_new = f * c + i * a
    o = jax.nn.sigmoid(z[:, 3 * units:4 * units] + c_new @ params["peep_o"])
    h_new = o * jnp.tanh(c_new)
    return (c_new, h_new), h_new


# ---------------------------------------------------------------------------
# GRU (Chainer L.GRU / StatefulGRU twin: h' = z*h_bar + (1-z)*h — note
# Chainer's z gates the CANDIDATE, not the old state; the reference's
# MGRU is a verbatim derivative of this link and shares the convention,
# MGRU.py:81)
# ---------------------------------------------------------------------------

def gru_init(key, in_dim, units):
    k1, k2 = jax.random.split(key)
    return {
        # packed input projections r,z,c and recurrent r,z (candidate U separate
        # because it multiplies r*h)
        "wx": _dense_init(k1, in_dim, 3 * units),
        "bx": jnp.zeros((3 * units,), dtype=jnp.float32),
        "wh_rz": _dense_init(k2, units, 2 * units),
        "wh_c": _dense_init(jax.random.fold_in(key, 2), units, units),
    }


def gru_input_proj(params, x):
    return x @ params["wx"] + params["bx"]


def gru_init_state(batch, units, dtype=jnp.float32):
    """Carry = (h, fresh): ``fresh`` (B, 1) is 1.0 until the first step
    has run. Chainer's stateful links skip the ENTIRE U term — including
    its bias — while ``h is None`` (MGRU.py:70-76); with h0 = 0 the
    matmul part vanishes on its own, and ``fresh`` gates the converted
    checkpoints' U-side biases (params key "bu") so first-frame outputs
    match exactly. Natively-initialized params have no "bu" and the flag
    is inert."""
    return (jnp.zeros((batch, units), dtype=dtype),
            jnp.ones((batch, 1), dtype=dtype))


def gru_step(params, carry, x_proj):
    h, fresh = carry
    units = h.shape[-1]
    rz = x_proj[:, :2 * units] + h @ params["wh_rz"]
    c_in = x_proj[:, 2 * units:]
    if "bu" in params:           # converted checkpoints: U biases, gated
        live = 1.0 - fresh
        rz = rz + live * params["bu"][:2 * units]
        c_in = c_in + live * params["bu"][2 * units:]
    r = jax.nn.sigmoid(rz[:, :units])
    z = jax.nn.sigmoid(rz[:, units:])
    h_bar = jnp.tanh(c_in + (r * h) @ params["wh_c"])
    # Chainer GRU: F.linear_interpolate(z, h_bar, h) = z*h_bar + (1-z)*h
    h_new = z * h_bar + (1.0 - z) * h
    return (h_new, jnp.zeros_like(fresh)), h_new


# ---------------------------------------------------------------------------
# MGRU — minimal GRU from the reference (MGRU.py:67-85):
#   z     = sigmoid(W_z x + U_z h)
#   h_bar = act(W x + U (r*h))          (r only if use_reset_gate)
#   h'    = z*h_bar + (1-z)*h           (note: opposite roles vs GRU)
# With h0 = 0 the first step reduces to h = z*h_bar, matching the
# reference's ``h is None`` branch (MGRU.py:83).
# ---------------------------------------------------------------------------

def mgru_init(key, in_dim, units, use_reset_gate):
    keys = jax.random.split(key, 6)
    params = {
        "w_z": _dense_init(keys[0], in_dim, units),
        "u_z": _dense_init(keys[1], units, units),
        "w": _dense_init(keys[2], in_dim, units),
        "u": _dense_init(keys[3], units, units),
        "b_z": jnp.zeros((units,), dtype=jnp.float32),
        "b": jnp.zeros((units,), dtype=jnp.float32),
    }
    if use_reset_gate:
        params["w_r"] = _dense_init(keys[4], in_dim, units)
        params["u_r"] = _dense_init(keys[5], units, units)
        params["b_r"] = jnp.zeros((units,), dtype=jnp.float32)
    return params


def mgru_input_proj(params, x, use_reset_gate):
    proj = [x @ params["w_z"] + params["b_z"], x @ params["w"] + params["b"]]
    if use_reset_gate:
        proj.append(x @ params["w_r"] + params["b_r"])
    return jnp.concatenate(proj, axis=-1)


def mgru_step(params, carry, x_proj, *, use_reset_gate, activation):
    h, fresh = carry             # fresh: see gru_init_state
    units = h.shape[-1]
    z_in = x_proj[:, :units]
    c_in = x_proj[:, units:2 * units]
    if "bu_z" in params:
        live = 1.0 - fresh
        z_in = z_in + live * params["bu_z"]
        c_in = c_in + live * params["bu"]
    z = jax.nn.sigmoid(z_in + h @ params["u_z"])
    if use_reset_gate:
        r_in = x_proj[:, 2 * units:]
        if "bu_r" in params:
            r_in = r_in + (1.0 - fresh) * params["bu_r"]
        r = jax.nn.sigmoid(r_in + h @ params["u_r"])
        h_bar = activation(c_in + (r * h) @ params["u"])
    else:
        h_bar = activation(c_in + h @ params["u"])
    h_new = z * h_bar + (1.0 - z) * h
    return (h_new, jnp.zeros_like(fresh)), h_new
