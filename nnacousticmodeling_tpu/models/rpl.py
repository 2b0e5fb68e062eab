"""Regularization Post Layer calibration heads.

Behavioral twins of ``scripts/common/RPL.py``: applied to (already
ensemble-averaged) logits, they log-softmax the input and add a learned
residual, with a log-floor ``lb`` merged in via logaddexp. RPL4 — the
variant the reference actually trains (train.py:105, evaluate.py:127) —
uses a diagonal scale + bias: ``y = logaddexp(x + x*W + b, lb)`` with
W, b zero-init and lb init -20 (RPL.py:58-74).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..ops.numerics import log_softmax
from .cells import dense_params, dense, _dense_init
import jax


def _logaddexp(h, lb):
    mx = jnp.maximum(h, lb)
    mn = jnp.minimum(h, lb)
    return mx + jnp.log(1.0 + jnp.exp(mn - mx))


@dataclass(frozen=True)
class RPL0:
    """Identity head (RPL.py:8-13)."""

    num_classes: int

    def init(self, key):
        return {}

    def apply(self, params, x):
        return x


@dataclass(frozen=True)
class RPL1:
    """Full linear residual head (RPL.py:15-24): y = ls(x) + ls(x) @ W + b."""

    num_classes: int

    def init(self, key):
        return {"l": dense_params(key, self.num_classes, self.num_classes)}

    def apply(self, params, x):
        x = log_softmax(x, axis=-1)
        return x + dense(params["l"], x)


@dataclass(frozen=True)
class RPL2:
    """Zero-init linear residual with log-floor (RPL.py:26-40).

    RPL3 (RPL.py:42-56) is byte-identical to RPL2 in the reference; use
    this class for both.
    """

    num_classes: int

    def init(self, key):
        n = self.num_classes
        return {
            "l": {"w": jnp.zeros((n, n), jnp.float32),
                  "b": jnp.zeros((n,), jnp.float32)},
            "lb": jnp.full((1, n), -20.0, jnp.float32),
        }

    def apply(self, params, x):
        x = log_softmax(x, axis=-1)
        h = x + dense(params["l"], x)
        return _logaddexp(h, params["lb"])


RPL3 = RPL2


@dataclass(frozen=True)
class RPL4:
    """Diagonal scale + bias + log-floor (RPL.py:58-74) — the variant
    trained by the pipeline: y = logaddexp(ls(x)*(1+W) + b, lb)."""

    num_classes: int

    def init(self, key):
        n = self.num_classes
        return {
            "w": jnp.zeros((1, n), jnp.float32),
            "b": jnp.zeros((1, n), jnp.float32),
            "lb": jnp.full((1, n), -20.0, jnp.float32),
        }

    def apply(self, params, x):
        x = log_softmax(x, axis=-1)
        h = x + x * params["w"] + params["b"]
        return _logaddexp(h, params["lb"])


RPL_VARIANTS = {0: RPL0, 1: RPL1, 2: RPL2, 3: RPL3, 4: RPL4}


def get_rpl(variant: int, num_classes: int):
    return RPL_VARIANTS[variant](num_classes)
