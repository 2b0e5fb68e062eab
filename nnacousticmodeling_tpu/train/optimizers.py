"""Optimizers matching the reference's Chainer configurations
(train.py:296-305): SGD(lr), MomentumSGD(lr, momentum=0.9), and Adam
with Chainer 3.5 defaults (alpha=1e-3, beta1=0.9, beta2=0.999,
eps=1e-8; the staged ``lr`` is ignored for adam, train.py:286-287)."""

from __future__ import annotations

import optax


def make_optimizer(name: str, lr: float) -> optax.GradientTransformation:
    if name == "sgd":
        return optax.sgd(lr)
    if name == "momentumsgd":
        return optax.sgd(lr, momentum=0.9)
    if name == "adam":
        return optax.adam(1e-3, b1=0.9, b2=0.999, eps=1e-8)
    raise ValueError(f"unknown optimizer: {name}")
