"""Numerics shared across train/infer/decode paths."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

#: The reference's infinity stand-in (kw_utils.py:39, phone_recog.cpp:144).
REF_INF = 1e20


def log_softmax(x, axis: int = -1):
    """Stable log-softmax (jax). Matches the reference's
    ``y - logsum(y, axis=1)`` normalization (kw_utils.py:38-43) for
    finite inputs."""
    m = jnp.max(x, axis=axis, keepdims=True)
    return x - m - jnp.log(jnp.sum(jnp.exp(x - m), axis=axis, keepdims=True))


def ref_logsum(lp: np.ndarray, axis: int = 0) -> np.ndarray:
    """Bit-faithful twin of the reference ``logsum`` (kw_utils.py:38-43),
    including its NaN -> -1e20 replacement. numpy, host-side."""
    mx = np.max(lp, axis=axis).reshape([lp.shape[0], 1])
    lps = mx + np.log(np.sum(np.exp(lp - mx), axis=axis)).reshape([lp.shape[0], 1])
    lps[np.isnan(lps)] = -REF_INF
    return lps
