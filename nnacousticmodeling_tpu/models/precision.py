"""Reduced-precision inference utilities.

The parity paths stay float32 (bit-exactness against the reference and
the native decoder); these helpers provide an opt-in bfloat16 compute
path for production serving where ~1e-2 logit deviations are
acceptable: parameters and activations cast to bf16, the final logits
cast back to f32 before prior subtraction / log-softmax / decode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_params(params, dtype=jnp.bfloat16):
    """Cast every floating-point leaf; integer leaves untouched."""
    def cast(leaf):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(dtype)
        return leaf
    return jax.tree_util.tree_map(cast, params)


class HalfPrecisionNet:
    """Wraps a network for bf16 compute with f32 outputs.

    Works with both the FF ``apply`` and recurrent ``apply_sequence``
    interfaces, so it drops into the inference helpers
    (``infer.ff_log_posteriors`` / ``rnn_log_posteriors``).
    """

    def __init__(self, net, dtype=jnp.bfloat16):
        self.net = net
        self.dtype = dtype
        self.is_recurrent = getattr(net, "is_recurrent", False)

    def cast(self, params):
        return cast_params(params, self.dtype)

    def apply(self, params, x, rng=None, train=False):
        y = self.net.apply(params, x.astype(self.dtype), rng=rng, train=train)
        return y.astype(jnp.float32)

    def init_state(self, batch):
        state = self.net.init_state(batch)
        return jax.tree_util.tree_map(
            lambda a: a.astype(self.dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, state)

    def apply_sequence(self, params, xs, state=None, rng=None, train=False):
        if state is None:
            state = self.init_state(xs.shape[0])
        y, new_state = self.net.apply_sequence(
            params, xs.astype(self.dtype), state, rng=rng, train=train)
        return y.astype(jnp.float32), new_state
