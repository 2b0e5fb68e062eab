"""End-to-end CTC phone recognition (stretch capability beyond the
reference's hybrid HMM pipeline — BASELINE.json configs[4]).

A bidirectional wrapper over any recurrent stack from the zoo feeds a
phone+blank softmax trained with CTC; greedy best-path decoding
collapses repeats and removes blanks. Shares the feature pipeline and
PER scorer with the hybrid path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import cells
from .networks import _RecurrentStack

BLANK_ID = 0


def _reverse_within_length(x, lengths):
    """Reverse (B, T, D) along T inside each row's length; padded
    positions keep their index (their content is masked downstream)."""
    b, t = x.shape[0], x.shape[1]
    pos = jnp.arange(t)[None, :]
    lengths = jnp.asarray(lengths)[:, None]
    idx = jnp.where(pos < lengths, lengths - 1 - pos, pos)      # (B, T)
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


@dataclass(frozen=True)
class BiRNNCTC:
    """Bidirectional recurrent CTC model.

    ``base`` is any recurrent stack spec (LSTM/GRU/...); its output
    projection is unused — forward and backward passes run the stack's
    cells and their concatenated last-layer states feed a fresh
    projection to ``num_phones + 1`` classes (blank = 0).
    """

    base: _RecurrentStack
    num_phones: int

    @property
    def num_classes(self) -> int:
        return self.num_phones + 1

    def init(self, key, in_dim):
        kf, kb, ko = jax.random.split(key, 3)
        fwd = self.base.init(kf, in_dim)
        bwd = self.base.init(kb, in_dim)
        out = cells.dense_params(ko, 2 * self.base.units, self.num_classes)
        return {"fwd": fwd, "bwd": bwd, "out": out}

    def apply_sequence(self, params, xs, lengths=None, rng=None,
                       train=False):
        """(B, T, D) -> (B, T, num_phones+1) logits.

        ``lengths`` (B,) makes the backward pass reverse each sequence
        WITHIN its own length, so shorter utterances in a padded batch
        do not feed trailing padding into the backward state — logits
        on valid frames are then identical regardless of batch padding.
        Without lengths the whole padded axis reverses (only correct
        for unpadded batches).
        """
        kf = kb = None
        if rng is not None:
            kf, kb = jax.random.split(rng)
        h_fwd, _ = self.base.hidden_sequence(params["fwd"], xs, rng=kf,
                                             train=train)
        if lengths is None:
            bwd_in = xs[:, ::-1]
        else:
            bwd_in = _reverse_within_length(xs, lengths)
        h_bwd, _ = self.base.hidden_sequence(params["bwd"], bwd_in,
                                             rng=kb, train=train)
        if lengths is None:
            h_bwd = h_bwd[:, ::-1]
        else:
            h_bwd = _reverse_within_length(h_bwd, lengths)
        h = jnp.concatenate([h_fwd, h_bwd], axis=-1)
        b, t, _ = h.shape
        logits = cells.dense(params["out"], h.reshape(b * t, -1))
        return logits.reshape(b, t, -1)


def ctc_loss(logits, logit_lengths, labels, label_lengths):
    """Mean CTC loss over a padded batch (blank = 0)."""
    b, t, _ = logits.shape
    logit_pad = (jnp.arange(t)[None, :] >= logit_lengths[:, None]
                 ).astype(jnp.float32)
    label_pad = (jnp.arange(labels.shape[1])[None, :]
                 >= label_lengths[:, None]).astype(jnp.float32)
    per_seq = optax.ctc_loss(logits, logit_pad, labels, label_pad,
                             blank_id=BLANK_ID)
    return per_seq.mean()


def greedy_decode(logits, lengths) -> List[List[int]]:
    """Best-path decode: framewise argmax, collapse repeats, drop
    blanks. Returns phone-id sequences (ids are 1-based; 0 = blank)."""
    path = np.asarray(jnp.argmax(logits, axis=-1))
    out = []
    for b in range(path.shape[0]):
        seq = []
        prev = -1
        for t in range(int(lengths[b])):
            s = int(path[b, t])
            if s != prev and s != BLANK_ID:
                seq.append(s)
            prev = s
        out.append(seq)
    return out


def make_ctc_train_step(model: BiRNNCTC, opt):
    @jax.jit
    def step(params, opt_state, xs, x_lens, labels, y_lens, rng):
        def loss_fn(p):
            logits = model.apply_sequence(p, xs, lengths=x_lens, rng=rng,
                                          train=True)
            return ctc_loss(logits, x_lens, labels, y_lens)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
