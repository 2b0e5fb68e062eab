"""Batched posterior inference.

Replaces the reference's inference loops (predict_folds.py:27-95,
evaluateModelForTest.py:52-122) with XLA-friendly equivalents:

* FF: fixed-size frame chunks through one jitted forward (the reference
  used 1024-frame windows with a per-frame Python window copy);
* recurrent: utterances bucketed by length into padded (B, T_bucket, D)
  tensors processed by one ``lax.scan`` forward per bucket — replacing
  the reference's per-timestep Python loop with shrinking dynamic batch
  (predict_folds.py:49-64), which is hostile to XLA. Masking reproduces
  the exact outputs; bucket shapes bound recompilation.

Output contract matches the reference: per-frame log-softmax
(optionally after subtracting ``ap`` log-priors, the evaluate-path
order: ``y -= ap`` then normalize — evaluateModelForTest.py:75-77).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.numerics import log_softmax


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def ff_log_posteriors(
    net,
    params,
    x: np.ndarray,
    ap: Optional[np.ndarray] = None,
    chunk: int = 8192,
) -> np.ndarray:
    """(N, D) frames -> (N, C) log posteriors via fixed-size chunks."""

    @jax.jit
    def forward(p, xs):
        y = net.apply(p, xs)
        if ap is not None:
            y = y - jnp.asarray(ap)
        return log_softmax(y, axis=-1)

    n = x.shape[0]
    outs = []
    for beg in range(0, n, chunk):
        end = min(beg + chunk, n)
        xs = x[beg:end]
        if end - beg < chunk:   # pad the tail to keep one compiled shape
            xs = np.pad(xs, ((0, chunk - (end - beg)), (0, 0)))
        outs.append(np.asarray(forward(params, jnp.asarray(xs)))[:end - beg])
    return np.concatenate(outs, axis=0)


def _buckets(lengths: np.ndarray, bucket_sizes: Sequence[int]):
    """Assign each utterance to the smallest bucket holding it."""
    out = []
    for l in lengths:
        for b in bucket_sizes:
            if l <= b:
                out.append(b)
                break
        else:
            raise ValueError(f"utterance length {l} exceeds largest bucket")
    return np.asarray(out)


def default_buckets(max_len: int) -> List[int]:
    sizes = [128]
    while sizes[-1] < max_len:
        sizes.append(sizes[-1] * 2)
    return sizes


def rnn_log_posteriors(
    net,
    params,
    x: np.ndarray,
    offsets: np.ndarray,
    ap: Optional[np.ndarray] = None,
    timedelay: int = 0,
    batch: int = 64,
    bucket_sizes: Optional[Sequence[int]] = None,
) -> np.ndarray:
    """Ragged utterances -> concatenated (N, C) log posteriors.

    With ``timedelay`` k the input of each utterance is edge-padded k
    frames on the right and the first k output frames are dropped,
    matching predict() (predict_folds.py:39,60-61) — including its
    quirk that the LAST k output rows of each utterance stay 0.0 (the
    shrinking-batch loop never writes them: the store condition
    ``utt_len > t`` fails for t >= l, predict_folds.py:49-61). The
    zeros feed RPL training and fold averaging in the reference, so
    they are reproduced for parity.
    """
    lengths = np.diff(offsets)
    num_utts = len(lengths)
    in_lengths = lengths + timedelay
    if bucket_sizes is None:
        bucket_sizes = default_buckets(int(in_lengths.max()))
    assignment = _buckets(in_lengths, bucket_sizes)

    @partial(jax.jit, static_argnums=(2,))
    def forward(p, xs, t_bucket):
        y, _ = net.apply_sequence(p, xs)
        if ap is not None:
            y = y - jnp.asarray(ap)
        return log_softmax(y, axis=-1)

    dim = x.shape[1]
    out = [None] * num_utts
    for b in sorted(set(assignment.tolist())):
        utt_ids = np.nonzero(assignment == b)[0]
        for beg in range(0, len(utt_ids), batch):
            ids = utt_ids[beg:beg + batch]
            bs = len(ids)
            # size the (typically final) remainder group to its own
            # rounded-up row count instead of the full ``batch`` — a
            # 5-utterance tail pays 8 rows, not 64 (one extra compile
            # per distinct padded size, bounded by log2 sizes)
            rows = min(batch, max(8, 1 << (bs - 1).bit_length()))
            xs = np.zeros((rows, b, dim), dtype=np.float32)
            for row, u in enumerate(ids):
                frames = x[offsets[u]:offsets[u + 1]]
                if timedelay > 0:
                    frames = np.pad(frames, ((0, timedelay), (0, 0)), "edge")
                xs[row, :frames.shape[0]] = frames
            y = np.asarray(forward(params, jnp.asarray(xs), b))
            for row, u in enumerate(ids):
                o = y[row, timedelay:timedelay + lengths[u]].copy()
                if timedelay > 0:
                    o[max(lengths[u] - timedelay, 0):] = 0.0
                out[u] = o
    return np.concatenate(out, axis=0)


def ensemble_log_posteriors(
    ensemble,
    params,
    x: np.ndarray,
    offsets: Optional[np.ndarray] = None,
    ap: Optional[np.ndarray] = None,
    timedelay: int = 0,
    batch: int = 64,
    chunk: int = 8192,
) -> np.ndarray:
    """Posteriors of an Ensemble (master+folds+RPL fused in one jitted
    forward — the fold average runs as a single vmapped computation, not
    K sequential passes like the reference)."""
    net = ensemble.network

    class _Wrapper:
        is_recurrent = net.is_recurrent

        def apply(self, p, xs, rng=None, train=False):
            return ensemble.apply(p, xs)

        def apply_sequence(self, p, xs, state=None, rng=None, train=False):
            return ensemble.apply_sequence(p, xs, state)

    w = _Wrapper()
    if net.is_recurrent:
        if offsets is None:
            raise ValueError("recurrent ensemble needs offsets")
        return rnn_log_posteriors(w, params, x, offsets, ap=ap,
                                  timedelay=timedelay, batch=batch)
    return ff_log_posteriors(w, params, x, ap=ap, chunk=chunk)
