"""CTC stretch-model tests: shapes, loss finiteness, greedy decode
semantics, and end-to-end learning on the synthetic corpus (PER vs the
generating phone sequences must drop well below chance)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nnacousticmodeling_tpu.decoder import make_synthetic_image, nist_phone_errors
from nnacousticmodeling_tpu.models import GRU
from nnacousticmodeling_tpu.models.ctc import (
    BiRNNCTC, ctc_loss, greedy_decode, make_ctc_train_step,
)
from nnacousticmodeling_tpu.train.optimizers import make_optimizer
from nnacousticmodeling_tpu.utils.synthetic import make_synthetic_corpus


def test_greedy_decode_collapse():
    # blank=0; repeats collapse; blanks separate repeats
    logits = jnp.asarray(np.eye(4)[[1, 1, 0, 1, 2, 2, 0, 0, 3]][None] * 10.0)
    out = greedy_decode(logits, [9])
    assert out == [[1, 1, 2, 3]]


def test_ctc_loss_finite(rng):
    model = BiRNNCTC(base=GRU(units=16, num_classes=1, layers=1), num_phones=5)
    params = model.init(jax.random.PRNGKey(0), 8)
    xs = jnp.asarray(rng.standard_normal((2, 30, 8)).astype(np.float32))
    logits = model.apply_sequence(params, xs)
    assert logits.shape == (2, 30, 6)
    labels = jnp.asarray([[1, 2, 3, 0], [2, 4, 0, 0]], dtype=jnp.int32)
    loss = ctc_loss(logits, jnp.asarray([30, 25]), labels,
                    jnp.asarray([3, 2]))
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_ctc_learns_synthetic():
    img = make_synthetic_image(num_phones=4, num_states=16, seed=5, tied=False)
    corpus = make_synthetic_corpus(img, dim=10, num_train=32, num_dev=8,
                                   num_test=8, noise=0.3, seed=5)
    # phone name "p<k>" -> ctc id k+1 (0 is blank)
    def labels_of(entries):
        return [[int(p[1:]) + 1 for p in (s[2] for s in segs)]
                for _, segs in entries]

    train_labels = labels_of(corpus.ref_mlf["train"])
    c = corpus.train
    tmax = int(c.utt_lengths.max())
    lmax = max(len(l) for l in train_labels)
    B = c.num_utts
    xs = np.zeros((B, tmax, c.dim), np.float32)
    x_lens = np.zeros(B, np.int32)
    ys = np.zeros((B, lmax), np.int32)
    y_lens = np.zeros(B, np.int32)
    for u in range(B):
        xs[u, :c.utt_lengths[u]] = c.utt(u)
        x_lens[u] = c.utt_lengths[u]
        ys[u, :len(train_labels[u])] = train_labels[u]
        y_lens[u] = len(train_labels[u])

    model = BiRNNCTC(base=GRU(units=48, num_classes=1, layers=1), num_phones=4)
    params = model.init(jax.random.PRNGKey(0), c.dim)
    opt = make_optimizer("adam", 1e-3)
    opt_state = opt.init(params)
    step = make_ctc_train_step(model, opt)
    key = jax.random.PRNGKey(1)
    losses = []
    for it in range(300):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(xs),
                                       jnp.asarray(x_lens), jnp.asarray(ys),
                                       jnp.asarray(y_lens), k)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.1, losses[::50]

    # decode the test split and score
    t_entries = corpus.ref_mlf["test"]
    ct = corpus.test
    t_tmax = int(ct.utt_lengths.max())
    xs_t = np.zeros((ct.num_utts, t_tmax, ct.dim), np.float32)
    for u in range(ct.num_utts):
        xs_t[u, :ct.utt_lengths[u]] = ct.utt(u)
    logits = model.apply_sequence(params, jnp.asarray(xs_t),
                                  lengths=jnp.asarray(ct.utt_lengths))
    hyps = greedy_decode(logits, ct.utt_lengths)
    refs = labels_of(t_entries)
    errs = tot = 0
    for hyp, ref in zip(hyps, refs):
        n, h, d, i, s = nist_phone_errors([str(v) for v in hyp],
                                          [str(v) for v in ref])
        errs += d + i + s
        tot += n
    per = 100.0 * errs / tot
    assert per < 20.0, f"CTC PER too high: {per}"


def test_ctc_padding_invariance(rng):
    """Logits on valid frames must not depend on how much the batch is
    padded (regression: the backward pass used to consume padding)."""
    model = BiRNNCTC(base=GRU(units=12, num_classes=1, layers=1),
                     num_phones=4)
    params = model.init(jax.random.PRNGKey(0), 6)
    x = rng.standard_normal((1, 20, 6)).astype(np.float32)
    alone = model.apply_sequence(params, jnp.asarray(x),
                                 lengths=jnp.asarray([20]))
    padded = np.zeros((1, 50, 6), np.float32)
    padded[:, :20] = x
    in_batch = model.apply_sequence(params, jnp.asarray(padded),
                                    lengths=jnp.asarray([20]))
    np.testing.assert_allclose(np.asarray(alone[0, :20]),
                               np.asarray(in_batch[0, :20]), atol=1e-5)
