"""Inference engine + synthetic corpus tests, culminating in the full
synthetic end-to-end: oracle posteriors -> Viterbi -> MLF -> PER ~ 0."""

import numpy as np
import pytest

import jax

from nnacousticmodeling_tpu.decoder import (
    ViterbiDecoder, make_synthetic_image, compute_per,
)
from nnacousticmodeling_tpu.infer import (
    ff_log_posteriors, rnn_log_posteriors, ensemble_log_posteriors,
)
from nnacousticmodeling_tpu.io.mlf import MlfEntry
from nnacousticmodeling_tpu.models import (
    get_network, Ensemble, stack_fold_params, RPL4,
)
from nnacousticmodeling_tpu.ops.numerics import log_softmax
from nnacousticmodeling_tpu.utils.synthetic import make_synthetic_corpus

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def syn():
    img = make_synthetic_image(num_phones=5, num_states=20, seed=7, tied=False)
    corpus = make_synthetic_corpus(img, dim=12, num_train=12, num_dev=6,
                                   num_test=6, noise=0.3, seed=7)
    return img, corpus


def test_synthetic_corpus_layout(syn):
    img, corpus = syn
    assert corpus.train.num_utts == 12
    assert corpus.train.dim == 12
    assert corpus.train.targets.max() < img.num_states
    assert len(corpus.ref_mlf["test"]) == 6
    # MLF segments tile each utterance exactly
    for name, segs in corpus.ref_mlf["test"]:
        u = corpus.test.utt_names.index(name)
        assert segs[0][0] == 0
        assert segs[-1][1] == corpus.test.utt_lengths[u]
        for (b1, e1, _), (b2, e2, _) in zip(segs[:-1], segs[1:]):
            assert e1 == b2


def test_ff_posteriors_match_direct(syn, rng):
    _, corpus = syn
    net = get_network("ff", 2, [16], 20)
    params = net.init(KEY, 12)
    x = corpus.dev.data
    got = ff_log_posteriors(net, params, x, chunk=64)
    direct = np.asarray(log_softmax(net.apply(params, x), axis=-1))
    np.testing.assert_allclose(got, direct, atol=1e-5)
    assert got.shape == (x.shape[0], 20)


def test_rnn_posteriors_match_direct(syn):
    _, corpus = syn
    net = get_network("lstm", 1, [16], 20)
    params = net.init(KEY, 12)
    c = corpus.dev
    got = rnn_log_posteriors(net, params, c.data, c.offsets, batch=4)
    # direct: per-utterance full scan
    outs = []
    for u in range(c.num_utts):
        y, _ = net.apply_sequence(params, c.utt(u)[None])
        outs.append(np.asarray(log_softmax(y[0], axis=-1)))
    direct = np.concatenate(outs, axis=0)
    np.testing.assert_allclose(got, direct, atol=1e-4)


def test_rnn_posteriors_pallas_scan_impl(syn):
    """--scan-impl pallas end to end through the bucketed runner:
    posteriors match the lax.scan runner within the kernel's
    bf16-matmul tolerance (ops/rnn_pallas.py)."""
    import dataclasses
    _, corpus = syn
    net = get_network("lstm", 1, [16], 20)
    params = net.init(KEY, 12)
    c = corpus.dev
    got_xla = rnn_log_posteriors(net, params, c.data, c.offsets, batch=4)
    net_pl = dataclasses.replace(net, scan_impl="pallas")
    got_pl = rnn_log_posteriors(net_pl, params, c.data, c.offsets, batch=4)
    np.testing.assert_allclose(got_pl, got_xla, atol=5e-2)


def test_scan_impl_cli_plumbing():
    """build_network forwards --scan-impl to recurrent nets and leaves
    non-recurrent ones untouched."""
    import argparse
    from nnacousticmodeling_tpu.pipeline.common import (
        add_network_args, build_network)
    parser = argparse.ArgumentParser()
    add_network_args(parser)
    args = parser.parse_args(["-n", "lstm", "-l", "1", "-u", "16",
                              "--scan-impl", "pallas"])
    assert build_network(args, 20).scan_impl == "pallas"
    args = parser.parse_args(["-n", "ff", "--scan-impl", "pallas"])
    build_network(args, 20)  # non-recurrent: flag is a no-op, no crash


def test_rnn_posteriors_timedelay(syn):
    """With timedelay k the first k outputs are dropped: output t
    corresponds to input frame t+k (predict_folds.py:60-61)."""
    _, corpus = syn
    net = get_network("lstm", 1, [16], 20)
    params = net.init(KEY, 12)
    c = corpus.dev
    got = rnn_log_posteriors(net, params, c.data, c.offsets, timedelay=3, batch=4)
    assert got.shape[0] == c.num_frames
    u0 = c.utt(0)
    padded = np.pad(u0, ((0, 3), (0, 0)), "edge")
    y, _ = net.apply_sequence(params, padded[None])
    direct = np.asarray(log_softmax(y[0], axis=-1))[3:3 + len(u0)]
    np.testing.assert_allclose(got[:len(u0) - 3], direct[:-3], atol=1e-4)
    # reference quirk: the last k rows per utterance stay zero
    # (predict_folds.py:49-61 never writes them)
    np.testing.assert_array_equal(got[len(u0) - 3:len(u0)], 0.0)


def test_ensemble_posteriors(syn):
    _, corpus = syn
    net = get_network("ff", 1, [16], 20)
    master = net.init(jax.random.PRNGKey(1), 12)
    folds = [net.init(jax.random.PRNGKey(i + 2), 12) for i in range(2)]
    rpl = RPL4(20)
    ens = Ensemble(network=net, rpl=rpl, num_folds=2)
    params = {"master": master, "folds": stack_fold_params(folds),
              "rpl": rpl.init(KEY)}
    x = corpus.dev.data[:50]
    got = ensemble_log_posteriors(ens, params, x)
    direct = np.asarray(log_softmax(ens.apply(params, x), axis=-1))
    np.testing.assert_allclose(got, direct, atol=1e-5)


def test_oracle_end_to_end_per_near_zero(syn):
    """Nearest-mean 'oracle' posteriors through the full decode should
    recover the generating phone sequence almost perfectly."""
    img, corpus = syn
    c = corpus.test
    # Gaussian-classifier log posteriors from the true cluster means
    d2 = ((c.data[:, None, :] - corpus.pdf_means[None]) ** 2).sum(-1)
    lp = -0.5 * d2 / (0.3 ** 2)
    lp = lp - np.log(np.exp(lp - lp.max(1, keepdims=True)).sum(1, keepdims=True)) \
        - lp.max(1, keepdims=True)

    dec = ViterbiDecoder(img, pip=2.0, lmw=1.0)
    test_mlf = {}
    ref_mlf = {}
    for i, (name, segs) in enumerate(corpus.ref_mlf["test"]):
        res = dec.decode_one(lp[c.offsets[i]:c.offsets[i + 1]].astype(np.float32))
        test_mlf[name] = MlfEntry(words=res.phones, orig_id=i)
        ref_mlf[name] = MlfEntry(words=[s[2] for s in segs], orig_id=i)
    per = compute_per(test_mlf, ref_mlf, nist=False)
    assert per < 15.0, f"oracle PER too high: {per}"
