"""Fold-parallel training tests: index universes mirror the reference's
fold-concatenation semantics; all K folds learn in one vmapped run."""

import numpy as np
import pytest

import jax

from nnacousticmodeling_tpu.decoder import make_synthetic_image
from nnacousticmodeling_tpu.models import get_network
from nnacousticmodeling_tpu.train import TrainConfig, TrainStage
from nnacousticmodeling_tpu.train.fold_parallel import (
    fold_index_universe, train_folds_parallel,
)
from nnacousticmodeling_tpu.utils.synthetic import make_synthetic_corpus


def test_fold_index_universe():
    offsets = np.array([0, 3, 7, 10, 12])
    utt_folds = np.array([0, 1, 0, 1])
    frames, local = fold_index_universe(offsets, utt_folds, fold=1)
    # fold 1 trains on fold-0 utterances (utts 0 and 2), concatenated
    np.testing.assert_array_equal(frames, [0, 1, 2, 7, 8, 9])
    np.testing.assert_array_equal(local, [0, 3, 6])
    frames0, local0 = fold_index_universe(offsets, utt_folds, fold=0)
    np.testing.assert_array_equal(frames0, [3, 4, 5, 6, 10, 11])


@pytest.mark.parametrize("network", ["ff", "gru"])
def test_folds_train_in_parallel(network):
    img = make_synthetic_image(num_phones=4, num_states=16, seed=2, tied=False)
    corpus = make_synthetic_corpus(img, dim=10, num_train=24, num_dev=8,
                                   num_test=4, noise=0.4, seed=2)
    c = corpus.train
    utt_folds = np.arange(c.num_utts) % 3
    net = get_network(network, 1, [24], 16)
    cfg = TrainConfig(
        stages=[TrainStage(epoch=10, optimizer="adam", batch_size=16,
                           lr=1e-3, early_stopping=False)],
        bprop_len=8, seed=0, log=None, use_validation=False)
    fold_params = train_folds_parallel(
        net, c.data, c.targets, c.offsets, utt_folds, 3, cfg)
    assert len(fold_params) == 3
    # each fold must have learned something: accuracy on ITS held-out
    # fold beats chance (1/16)
    for k, params in enumerate(fold_params):
        utts = np.nonzero(utt_folds == k)[0]
        rows = np.concatenate([np.arange(c.offsets[u], c.offsets[u + 1])
                               for u in utts])
        if network == "ff":
            logits = np.asarray(net.apply(params, c.data[rows]))
        else:
            logits = np.asarray(net.apply_sequence(
                params, c.data[rows][None])[0][0])
        acc = (logits.argmax(-1) == c.targets[rows]).mean()
        assert acc > 0.3, f"fold {k} acc {acc}"
    # folds saw different data -> different params
    a = np.asarray(jax.tree_util.tree_leaves(fold_params[0])[0])
    b = np.asarray(jax.tree_util.tree_leaves(fold_params[1])[0])
    assert not np.allclose(a, b)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("network", ["ff", "lstm"])
def test_fold_mesh_matches_unsharded(network):
    """Sharding the fold axis over devices must not change the math
    (same RNG streams -> allclose params), with validation on."""
    from nnacousticmodeling_tpu.parallel import make_mesh
    img = make_synthetic_image(num_phones=4, num_states=16, seed=3, tied=False)
    corpus = make_synthetic_corpus(img, dim=10, num_train=16, num_dev=8,
                                   num_test=4, noise=0.4, seed=3)
    c, d = corpus.train, corpus.dev
    utt_folds = np.arange(c.num_utts) % 4
    net = get_network(network, 1, [16], 16)
    cfg = TrainConfig(
        stages=[TrainStage(epoch=3, optimizer="momentumsgd", batch_size=8,
                           lr=1e-2, early_stopping=False)],
        bprop_len=5, seed=0, log=None)
    kw = dict(x_dev=d.data, y_dev=d.targets)
    ref = train_folds_parallel(net, c.data, c.targets, c.offsets,
                               utt_folds, 4, cfg, **kw)
    got = train_folds_parallel(net, c.data, c.targets, c.offsets,
                               utt_folds, 4, cfg,
                               mesh=make_mesh({"fold": 4}), **kw)
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_compaction_drops_stopped_folds_same_result():
    """Early-stopped folds must leave the vmapped computation (no more
    forward/backward FLOPs for them) without changing any fold's final
    params vs the masked-lane implementation."""
    img = make_synthetic_image(num_phones=4, num_states=16, seed=5, tied=False)
    corpus = make_synthetic_corpus(img, dim=10, num_train=12, num_dev=4,
                                   num_test=4, noise=0.9, seed=5)
    c, d = corpus.train, corpus.dev
    utt_folds = np.arange(c.num_utts) % 4
    net = get_network("ff", 2, [64], 16)
    logs = []
    cfg = TrainConfig(
        stages=[TrainStage(epoch=30, optimizer="adam", batch_size=32,
                           lr=3e-2, early_stopping=True)],
        seed=0, log=logs.append)
    kw = dict(x_dev=d.data, y_dev=d.targets)
    got = train_folds_parallel(net, c.data, c.targets, c.offsets,
                               utt_folds, 4, cfg, **kw)
    # the noisy high-lr run must have stopped folds at different epochs
    # and compacted the stack at least once
    assert any("compacted" in m for m in logs), "\n".join(logs)
    cfg2 = TrainConfig(stages=cfg.stages, seed=0, log=None)
    ref = train_folds_parallel(net, c.data, c.targets, c.offsets,
                               utt_folds, 4, cfg2, compact=False, **kw)
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_fold_mesh_validation():
    """num_folds must divide the fold-axis size."""
    from nnacousticmodeling_tpu.parallel import make_mesh
    net = get_network("ff", 1, [8], 4)
    cfg = TrainConfig(stages=[TrainStage(1, "sgd", 4, 1e-2, False)],
                      log=None, use_validation=False)
    x = np.zeros((12, 4), np.float32)
    y = np.zeros(12, np.int32)
    if len(jax.devices()) >= 2:
        with pytest.raises(ValueError, match="not divisible"):
            train_folds_parallel(net, x, y, None, np.zeros(1, np.int64), 3,
                                 cfg, mesh=make_mesh({"fold": 2}))
