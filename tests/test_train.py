"""Training engine tests: schedule semantics, stream layout vs a direct
transcription of the reference iterator, learning on synthetic data,
early stopping, checkpoint roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nnacousticmodeling_tpu.decoder import make_synthetic_image
from nnacousticmodeling_tpu.models import get_network, RPL4
from nnacousticmodeling_tpu.train import (
    TrainConfig, TrainStage, build_stages, index_padded, train_network,
    sentence_shuffle_indices, stream_batch_indices,
    save_pytree, load_pytree,
)
from nnacousticmodeling_tpu.utils.synthetic import make_synthetic_corpus


def test_index_padded():
    assert index_padded([1, 2, 3], 0) == 1
    assert index_padded([1, 2, 3], 5) == 3


def test_build_stages_padding():
    stages = build_stages([20], ["adam", "momentumsgd"], [512, 128],
                          [1e-2, 1e-3, 1e-4, 1e-5], [True])
    assert len(stages) == 4
    assert [s.epoch for s in stages] == [20, 20, 20, 20]
    assert [s.optimizer for s in stages] == ["adam", "momentumsgd",
                                             "momentumsgd", "momentumsgd"]
    assert [s.batch_size for s in stages] == [512, 128, 128, 128]
    assert [s.lr for s in stages] == [1e-2, 1e-3, 1e-4, 1e-5]


def test_sentence_shuffle_preserves_order_within_utts(rng):
    offsets = np.array([0, 3, 8, 10])
    idx = sentence_shuffle_indices(offsets, 10, rng)
    assert sorted(idx.tolist()) == list(range(10))
    # each utterance's frames appear contiguous and in order
    s = idx.tolist()
    for beg, end in [(0, 3), (3, 8), (8, 10)]:
        frames = list(range(beg, end))
        pos = s.index(frames[0])
        assert s[pos:pos + len(frames)] == frames


def test_stream_batch_indices_match_reference_iterator():
    """Direct transcription of SequenceShuffleIterator.get_data
    (orcus_chainer_util.py:66,94-98) as the oracle."""
    n, batch_size, L = 37, 4, 5
    shuffled = np.random.default_rng(1).permutation(n)
    offsets = [i * n // batch_size for i in range(batch_size)]

    def ref_get(iteration):
        return [shuffled[(off + iteration) % n] for off in offsets]

    for start in [0, 3, 30]:
        got = stream_batch_indices(shuffled, batch_size, start, L)
        for t in range(L):
            assert got[:, t].tolist() == ref_get(start + t)


@pytest.fixture(scope="module")
def syn():
    img = make_synthetic_image(num_phones=4, num_states=16, seed=3, tied=False)
    return img, make_synthetic_corpus(img, dim=10, num_train=24, num_dev=8,
                                      num_test=4, noise=0.4, seed=3)


def test_ff_training_learns(syn):
    _, corpus = syn
    net = get_network("ff", 2, [32], 16)
    cfg = TrainConfig(
        stages=[TrainStage(epoch=5, optimizer="adam", batch_size=128,
                           lr=1e-3, early_stopping=False)],
        seed=0, log=None)
    res = train_network(net, corpus.train.data, corpus.train.targets, cfg,
                        x_dev=corpus.dev.data, y_dev=corpus.dev.targets)
    assert res.history[-1]["main/accuracy"] > 0.6
    assert res.history[-1]["main/loss"] < res.history[0]["main/loss"]
    assert "validation/main/loss" in res.history[-1]


def test_rnn_training_learns(syn):
    _, corpus = syn
    net = get_network("gru", 1, [32], 16)
    cfg = TrainConfig(
        stages=[TrainStage(epoch=6, optimizer="adam", batch_size=16,
                           lr=1e-3, early_stopping=False)],
        bprop_len=10, seed=0, log=None)
    res = train_network(net, corpus.train.data, corpus.train.targets, cfg,
                        offsets=corpus.train.offsets,
                        x_dev=corpus.dev.data, y_dev=corpus.dev.targets)
    assert res.history[-1]["main/accuracy"] > 0.5
    assert res.history[-1]["main/loss"] < res.history[0]["main/loss"]


@pytest.mark.parametrize("net_name,kwargs", [
    ("ff", {}), ("gru", {"offsets": True})])
def test_dispatch_modes_equivalent(syn, net_name, kwargs):
    """per_step and scan epoch dispatch must produce the same training
    trajectory (same rng split sequence, same update math); the engine
    default ("auto") resolves to scan — the safe measured mode (r05:
    per_step's tunnel dispatch overhead is catastrophic for
    Pallas-containing programs, 33 vs 8.7 ms/step)."""
    _, corpus = syn
    net = get_network(net_name, 1, [16], 16)
    runs = {}
    for mode in ("per_step", "scan"):
        cfg = TrainConfig(
            stages=[TrainStage(epoch=3, optimizer="adam", batch_size=16,
                               lr=1e-3, early_stopping=False)],
            bprop_len=10, seed=0, log=None, dispatch=mode)
        kw = dict(x_dev=corpus.dev.data, y_dev=corpus.dev.targets)
        if kwargs.get("offsets"):
            kw["offsets"] = corpus.train.offsets
        runs[mode] = train_network(net, corpus.train.data,
                                   corpus.train.targets, cfg, **kw)
    for ha, hb in zip(runs["per_step"].history, runs["scan"].history):
        np.testing.assert_allclose(ha["main/loss"], hb["main/loss"],
                                   rtol=1e-5)
    la = jax.tree_util.tree_leaves(runs["per_step"].params)
    lb = jax.tree_util.tree_leaves(runs["scan"].params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)
    from nnacousticmodeling_tpu.train.engine import _resolve_dispatch
    assert _resolve_dispatch(TrainConfig(stages=[])) == "scan"


def test_defer_metrics_same_history(syn):
    """defer_metrics=True keeps per-epoch metrics as device scalars
    until training ends; the finalized history must equal the eager
    run's values exactly."""
    _, corpus = syn
    net = get_network("ff", 1, [16], 16)

    def run(defer):
        cfg = TrainConfig(
            stages=[TrainStage(epoch=3, optimizer="adam", batch_size=64,
                               lr=1e-3, early_stopping=False)],
            seed=0, log=None, use_validation=False, defer_metrics=defer)
        return train_network(net, corpus.train.data, corpus.train.targets,
                             cfg)

    eager = run(False)
    deferred = run(True)
    for ha, hb in zip(eager.history, deferred.history):
        assert isinstance(hb["main/loss"], float)
        assert ha["main/loss"] == hb["main/loss"]
        assert ha["main/accuracy"] == hb["main/accuracy"]


def test_multi_stage_switches_optimizer(syn):
    _, corpus = syn
    net = get_network("ff", 1, [16], 16)
    cfg = TrainConfig(
        stages=build_stages([2], ["adam", "momentumsgd"], [64], [1e-2],
                            [False]),
        seed=0, log=None)
    res = train_network(net, corpus.train.data, corpus.train.targets, cfg,
                        x_dev=corpus.dev.data, y_dev=corpus.dev.targets)
    assert {h["stage"] for h in res.history} == {0, 1}


def test_early_stopping_fires(syn):
    """A huge LR makes validation loss blow up -> stage must stop before
    max epochs (trigger: val exceeds best by > 1e-3)."""
    _, corpus = syn
    net = get_network("ff", 1, [16], 16)
    cfg = TrainConfig(
        stages=[TrainStage(epoch=50, optimizer="momentumsgd", batch_size=64,
                           lr=5.0, early_stopping=True)],
        seed=0, log=None)
    res = train_network(net, corpus.train.data, corpus.train.targets, cfg,
                        x_dev=corpus.dev.data, y_dev=corpus.dev.targets)
    assert len(res.history) < 50


def test_rpl_training_path(syn):
    """RPL4 trains on (fold-output logits, targets) pairs via apply_fn;
    zero-init means it starts as floored log-softmax and must stay
    finite while improving CE."""
    _, corpus = syn
    rpl = RPL4(16)
    rpl_params = rpl.init(jax.random.PRNGKey(0))
    # fake fold outputs: noisy one-hot log posteriors
    rng = np.random.default_rng(0)
    n = corpus.train.num_frames
    x = rng.standard_normal((n, 16)).astype(np.float32) * 0.5
    x[np.arange(n), corpus.train.targets] += 3.0

    class _RplNet:
        is_recurrent = False
        def init(self, key, in_dim):
            return rpl_params
        def apply(self, p, xb, rng=None, train=False):
            return rpl.apply(p, xb)

    cfg = TrainConfig(
        stages=[TrainStage(epoch=3, optimizer="adam", batch_size=256,
                           lr=1e-3, early_stopping=False)],
        seed=0, log=None, use_validation=False)
    res = train_network(_RplNet(), x, corpus.train.targets, cfg)
    assert res.history[-1]["main/loss"] <= res.history[0]["main/loss"]
    assert np.isfinite(np.asarray(res.params["w"])).all()


def test_checkpoint_roundtrip(tmp_path, syn):
    _, corpus = syn
    net = get_network("lstm", 2, [8], 16)
    params = net.init(jax.random.PRNGKey(0), 10)
    f = str(tmp_path / "model.npz")
    save_pytree(f, params)
    template = net.init(jax.random.PRNGKey(1), 10)
    restored = load_pytree(f, template)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_shape_mismatch(tmp_path):
    net = get_network("ff", 1, [8], 5)
    params = net.init(jax.random.PRNGKey(0), 4)
    f = str(tmp_path / "model.npz")
    save_pytree(f, params)
    other = net.init(jax.random.PRNGKey(0), 6)   # different in_dim
    with pytest.raises(ValueError):
        load_pytree(f, other)


def test_snapshot_resume(tmp_path, syn):
    """Kill-and-resume: training with snapshots, then resuming from the
    snapshot, must land where an uninterrupted run lands (same stage
    progression, finite losses) and must skip completed epochs."""
    _, corpus = syn
    net = get_network("ff", 1, [16], 16)
    snap = str(tmp_path / "snapshot.npz")
    stages = [TrainStage(epoch=3, optimizer="momentumsgd", batch_size=64,
                         lr=1e-2, early_stopping=False)]
    cfg1 = TrainConfig(stages=stages, seed=0, log=None, snapshot_path=snap)
    res1 = train_network(net, corpus.train.data, corpus.train.targets, cfg1,
                         x_dev=corpus.dev.data, y_dev=corpus.dev.targets)
    assert len(res1.history) == 3

    # resume: all epochs already done -> no new epochs run
    cfg2 = TrainConfig(stages=stages, seed=0, log=None, snapshot_path=snap,
                       resume_snapshot=True)
    res2 = train_network(net, corpus.train.data, corpus.train.targets, cfg2,
                         x_dev=corpus.dev.data, y_dev=corpus.dev.targets)
    assert len(res2.history) == 0

    # resume mid-way: fake an earlier snapshot epoch marker
    blob = dict(np.load(snap))
    blob["__epoch__"] = np.asarray(1)
    np.savez(snap, **blob)
    res3 = train_network(net, corpus.train.data, corpus.train.targets, cfg2,
                         x_dev=corpus.dev.data, y_dev=corpus.dev.targets)
    assert len(res3.history) == 2  # epochs 2 and 3 re-run
    assert all(np.isfinite(h["main/loss"]) for h in res3.history)


def test_snapshot_resume_at_stage_boundary(tmp_path, syn):
    """Crash exactly at a stage boundary: resume must restore the
    completed stage's params (not retrain stage 1 from random init —
    regression for a silent-restart bug)."""
    _, corpus = syn
    net = get_network("ff", 1, [16], 16)
    snap = str(tmp_path / "snap.npz")
    stage0 = TrainStage(epoch=2, optimizer="adam", batch_size=64,
                        lr=1e-3, early_stopping=False)
    stage1 = TrainStage(epoch=2, optimizer="momentumsgd", batch_size=64,
                        lr=1e-2, early_stopping=False)
    # run only stage 0 with snapshots (simulates dying at the boundary)
    cfg0 = TrainConfig(stages=[stage0], seed=0, log=None, snapshot_path=snap)
    res0 = train_network(net, corpus.train.data, corpus.train.targets, cfg0,
                         x_dev=corpus.dev.data, y_dev=corpus.dev.targets)
    trained_leaf = np.asarray(jax.tree_util.tree_leaves(res0.params)[0])

    cfg = TrainConfig(stages=[stage0, stage1], seed=0, log=None,
                      snapshot_path=snap, resume_snapshot=True)
    res = train_network(net, corpus.train.data, corpus.train.targets, cfg,
                        x_dev=corpus.dev.data, y_dev=corpus.dev.targets)
    # only stage 1 epochs ran
    assert [h["stage"] for h in res.history] == [1, 1]
    # stage 1 must have continued from the trained params: its first
    # training loss should be comparable to stage 0's last, not the
    # from-scratch initial loss
    assert res.history[0]["main/loss"] < res0.history[0]["main/loss"] * 0.7
    assert np.isfinite(trained_leaf).all()


def test_snapshot_truncated_is_skipped(tmp_path, syn):
    """Kill-during-save simulation: a truncated snapshot file must be
    detected on resume and skipped (train from scratch with a warning),
    not crash; and the atomic tmp+rename write must never leave a
    truncated file under the real name."""
    _, corpus = syn
    net = get_network("ff", 1, [16], 16)
    snap = str(tmp_path / "snapshot.npz")
    stages = [TrainStage(epoch=2, optimizer="momentumsgd", batch_size=64,
                         lr=1e-2, early_stopping=False)]
    cfg = TrainConfig(stages=stages, seed=0, log=None, snapshot_path=snap)
    train_network(net, corpus.train.data, corpus.train.targets, cfg,
                  x_dev=corpus.dev.data, y_dev=corpus.dev.targets)
    # a leftover .tmp from a mid-save kill must not shadow the snapshot
    assert not (tmp_path / "snapshot.npz.tmp").exists()

    # truncate the snapshot mid-file (pre-atomic-write corruption)
    data = (tmp_path / "snapshot.npz").read_bytes()
    (tmp_path / "snapshot.npz").write_bytes(data[: len(data) // 2])

    cfg2 = TrainConfig(stages=stages, seed=0, log=None, snapshot_path=snap,
                       resume_snapshot=True)
    with pytest.warns(UserWarning, match="unreadable"):
        res = train_network(net, corpus.train.data, corpus.train.targets,
                            cfg2, x_dev=corpus.dev.data,
                            y_dev=corpus.dev.targets)
    # trained from scratch: both epochs ran, losses finite
    assert len(res.history) == 2
    assert all(np.isfinite(h["main/loss"]) for h in res.history)


def test_ff_bf16_training_learns(syn):
    _, corpus = syn
    net = get_network("ff", 2, [32], 16)
    cfg = TrainConfig(
        stages=[TrainStage(epoch=5, optimizer="adam", batch_size=128,
                           lr=1e-3, early_stopping=False)],
        seed=0, log=None, compute_dtype="bfloat16")
    res = train_network(net, corpus.train.data, corpus.train.targets, cfg,
                        x_dev=corpus.dev.data, y_dev=corpus.dev.targets)
    assert res.history[-1]["main/accuracy"] > 0.6
    # master params must remain float32 despite bf16 compute
    for leaf in jax.tree_util.tree_leaves(res.params):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32


def test_rnn_bf16_training_learns(syn):
    _, corpus = syn
    net = get_network("gru", 1, [32], 16)
    cfg = TrainConfig(
        stages=[TrainStage(epoch=6, optimizer="adam", batch_size=16,
                           lr=1e-3, early_stopping=False)],
        bprop_len=10, seed=0, log=None, compute_dtype="bfloat16")
    res = train_network(net, corpus.train.data, corpus.train.targets, cfg,
                        offsets=corpus.train.offsets,
                        x_dev=corpus.dev.data, y_dev=corpus.dev.targets)
    assert res.history[-1]["main/accuracy"] > 0.5
    assert res.history[-1]["main/loss"] < res.history[0]["main/loss"]
    for leaf in jax.tree_util.tree_leaves(res.params):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32


def test_bad_compute_dtype_rejected(syn):
    _, corpus = syn
    net = get_network("ff", 1, [8], 16)
    cfg = TrainConfig(
        stages=[TrainStage(epoch=1, optimizer="sgd", batch_size=32,
                           lr=1e-3, early_stopping=False)],
        seed=0, log=None, compute_dtype="float16")
    with pytest.raises(ValueError, match="unsupported compute dtype"):
        train_network(net, corpus.train.data, corpus.train.targets, cfg)


def test_ff_shuffle_sequences_learns(syn):
    """The reference's --shuffle-sequences flag on FF nets: stream
    batch layout over the sentence-shuffled corpus (train.py:49,307);
    training still converges."""
    _, corpus = syn
    c = corpus.train
    net = get_network("ff", 1, [32], 16)
    cfg = TrainConfig(
        stages=[TrainStage(epoch=8, optimizer="adam", batch_size=32,
                           lr=1e-3, early_stopping=False)],
        seed=0, log=None, use_validation=False, shuffle_sequences=True)
    res = train_network(net, c.data, c.targets, cfg, offsets=c.offsets)
    logits = np.asarray(net.apply(res.params, c.data))
    acc = (logits.argmax(-1) == c.targets).mean()
    assert acc > 0.3, acc
    assert res.history[-1]["main/loss"] < res.history[0]["main/loss"]


def test_resume_replays_uninterrupted_run_exactly(tmp_path, syn):
    """Bit-deterministic resume (VERDICT r03 item 7 infrastructure):
    snapshots carry BOTH rng streams (numpy shuffles + jax dropout
    keys), the optimizer state, the recurrent stream state, and the
    best-model tracking — so a run killed after epoch 2 and resumed
    must produce exactly the uninterrupted run's remaining epochs and
    final params, for an rng- and state-sensitive LSTM config."""
    _, corpus = syn
    net = get_network("lstm", 1, [16], 16, dropout=0.2)
    stages = [TrainStage(epoch=4, optimizer="momentumsgd", batch_size=16,
                         lr=1e-2, early_stopping=False)]

    def run(snap, resume, hook=None):
        cfg = TrainConfig(stages=stages, seed=0, log=None, bprop_len=8,
                          snapshot_path=snap, resume_snapshot=resume,
                          epoch_hook=hook)
        return train_network(net, corpus.train.data, corpus.train.targets,
                             cfg, offsets=corpus.train.offsets,
                             x_dev=corpus.dev.data, y_dev=corpus.dev.targets)

    ref = run(str(tmp_path / "ref.npz"), False)

    class Crash(Exception):
        pass

    def crash_at_2(stage, epoch):
        if epoch == 2:
            raise Crash

    snap = str(tmp_path / "snap.npz")
    with pytest.raises(Crash):
        run(snap, False, hook=crash_at_2)
    res = run(snap, True)

    assert [h["epoch"] for h in res.history] == [3, 4]
    for h_res, h_ref in zip(res.history, ref.history[2:]):
        assert h_res["main/loss"] == h_ref["main/loss"]
        assert h_res["validation/main/loss"] == h_ref["validation/main/loss"]
    for a, b in zip(jax.tree_util.tree_leaves(res.params),
                    jax.tree_util.tree_leaves(ref.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
