"""generate_folds CLI tests: speaker grouping, persisted index reuse
(generate_folds.py:56-71 semantics), artifact shapes."""

import numpy as np
import pytest

from nnacousticmodeling_tpu.pipeline.generate_folds import main as gen_main


@pytest.fixture
def corpus_dir(tmp_path, rng):
    d = tmp_path / "data"
    d.mkdir()
    # 6 utterances, 3 speakers (first 5 chars), 4 frames each
    names = ["SPKA0_SX1", "SPKA0_SX2", "SPKB0_SX1", "SPKB0_SX2",
             "SPKC0_SX1", "SPKC0_SX2"]
    (d / "train.list").write_text("\n".join(names) + "\n")
    np.save(d / "data_train.npy",
            rng.standard_normal((24, 3)).astype(np.float32))
    np.save(d / "offsets_train.npy", np.arange(0, 25, 4))
    np.save(d / "targets_train.npy", np.arange(24, dtype=np.int32))
    return str(d)


def test_folds_group_by_speaker(corpus_dir, tmp_path):
    fold_dir = str(tmp_path / "folds")
    gen_main(["-n", "2", "--data-dir", corpus_dir, "--offset-dir", corpus_dir,
              "--target-dir", corpus_dir, "--utt-list-dir", corpus_dir,
              "--fold-data-dir", fold_dir, "--seed", "0"])
    idx = np.load(f"{fold_dir}/utt_idx.npz")
    folds = [idx[k] for k in idx.files]
    assert len(folds) == 2
    assert sorted(np.concatenate(folds).tolist()) == list(range(6))
    # both utterances of a speaker land in the same fold
    spk_of = [0, 0, 1, 1, 2, 2]
    fold_of_utt = {}
    for k, f in enumerate(folds):
        for u in f:
            fold_of_utt[int(u)] = k
    for u in range(0, 6, 2):
        assert fold_of_utt[u] == fold_of_utt[u + 1]
    # frames partition exactly
    d0 = np.load(f"{fold_dir}/data_0.npy")
    d1 = np.load(f"{fold_dir}/data_1.npy")
    assert d0.shape[0] + d1.shape[0] == 24
    o0 = np.load(f"{fold_dir}/offsets_0.npy")
    assert o0[0] == 0 and o0[-1] == d0.shape[0]


def test_folds_reuse_persisted_index(corpus_dir, tmp_path):
    """A second run must reuse utt_idx.npz (generate_folds.py:56-71),
    reproducing identical folds even with a different seed."""
    fold_dir = str(tmp_path / "folds")
    gen_main(["-n", "2", "--data-dir", corpus_dir, "--offset-dir", corpus_dir,
              "--target-dir", corpus_dir, "--utt-list-dir", corpus_dir,
              "--fold-data-dir", fold_dir, "--seed", "0"])
    d0_first = np.load(f"{fold_dir}/data_0.npy")
    gen_main(["-n", "2", "--data-dir", corpus_dir, "--offset-dir", corpus_dir,
              "--target-dir", corpus_dir, "--utt-list-dir", corpus_dir,
              "--fold-data-dir", fold_dir, "--seed", "123"])
    d0_second = np.load(f"{fold_dir}/data_0.npy")
    np.testing.assert_array_equal(d0_first, d0_second)


def test_folds_reject_mismatched_list(corpus_dir, tmp_path):
    (tmp_path / "bad").mkdir()
    bad = tmp_path / "bad" / "train.list"
    bad.write_text("ONLY1_SX1\n")
    with pytest.raises(ValueError):
        gen_main(["-n", "2", "--data-dir", corpus_dir,
                  "--offset-dir", corpus_dir, "--target-dir", corpus_dir,
                  "--utt-list-dir", str(tmp_path / "bad"),
                  "--fold-data-dir", str(tmp_path / "f")])
