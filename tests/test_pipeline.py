"""Full-pipeline integration tests on a synthetic dataset tree:
the six-phase master orchestration (folds -> master -> fold nets ->
predictions -> RPL -> ensemble evaluation) producing real PER numbers
through the in-process Viterbi decode."""

from pathlib import Path

import numpy as np
import pytest

from nnacousticmodeling_tpu.pipeline.master import main as master_main
from nnacousticmodeling_tpu.pipeline.synth_data import main as synth_main
from nnacousticmodeling_tpu.pipeline.train_cli import main as train_main
from nnacousticmodeling_tpu.pipeline.evaluate import main as evaluate_main


@pytest.fixture(scope="module")
def corpus_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("syncorpus"))
    synth_main(["--root", root, "--num-phones", 5, "--dim", 16,
                "--num-train", 40, "--num-dev", 12, "--num-test", 10,
                "--noise", 0.5, "--seed", 1])
    return root


def test_single_ff_train_and_eval(corpus_root, tmp_path):
    out = str(tmp_path / "ff_model")
    train_main(["--num-classes", "17", "--out", out, "-n", "ff", "-l", "2",
                "-u", "64",
                "--data-dir", f"{corpus_root}/data",
                "--offset-dir", f"{corpus_root}/data",
                "--target-dir", f"{corpus_root}/data",
                "--epoch", "4", "-o", "adam", "-b", "256",
                "--early-stopping", "false", "--seed", "0"])
    per = evaluate_main(["--num-classes", "17", "-n", "ff", "-l", "2",
                         "-u", "64",
                         "--model", f"{out}/model",
                         "--data-dir", f"{corpus_root}/data",
                         "--offset-dir", f"{corpus_root}/data",
                         "--utt-list-dir", f"{corpus_root}/data",
                         "--recog-dir", f"{corpus_root}/recog",
                         "--ap-file", "log_ap_Kaldi1909.npy",
                         "--PIP", "5", "--test-or-dev", "test"])
    assert per < 40.0, f"trained FF PER too high: {per}"


@pytest.mark.slow
def test_master_pipeline_ensemble(corpus_root):
    """All six phases with 2 folds + master + RPL; every ensemble combo
    evaluates and the fold ensemble must beat chance decisively."""
    results = master_main([
        "--num-folds", "2", "--gen-folds",
        "--data-dir", f"{corpus_root}/data",
        "--offset-dir", f"{corpus_root}/data",
        "--target-dir", f"{corpus_root}/data",
        "--utt-list-dir", f"{corpus_root}/data",
        "--recog-dir", f"{corpus_root}/recog",
        "--output-dir", f"{corpus_root}/results",
        "--output-id", "t1",
        "--network-spec=-n gru -l 1 -u 48",
        "--rpl-train-setup=-b 512 --epoch 2 -o adam --early-stopping false",
        "--epoch", "3", "-o", "adam", "-b", "8",
        "--early-stopping", "false",
        "--PIP", "5", "--seed", "0", "--num-classes", "17",
        "--eval-data", "test",
    ])
    assert len(results) == 6  # 2^3 minus the two no-model combos
    for key, per in results.items():
        assert per < 60.0, f"{key}: PER {per}"
    # the full ensemble should be competitive with the master alone
    full = results[("test", "+folds +master -rpl")]
    master_only = results[("test", "-folds +master -rpl")]
    assert full <= master_only + 15.0
    # fold-training scratch output must land in the derived results
    # tree, not the CWD (r4 hygiene finding: stray ./result_fold_tmp)
    assert not Path("result_fold_tmp").exists()
    assert (Path(corpus_root) / "results" / "models" / "folds"
            ).is_dir()


@pytest.mark.slow
def test_master_pipeline_fold_parallel_sharded(corpus_root):
    """The six-phase master pipeline with --fold-parallel --mesh: folds
    train as ONE sharded program over a 2-device fold axis and the
    ensemble evaluation still produces a learned PER."""
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    results = master_main([
        "--num-folds", "2", "--gen-folds", "--fold-parallel",
        "--mesh", "fold=2",
        "--data-dir", f"{corpus_root}/data",
        "--offset-dir", f"{corpus_root}/data",
        "--target-dir", f"{corpus_root}/data",
        "--utt-list-dir", f"{corpus_root}/data",
        "--recog-dir", f"{corpus_root}/recog",
        "--output-dir", f"{corpus_root}/results",
        "--output-id", "tpar",
        "--network-spec=-n gru -l 1 -u 48",
        "--rpl-train-setup=-b 512 --epoch 2 -o adam --early-stopping false",
        "--epoch", "3", "-o", "adam", "-b", "8",
        "--early-stopping", "false",
        "--PIP", "5", "--seed", "0", "--num-classes", "17",
        "--eval-data", "test",
    ])
    assert len(results) == 6
    for key, per in results.items():
        assert per < 60.0, f"{key}: PER {per}"


def test_ivector_adaptation_pipeline(tmp_path):
    """Speaker-biased synthetic corpus with i-vectors: the master
    pipeline with --ivector-dir must run end to end and the adapted
    model must beat the unadapted one on PER."""
    root = str(tmp_path / "ivcorp")
    synth_main(["--root", root, "--num-phones", 5, "--dim", 12,
                "--num-train", 48, "--num-dev", 12, "--num-test", 12,
                "--noise", 0.4, "--seed", 3, "--ivector-dim", 8])
    import os
    assert os.path.isfile(f"{root}/ivectors/ivectors_train.npy")

    def run(ivector: bool):
        args = [
            "--data-dir", f"{root}/data", "--offset-dir", f"{root}/data",
            "--target-dir", f"{root}/data", "--utt-list-dir", f"{root}/data",
            "--recog-dir", f"{root}/recog",
            "--output-dir", f"{root}/results",
            "--output-id", "iv" if ivector else "noiv",
            "--network-spec=-n ff -l 1 -u 48",
            "--epoch", "4", "-o", "adam", "-b", "256",
            "--early-stopping", "false",
            "--PIP", "5", "--seed", "0", "--num-classes", "17",
            "--num-folds", "0", "--eval-only-master",
            "--eval-data", "test",
        ]
        if ivector:
            args += ["--ivector-dir", f"{root}/ivectors", f"{root}/ivectors"]
        return master_main(args)

    adapted = run(True)[("test", "-folds +master -rpl")]
    plain = run(False)[("test", "-folds +master -rpl")]
    assert adapted <= plain + 1.0, (adapted, plain)


def test_evaluate_lm_from_mlf_both_decoders(corpus_root, tmp_path):
    """evaluate --lm-from-mlf: the MLF-estimated bigram LM decodes
    identically through the in-graph decoder (image object handed over
    in memory) and the native CLI (image written to a TemporaryDirectory
    that must not leak — r4 advisor finding)."""
    import glob
    import tempfile
    from nnacousticmodeling_tpu.decoder.native import build_native
    out = str(tmp_path / "ff_model")
    train_main(["--num-classes", "17", "--out", out, "-n", "ff", "-l", "1",
                "-u", "32",
                "--data-dir", f"{corpus_root}/data",
                "--offset-dir", f"{corpus_root}/data",
                "--target-dir", f"{corpus_root}/data",
                "--epoch", "2", "-o", "adam", "-b", "256",
                "--early-stopping", "false", "--seed", "0"])
    common = ["--num-classes", "17", "-n", "ff", "-l", "1", "-u", "32",
              "--model", f"{out}/model",
              "--data-dir", f"{corpus_root}/data",
              "--offset-dir", f"{corpus_root}/data",
              "--utt-list-dir", f"{corpus_root}/data",
              "--recog-dir", f"{corpus_root}/recog",
              "--PIP", "5", "--test-or-dev", "test",
              "--lm-from-mlf", f"{corpus_root}/recog/dev_ref.mlf"]
    per_lm = evaluate_main(common)
    per_plain = evaluate_main(common[:-2])
    assert per_lm < 60.0
    # a (synthetic) LM genuinely changes the decode result in general;
    # at minimum the path must run and score sanely
    assert isinstance(per_plain, float)
    if build_native():
        before = set(glob.glob(str(Path(tempfile.gettempdir(),
                                        "nnam_lm_*"))))
        per_nat = evaluate_main(common + ["--decoder", "native"])
        after = set(glob.glob(str(Path(tempfile.gettempdir(),
                                       "nnam_lm_*"))))
        assert per_nat == pytest.approx(per_lm, abs=1e-9)
        assert after == before, "leaked nnam_lm_ temp dirs"


def test_native_decoder_backend_matches_tpu(corpus_root, tmp_path):
    """evaluate --decoder native must produce the same PER as the
    in-graph decoder."""
    from nnacousticmodeling_tpu.decoder.native import build_native
    if not build_native():
        pytest.skip("native toolchain unavailable")
    out = str(tmp_path / "ff_model")
    train_main(["--num-classes", "17", "--out", out, "-n", "ff", "-l", "1",
                "-u", "32",
                "--data-dir", f"{corpus_root}/data",
                "--offset-dir", f"{corpus_root}/data",
                "--target-dir", f"{corpus_root}/data",
                "--epoch", "2", "-o", "adam", "-b", "256",
                "--early-stopping", "false", "--seed", "0"])
    common = ["--num-classes", "17", "-n", "ff", "-l", "1", "-u", "32",
              "--model", f"{out}/model",
              "--data-dir", f"{corpus_root}/data",
              "--offset-dir", f"{corpus_root}/data",
              "--utt-list-dir", f"{corpus_root}/data",
              "--recog-dir", f"{corpus_root}/recog",
              "--PIP", "5", "--test-or-dev", "test"]
    per_tpu = evaluate_main(common + ["--decoder", "tpu"])
    per_native = evaluate_main(common + ["--decoder", "native"])
    assert per_tpu == pytest.approx(per_native, abs=1e-9)
