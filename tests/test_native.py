"""Native (C++) decoder tests: our phonerecog CLI must be byte-identical
to the prebuilt reference binary, and the ctypes in-process path must
match the JAX decoder."""

import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from nnacousticmodeling_tpu.decoder import (
    ViterbiDecoder, make_synthetic_image,
)
from nnacousticmodeling_tpu.decoder.image import save_image
from nnacousticmodeling_tpu.decoder.native import (
    CLI_PATH, NativeDecoder, build_native,
)
from nnacousticmodeling_tpu.io import save_bin

REF_BINARY = "/root/reference/recog/PhoneRecog"

pytestmark = pytest.mark.skipif(not build_native(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("native")
    rng = np.random.default_rng(11)
    img = make_synthetic_image(num_phones=4, num_states=25, seed=11)
    save_image(str(tmp / "syn.img"), img)
    lines = []
    posteriors = []
    for i, t in enumerate([35, 50, 8, 22]):
        lp = np.log(rng.dirichlet(np.ones(25), size=t)).astype(np.float32)
        posteriors.append(lp)
        save_bin(str(tmp / f"u{i}.lab"), lp)
        lines.append(str(tmp / f"u{i}.lab"))
    (tmp / "t.scp").write_text("\n".join(lines) + "\n")
    return tmp, img, posteriors


def test_cli_byte_identical_to_reference_binary(setup):
    tmp, img, _ = setup
    for pip, lmw in [("-20", "1"), ("-3", "2")]:
        subprocess.run([REF_BINARY, str(tmp / "t.scp"), str(tmp / "syn.img"),
                        str(tmp / "ref.mlf"), pip, lmw],
                       check=True, capture_output=True)
        subprocess.run([str(CLI_PATH), str(tmp / "t.scp"), str(tmp / "syn.img"),
                        str(tmp / "ours.mlf"), pip, lmw],
                       check=True, capture_output=True)
        assert (tmp / "ref.mlf").read_bytes() == (tmp / "ours.mlf").read_bytes()


def test_ctypes_decoder_matches_jax(setup):
    tmp, img, posteriors = setup
    nat = NativeDecoder(str(tmp / "syn.img"), pip=20.0, lmw=1.0)
    dec = ViterbiDecoder(img, pip=20.0, lmw=1.0)
    for lp in posteriors:
        assert nat.decode_one(lp).segments == dec.decode_one(lp).segments


def test_ctypes_decode_batch_matches_sequential(setup):
    """The thread-pooled batch path (used by `evaluate --decoder
    native`, like the reference's OpenMP utterance loop, main.cpp:51-64)
    must produce exactly the sequential results, in order."""
    tmp, _, posteriors = setup
    nat = NativeDecoder(str(tmp / "syn.img"), pip=20.0, lmw=1.0)
    seq = [nat.decode_one(lp).segments for lp in posteriors]
    batch = nat.decode_batch(posteriors * 8, n_threads=4)
    assert [r.segments for r in batch] == seq * 8


def test_ctypes_rejects_bad_shapes(setup):
    tmp, _, _ = setup
    nat = NativeDecoder(str(tmp / "syn.img"))
    with pytest.raises(ValueError):
        nat.decode_one(np.zeros((5, 7), dtype=np.float32))


def test_cli_error_paths(setup, tmp_path):
    tmp, _, _ = setup
    r = subprocess.run([str(CLI_PATH)], capture_output=True)
    assert r.returncode == 1
    r = subprocess.run([str(CLI_PATH), str(tmp / "t.scp"), "/nonexistent.img",
                        str(tmp_path / "o.mlf"), "-20", "1"],
                       capture_output=True)
    assert r.returncode == 1
