"""Kaldi artifact parsers + real-image generation tests.

The generated 1909-state TIMIT image is validated structurally and then
decode-parity-checked against the prebuilt native PhoneRecog binary —
the strongest end-to-end oracle available without the dataset bundle.
"""

import subprocess

import numpy as np
import pytest

from nnacousticmodeling_tpu.decoder import ViterbiDecoder
from nnacousticmodeling_tpu.decoder.graph import (
    build_timit_image, estimate_bigram_lm, timit48_phone_names,
)
from nnacousticmodeling_tpu.decoder.image import save_image
from nnacousticmodeling_tpu.io import load_mlf, save_bin
from nnacousticmodeling_tpu.io.kaldi_mdl import load_transition_model
from nnacousticmodeling_tpu.io.kaldi_tree import load_tree

PHONERECOG = "/root/reference/recog/PhoneRecog"


@pytest.fixture(scope="module")
def tm(reference_dir=None):
    return load_transition_model("/root/reference/kaldi/final.mdl")


@pytest.fixture(scope="module")
def tree():
    return load_tree("/root/reference/kaldi/tree")


@pytest.fixture(scope="module")
def timit_image():
    return build_timit_image()


def test_transition_model_shape(tm):
    assert len(tm.phones) == 48
    assert len(tm.triples) == 1977
    assert tm.num_pdfs == 1909
    assert tm.num_tids == 2 * 1977
    # phone 1 (sil) has the 0.5/0.5 topology, others 0.75/0.25
    assert tm.topology[1][0].transitions[0][1] == 0.5
    assert tm.topology[2][0].transitions[0][1] == 0.75
    # trained probs: each state's self+forward must sum to ~1
    s, f = tm.state_log_probs(2, 0, 1)
    assert abs(np.exp(s) + np.exp(f) - 1.0) < 1e-4


def test_tree_covers_all_pdfs(tree):
    assert tree.context_width == 3 and tree.central_position == 1
    assert tree.num_pdfs() == 1909


def test_phone_names():
    names = timit48_phone_names("/root/reference/recog/phones.60-48-39.map")
    assert len(names) == 48
    assert names[0] == "sil"
    assert names[1:] == sorted(names[1:])


def test_timit_image_structure(timit_image):
    img = timit_image
    assert img.num_phones == 48
    assert img.num_biphones == 48 * 48
    assert img.num_states == 1909
    assert img.num_triphones == 48 ** 3   # all contexts resolved by the tree
    img.validate()
    # every pdf must be referenced by some triphone
    assert len(np.unique(img.state_idxs)) == 1909
    # transition probs are proper log probs: self + forward ~ 1
    total = np.exp(img.tp_selfloop) + np.exp(img.tp_transition)
    np.testing.assert_allclose(total, 1.0, atol=1e-3)


def test_timit_image_native_parity(timit_image, tmp_path, rng):
    """The generated 1909-state image decodes identically in the native
    binary and the JAX decoder."""
    img = timit_image
    lengths = [50, 30]
    posteriors = [
        np.log(np.maximum(rng.dirichlet(np.full(img.num_states, 0.05), size=t),
                          1e-20)).astype(np.float32)
        for t in lengths
    ]
    img_file = str(tmp_path / "timit.img")
    save_image(img_file, img)
    lines = []
    for i, lp in enumerate(posteriors):
        lab = tmp_path / f"utt{i}.lab"
        save_bin(str(lab), lp)
        lines.append(str(lab))
    scp = tmp_path / "t.scp"
    scp.write_text("\n".join(lines) + "\n")
    out = str(tmp_path / "native.mlf")
    r = subprocess.run([PHONERECOG, str(scp), img_file, out, "-20", "1"],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    native = load_mlf(out)

    dec = ViterbiDecoder(img, pip=20.0, lmw=1.0)
    for i, lp in enumerate(posteriors):
        ours = dec.decode_one(lp)
        theirs = native[f"utt{i}"]
        assert ours.phones == theirs.words
        assert [b * 100000 for b, _, _ in ours.segments] == theirs.begins
        assert [e * 100000 for _, e, _ in ours.segments] == theirs.ends


def test_bigram_lm_estimation(timit_image):
    ref = load_mlf("/root/reference/recog/dev_ref.mlf")
    names = timit48_phone_names("/root/reference/recog/phones.60-48-39.map")
    lm = estimate_bigram_lm({u: e.words for u, e in ref.items()}, names,
                            "/root/reference/recog/phones.60-48-39.map")
    assert lm.shape == (48, 48)
    # rows are log distributions over projected classes; all finite
    assert np.isfinite(lm).all()
    # sil-after-sil should be common in TIMIT -> better than uniform
    assert lm[0, 0] > -np.log(48)


def test_image_minting_cli(tmp_path):
    """The image CLI mints a loadable image (with an MLF-estimated LM)
    whose header matches the in-memory builder."""
    from nnacousticmodeling_tpu.decoder.graph import main as graph_main
    from nnacousticmodeling_tpu.decoder.image import load_image

    out = tmp_path / "minted.img"
    img = graph_main(["--out", str(out),
                      "--lm-from-mlf", "/root/reference/recog/dev_ref.mlf"])
    loaded = load_image(str(out))
    assert loaded.num_phones == 48
    assert loaded.num_states == 1909
    assert loaded.num_triphones == img.num_triphones
    np.testing.assert_allclose(loaded.lm, img.lm, atol=1e-6)
