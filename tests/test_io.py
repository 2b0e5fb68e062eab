"""I/O layer tests: binary matrix format, MLF, Kaldi transform, corpus.

Oracles: round-trips, the reference's checked-in artifacts in
/root/reference (kaldi/final.feature_transform, recog/*.mlf,
recog/log_ap_Kaldi1909.npy, recog/phones.60-48-39.map).
"""

import numpy as np
import pytest

from nnacousticmodeling_tpu.io import (
    load_bin, save_bin, load_mlf, write_mlf,
    load_feature_transform, apply_feature_transform,
    specialize_transform_center, specialize_transform_tiled,
    load_priors_from_counts, load_phone_map, map_phones,
    RaggedCorpus,
)
from nnacousticmodeling_tpu.io.mlf import utt_base_name


def test_bin_roundtrip_2d(tmp_path, rng):
    x = rng.standard_normal((7, 5)).astype(np.float32)
    f = str(tmp_path / "m.lab")
    save_bin(f, x)
    y = load_bin(f, np.float32)
    np.testing.assert_array_equal(x, y)


def test_bin_roundtrip_1d(tmp_path):
    x = np.arange(9, dtype=np.int32)
    f = str(tmp_path / "v.bin")
    save_bin(f, x)
    y = load_bin(f, np.int32)
    assert y.ndim == 1
    np.testing.assert_array_equal(x, y)


def test_bin_header_layout(tmp_path):
    # byte-level contract: 2 x uint32 dims then row-major payload
    x = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]], dtype=np.float32)
    f = str(tmp_path / "h.lab")
    save_bin(f, x)
    raw = open(f, "rb").read()
    dims = np.frombuffer(raw[:8], dtype=np.uint32)
    assert list(dims) == [3, 2]
    np.testing.assert_array_equal(
        np.frombuffer(raw[8:], dtype=np.float32), x.ravel())


def test_mlf_load_reference_test_set(reference_dir):
    mlf = load_mlf(f"{reference_dir}/recog/test_ref.mlf")
    assert len(mlf) == 192
    # every utterance has phones; ids preserve file order
    orig = [mlf[u].orig_id for u in mlf]
    assert sorted(orig) == list(range(192))
    assert all(len(e.words) > 0 for e in mlf.values())


def test_mlf_load_reference_dev_set(reference_dir):
    mlf = load_mlf(f"{reference_dir}/recog/dev_ref.mlf")
    assert len(mlf) == 400


def test_mlf_roundtrip(tmp_path):
    results = [
        ("UTTA_SI1", [(0, 10, "sil"), (10, 25, "aa"), (25, 30, "sil")]),
        ("UTTB_SX2", [(0, 3, "b"), (3, 9, "iy")]),
    ]
    f = str(tmp_path / "out.mlf")
    write_mlf(f, results)
    mlf = load_mlf(f)
    assert list(mlf) == ["UTTA_SI1", "UTTB_SX2"]
    assert mlf["UTTA_SI1"].words == ["sil", "aa", "sil"]
    # frame -> HTK 100ns scaling by 1e5
    assert mlf["UTTA_SI1"].begins == [0, 1000000, 2500000]
    assert mlf["UTTA_SI1"].ends == [1000000, 2500000, 3000000]


def test_utt_base_name():
    assert utt_base_name("lab/FOO_BAR.lab") == "FOO_BAR"
    assert utt_base_name("a\\b\\X.Y.lab") == "X.Y"  # last dot wins


def test_feature_transform_reference_file(reference_dir):
    ft = load_feature_transform(f"{reference_dir}/kaldi/final.feature_transform")
    assert ft.dim_out == 440 and ft.dim_in == 40
    assert ft.shifts == list(range(-5, 6))
    assert ft.add_shift.shape == (440,) and ft.rescale.shape == (440,)
    x = np.ones((3, 440), dtype=np.float32)
    y = apply_feature_transform(x, ft)
    expected = np.broadcast_to((1.0 + ft.add_shift) * ft.rescale, y.shape)
    np.testing.assert_allclose(y, expected, rtol=1e-6)


def test_feature_transform_specializations(reference_dir):
    ft = load_feature_transform(f"{reference_dir}/kaldi/final.feature_transform")
    center = specialize_transform_center(ft)
    assert center.dim_out == 40 and center.shifts == [0]
    zi = ft.shifts.index(0)
    np.testing.assert_array_equal(center.add_shift, ft.add_shift[zi * 40:(zi + 1) * 40])

    tiled = specialize_transform_tiled(ft, splice=2)
    assert tiled.dim_out == 200 and tiled.shifts == [-2, -1, 0, 1, 2]
    np.testing.assert_array_equal(tiled.add_shift[:40], center.add_shift)
    np.testing.assert_array_equal(tiled.add_shift[160:200], center.add_shift)


def test_priors_from_counts_match_shipped_npy(reference_dir):
    """Regenerated log-priors must match recog/log_ap_Kaldi1909.npy."""
    regen = load_priors_from_counts(f"{reference_dir}/kaldi/ali_train_pdf.counts")
    shipped = np.load(f"{reference_dir}/recog/log_ap_Kaldi1909.npy")
    assert regen.shape == shipped.shape == (1, 1909)
    np.testing.assert_allclose(regen, shipped, atol=1e-5)


def test_phone_map(reference_dir):
    m48_39 = load_phone_map(f"{reference_dir}/recog/phones.60-48-39.map")
    assert m48_39["vcl"] == "sil"
    assert m48_39["ao"] == "aa"
    assert map_phones(["ao", "ae"], m48_39) == ["aa", "ae"]
    assert len(set(m48_39.values())) == 39


def test_ragged_corpus_views(rng):
    data = rng.standard_normal((10, 4)).astype(np.float32)
    offsets = np.array([0, 3, 10])
    targets = np.arange(10, dtype=np.int32)
    c = RaggedCorpus(data=data, offsets=offsets, targets=targets)
    assert c.num_utts == 2 and c.num_frames == 10 and c.dim == 4
    np.testing.assert_array_equal(c.utt_lengths, [3, 7])
    np.testing.assert_array_equal(c.utt(1), data[3:10])
    np.testing.assert_array_equal(c.utt_targets(0), [0, 1, 2])
    with pytest.raises(ValueError):
        RaggedCorpus(data=data, offsets=np.array([0, 5]))
