"""Raw-audio feature pipeline tests: framing math, spectral
correctness against numpy FFT, CMN semantics, and Pallas/jnp kernel
equivalence (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nnacousticmodeling_tpu.ops.features import (
    FRAME_HOP, FRAME_LEN, NFFT, NUM_MEL,
    cmn, cmn_per_speaker, dct_matrix, dft_bases, fbank, fbank_pallas,
    frame_signal, mel_filterbank, mfcc, num_frames, povey_window,
)


def test_num_frames():
    assert num_frames(FRAME_LEN) == 1
    assert num_frames(FRAME_LEN - 1) == 0
    assert num_frames(FRAME_LEN + FRAME_HOP) == 2
    assert num_frames(16000) == 98


def test_dft_bases_match_numpy_fft(rng):
    frame = rng.standard_normal(FRAME_LEN).astype(np.float32)
    cos_b, sin_b = dft_bases()
    re = frame @ cos_b
    im = frame @ sin_b
    ref = np.fft.rfft(frame, n=NFFT)
    np.testing.assert_allclose(re, ref.real, atol=1e-2)
    np.testing.assert_allclose(im, ref.imag, atol=1e-2)


def test_fbank_shape_and_tone(rng):
    """A pure 1 kHz tone must put its energy in the right mel bin."""
    t = np.arange(16000) / 16000.0
    x = jnp.asarray(np.sin(2 * np.pi * 1000.0 * t).astype(np.float32))
    out = np.asarray(fbank(x))
    assert out.shape == (98, NUM_MEL)
    # mel bin of 1 kHz: mel(1000)=~1000 -> among the first half of bins
    peak = out.mean(axis=0).argmax()
    fb = mel_filterbank()
    peak_bin_hz = np.argmax(fb[:, peak]) * 16000 / NFFT
    assert 800 < peak_bin_hz < 1250


def test_mfcc_shape(rng):
    x = jnp.asarray(rng.standard_normal(8000).astype(np.float32))
    out = np.asarray(mfcc(x))
    assert out.shape == (num_frames(8000), 13)
    assert np.isfinite(out).all()


def test_dct_orthonormal():
    d = dct_matrix(40, 40)
    np.testing.assert_allclose(d.T @ d, np.eye(40), atol=1e-5)


def test_cmn_zero_mean(rng):
    x = jnp.asarray(rng.standard_normal((50, 13)).astype(np.float32) + 3.0)
    out = np.asarray(cmn(x))
    np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-5)
    outv = np.asarray(cmn(x, var_norm=True))
    np.testing.assert_allclose(outv.std(axis=0), 1.0, atol=1e-3)


def test_cmn_per_speaker(rng):
    feats = rng.standard_normal((30, 4)).astype(np.float32)
    feats[:20] += 5.0      # speaker 0's bias
    offsets = np.array([0, 10, 20, 30])
    speakers = np.array([0, 0, 1])
    out = cmn_per_speaker(feats, offsets, speakers)
    np.testing.assert_allclose(out[:20].mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(out[20:].mean(axis=0), 0.0, atol=1e-5)
    # within speaker 0, per-utterance means need NOT be zero
    assert abs(out[:10].mean()) > 1e-6


def test_pallas_fbank_matches_jnp(rng):
    x = jnp.asarray(rng.standard_normal(12000).astype(np.float32))
    ref = np.asarray(fbank(x))
    got = np.asarray(fbank_pallas(x, block_frames=32, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-3)
