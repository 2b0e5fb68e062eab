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


# ---------------------------------------------------------------------------
# golden oracles: an INDEPENDENT numpy transcription of the documented
# conventions (np.fft STFT, per-frame loops, textbook formulas) — the
# production path (framing gather + DFT-as-matmul + mel matmul) must
# reproduce it, so "Kaldi/HTK conventions" is verified, not claimed
# ---------------------------------------------------------------------------

def _golden_fbank(x, frame_len=400, hop=160, nfft=512, num_mel=40,
                  preemph=0.97, sr=16000, low=20.0):
    import numpy as np
    n_fr = 1 + (len(x) - frame_len) // hop if len(x) >= frame_len else 0
    # Povey window, independent derivation
    n = np.arange(frame_len)
    win = (0.5 - 0.5 * np.cos(2 * np.pi * n / (frame_len - 1))) ** 0.85
    # HTK-style integer-bin mel triangles
    to_mel = lambda f: 1127.0 * np.log(1.0 + f / 700.0)
    from_mel = lambda m: 700.0 * (np.exp(m / 1127.0) - 1.0)
    pts = np.floor((nfft + 1) * from_mel(
        np.linspace(to_mel(low), to_mel(sr / 2.0), num_mel + 2)) / sr
    ).astype(int)
    out = np.zeros((n_fr, num_mel))
    for t in range(n_fr):
        fr = np.array(x[t * hop:t * hop + frame_len], dtype=np.float64)
        fr[1:] -= preemph * fr[:-1]
        fr[0] -= preemph * fr[0]          # Kaldi first-sample rule
        spec = np.fft.rfft(fr * win, nfft)
        power = np.abs(spec) ** 2
        for m in range(num_mel):
            lo, ctr, hi = pts[m], pts[m + 1], pts[m + 2]
            acc = 0.0
            for k in range(lo, ctr):
                acc += power[k] * (k - lo) / max(ctr - lo, 1)
            for k in range(ctr, hi):
                acc += power[k] * (hi - k) / max(hi - ctr, 1)
            out[t, m] = np.log(max(acc, 1.1921e-07))
    return out


def test_fbank_matches_golden_oracle(rng):
    x = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    got = np.asarray(fbank(jnp.asarray(x)))
    ref = _golden_fbank(x)
    assert got.shape == ref.shape == (98, 40)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_fbank_golden_pure_tone(rng):
    """A 1 kHz tone must land its energy in the oracle-predicted bins."""
    t = np.arange(8000) / 16000.0
    x = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    got = np.asarray(fbank(jnp.asarray(x)))
    ref = _golden_fbank(x)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
    assert got[5].argmax() == ref[5].argmax()


def test_mfcc_matches_golden_oracle(rng):
    x = (rng.standard_normal(8000) * 0.2).astype(np.float32)
    logmel = _golden_fbank(x)
    # independent orthonormal DCT-II
    num_mel, num_ceps = 40, 13
    m = np.arange(num_mel)
    ref = np.stack([
        np.cos(np.pi * c * (2 * m + 1) / (2 * num_mel)) @ logmel.T
        * (np.sqrt(1.0 / num_mel) if c == 0 else np.sqrt(2.0 / num_mel))
        for c in range(num_ceps)], axis=1)
    got = np.asarray(mfcc(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=3e-3, atol=3e-3)


def test_povey_window_endpoints():
    win = povey_window(400)
    # hann^0.85 facts: zero at edges, 1.0 at the midpoint of n/(N-1)
    assert win[0] == 0.0 and win[-1] == pytest.approx(0.0, abs=1e-12)
    mid = (0.5 - 0.5 * np.cos(2 * np.pi * 199.5 / 399)) ** 0.85
    assert win[199] < 1.0 <= mid + 1e-6


def test_mel_filterbank_structure():
    fb = mel_filterbank()
    assert fb.shape == (257, 40)
    assert (fb >= 0).all() and fb.max() <= 1.0
    # triangles: each filter unimodal, peak 1 where bins are wide enough
    peaks = fb.argmax(axis=0)
    assert (np.diff(peaks) > 0).all()     # centers strictly increase
    # below 20 Hz nothing passes
    assert fb[0].sum() == 0.0


def test_kaldi_mel_weights_match_pinned_external_oracle():
    """kaldi_weights=True must bit-match the pinned filter bank minted
    from transformers.audio_utils.mel_filter_bank (mel_scale='kaldi',
    triangularize_in_mel_space=True) — an implementation independent of
    this package, validated upstream against torchaudio/Kaldi. See
    tests/data/mint_kaldi_golden.py for provenance."""
    gold = np.load("tests/data/kaldi_mel_fb40.npy")
    fb = mel_filterbank(kaldi_weights=True)
    np.testing.assert_array_equal(fb, gold)


def test_kaldi_fbank_matches_pinned_golden():
    """Full raw-audio -> log-mel path with kaldi_weights=True vs a
    pinned vector computed via plain numpy rfft + the external filter
    bank (no shared code with ops/features.py)."""
    g = np.load("tests/data/kaldi_fbank_golden.npz")
    y = np.asarray(fbank(g["x"], kaldi_weights=True))
    np.testing.assert_allclose(y, g["y"], atol=1e-4, rtol=0)


def test_kaldi_vs_htk_weights_differ():
    """The two conventions are genuinely different filter banks (the
    default's documented deviation from Kaldi, features.py docstring)."""
    assert np.abs(mel_filterbank(kaldi_weights=True)
                  - mel_filterbank()).max() > 0.05
