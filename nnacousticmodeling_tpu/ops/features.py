"""Raw-audio feature extraction: STFT -> log-mel fbank -> MFCC, + CMN.

The reference consumes precomputed Kaldi features (fbank40 /
fbank40norm / mfcc with per-speaker or per-utterance CMN —
/root/reference/README.md:30-37); this module adds the from-raw-audio
path as TPU-native ops so the framework stands alone. Defaults follow
the Kaldi conventions those features were made with: 25 ms / 10 ms
frames at 16 kHz, preemphasis 0.97, Povey window, 40 mel bins, 13
cepstra.

Convention fine print (verified by tests/test_features.py golden
oracles): framing (snip-edges), per-frame preemphasis with the
first-sample self-subtraction, the Povey window (hann^0.85), and the
float32-epsilon log floor follow Kaldi; the DEFAULT mel triangles use
HTK-style integer FFT-bin snapping (floor((nfft+1)·f/sr)); pass
``kaldi_weights=True`` for Kaldi's continuous mel-domain weights —
golden-pinned against an independent public implementation
(tests/data/kaldi_mel_fb40.npy) so the raw-audio path reproduces the
filter bank behind the reference's fbank40 bundle
(/root/reference/README.md:30-37). There is no dither and DC offset is
not removed — deterministic; the pipeline's AddShift/Rescale absorbs
the normalization.

Two implementations with identical outputs:

* ``fbank`` — pure jnp (framing gather + window + DFT-as-matmul +
  mel matmul), fully jittable, differentiable;
* ``fbank_pallas`` — fused Pallas TPU kernel: each grid step loads a
  block of frames into VMEM once and runs window + real/imag DFT
  matmuls (MXU) + power + mel projection + log without touching HBM in
  between.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
FRAME_LEN = 400      # 25 ms
FRAME_HOP = 160      # 10 ms
NFFT = 512
NUM_MEL = 40
NUM_CEPS = 13
PREEMPH = 0.97
EPS = 1.1921e-07     # float32 epsilon, Kaldi's log floor


def num_frames(num_samples: int, frame_len: int = FRAME_LEN,
               hop: int = FRAME_HOP) -> int:
    if num_samples < frame_len:
        return 0
    return 1 + (num_samples - frame_len) // hop


def povey_window(frame_len: int = FRAME_LEN) -> np.ndarray:
    """Kaldi's default window: Hann^0.85."""
    n = np.arange(frame_len)
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * n / (frame_len - 1))
    return (hann ** 0.85).astype(np.float32)


def mel_filterbank(num_mel: int = NUM_MEL, nfft: int = NFFT,
                   sample_rate: int = SAMPLE_RATE,
                   low_freq: float = 20.0,
                   high_freq: Optional[float] = None,
                   kaldi_weights: bool = False) -> np.ndarray:
    """(nfft//2+1, num_mel) triangular mel weights.

    ``kaldi_weights=False`` (default): HTK-style triangles snapped to
    integer FFT bins. ``kaldi_weights=True``: Kaldi's mel-banks
    convention — triangles evaluated in the continuous mel domain at
    each FFT bin's mel frequency (weight > 0 iff left < mel(f_k) <
    right) — bit-matching the filter bank the reference's fbank40
    bundle was computed with (pinned golden:
    tests/data/kaldi_mel_fb40.npy, minted from an independent public
    implementation).
    """
    if high_freq is None:
        high_freq = sample_rate / 2.0

    def to_mel(f):
        return 1127.0 * np.log(1.0 + f / 700.0)

    def from_mel(m):
        return 700.0 * (np.exp(m / 1127.0) - 1.0)

    if kaldi_weights:
        mel_lo, mel_hi = to_mel(low_freq), to_mel(high_freq)
        delta = (mel_hi - mel_lo) / (num_mel + 1)
        left = mel_lo + np.arange(num_mel) * delta     # per-bin triangle
        bin_mels = to_mel(np.arange(nfft // 2 + 1) * sample_rate / nfft)
        up = (bin_mels[:, None] - left[None, :]) / delta
        down = ((left[None, :] + 2 * delta) - bin_mels[:, None]) / delta
        fb = np.minimum(up, down)
        return np.where(fb > 0.0, fb, 0.0).astype(np.float32)

    mel_pts = np.linspace(to_mel(low_freq), to_mel(high_freq), num_mel + 2)
    hz_pts = from_mel(mel_pts)
    bins = np.floor((nfft + 1) * hz_pts / sample_rate).astype(int)
    fb = np.zeros((nfft // 2 + 1, num_mel), dtype=np.float32)
    for m in range(1, num_mel + 1):
        lo, ctr, hi = bins[m - 1], bins[m], bins[m + 1]
        for k in range(lo, ctr):
            if ctr > lo:
                fb[k, m - 1] = (k - lo) / (ctr - lo)
        for k in range(ctr, hi):
            if hi > ctr:
                fb[k, m - 1] = (hi - k) / (hi - ctr)
    return fb


def dft_bases(frame_len: int = FRAME_LEN, nfft: int = NFFT
              ) -> Tuple[np.ndarray, np.ndarray]:
    """Real/imag DFT bases (frame_len, nfft//2+1) for power spectra via
    two MXU matmuls (zero-padding folded into the basis truncation)."""
    k = np.arange(nfft // 2 + 1)
    n = np.arange(frame_len)
    ang = -2.0 * np.pi * np.outer(n, k) / nfft
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def dct_matrix(num_ceps: int = NUM_CEPS, num_mel: int = NUM_MEL) -> np.ndarray:
    """Orthonormal DCT-II (num_mel, num_ceps)."""
    m = np.arange(num_mel)
    out = np.zeros((num_mel, num_ceps), dtype=np.float32)
    for c in range(num_ceps):
        out[:, c] = np.cos(np.pi * c * (2 * m + 1) / (2 * num_mel))
    out[:, 0] *= 1.0 / np.sqrt(num_mel)
    out[:, 1:] *= np.sqrt(2.0 / num_mel)
    return out


def frame_signal(x: jnp.ndarray, frame_len: int = FRAME_LEN,
                 hop: int = FRAME_HOP, preemph: float = PREEMPH
                 ) -> jnp.ndarray:
    """(num_samples,) -> (T, frame_len) with per-frame preemphasis."""
    t = num_frames(x.shape[0], frame_len, hop)
    idx = jnp.arange(t)[:, None] * hop + jnp.arange(frame_len)[None, :]
    frames = x[idx]
    if preemph > 0:
        prev = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - preemph * prev
    return frames


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def fbank(x: jnp.ndarray, frame_len: int = FRAME_LEN, hop: int = FRAME_HOP,
          nfft: int = NFFT, num_mel: int = NUM_MEL,
          kaldi_weights: bool = False) -> jnp.ndarray:
    """(num_samples,) waveform -> (T, num_mel) log-mel energies."""
    frames = frame_signal(x, frame_len, hop)
    win = jnp.asarray(povey_window(frame_len))
    frames = frames * win
    cos_b, sin_b = dft_bases(frame_len, nfft)
    re = frames @ jnp.asarray(cos_b)
    im = frames @ jnp.asarray(sin_b)
    power = re * re + im * im
    mel = power @ jnp.asarray(
        mel_filterbank(num_mel, nfft, kaldi_weights=kaldi_weights))
    return jnp.log(jnp.maximum(mel, EPS))


@partial(jax.jit, static_argnums=(1, 2))
def mfcc(x: jnp.ndarray, num_ceps: int = NUM_CEPS,
         kaldi_weights: bool = False) -> jnp.ndarray:
    """(num_samples,) waveform -> (T, num_ceps) cepstra."""
    logmel = fbank(x, kaldi_weights=kaldi_weights)
    return logmel @ jnp.asarray(dct_matrix(num_ceps))


def cmn(features: jnp.ndarray, var_norm: bool = False) -> jnp.ndarray:
    """Per-utterance cepstral mean (and optional variance) normalization."""
    mu = features.mean(axis=0, keepdims=True)
    out = features - mu
    if var_norm:
        out = out / jnp.maximum(features.std(axis=0, keepdims=True), 1e-5)
    return out


def cmn_per_speaker(features: np.ndarray, offsets: np.ndarray,
                    speakers: np.ndarray, var_norm: bool = False
                    ) -> np.ndarray:
    """CMN with statistics pooled over each speaker's utterances
    (the reference's mfcc_cmn_perspk feature variant).

    ``speakers[u]`` is an integer speaker id per utterance.
    """
    out = np.array(features, dtype=np.float32, copy=True)
    for spk in np.unique(speakers):
        rows = np.concatenate([
            np.arange(offsets[u], offsets[u + 1])
            for u in np.nonzero(speakers == spk)[0]])
        mu = out[rows].mean(axis=0, keepdims=True)
        out[rows] -= mu
        if var_norm:
            out[rows] /= np.maximum(out[rows].std(axis=0, keepdims=True), 1e-5)
    return out


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------

def fbank_pallas(x: jnp.ndarray, block_frames: int = 128,
                 interpret: bool = False,
                 kaldi_weights: bool = False) -> jnp.ndarray:
    """Fused fbank: window + DFT matmuls + power + mel + log per VMEM
    block. Equivalent to ``fbank`` (tested allclose)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = num_frames(x.shape[0])
    if t == 0:
        return jnp.zeros((0, NUM_MEL), dtype=jnp.float32)
    frames = frame_signal(x)                      # (T, frame_len)
    t_pad = ((t + block_frames - 1) // block_frames) * block_frames
    frames = jnp.pad(frames, ((0, t_pad - t), (0, 0)))

    win = jnp.asarray(povey_window())
    cos_b, sin_b = dft_bases()
    cos_b = jnp.asarray(cos_b)
    sin_b = jnp.asarray(sin_b)
    mel = jnp.asarray(mel_filterbank(kaldi_weights=kaldi_weights))

    def kernel(frames_ref, win_ref, cos_ref, sin_ref, mel_ref, out_ref):
        f = frames_ref[:] * win_ref[:]
        re = jnp.dot(f, cos_ref[:], preferred_element_type=jnp.float32)
        im = jnp.dot(f, sin_ref[:], preferred_element_type=jnp.float32)
        power = re * re + im * im
        melspec = jnp.dot(power, mel_ref[:],
                          preferred_element_type=jnp.float32)
        out_ref[:] = jnp.log(jnp.maximum(melspec, EPS))

    grid = (t_pad // block_frames,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_frames, FRAME_LEN), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FRAME_LEN), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FRAME_LEN, NFFT // 2 + 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FRAME_LEN, NFFT // 2 + 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NFFT // 2 + 1, NUM_MEL), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_frames, NUM_MEL), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, NUM_MEL), jnp.float32),
        interpret=interpret,
    )(frames, win[None, :], cos_b, sin_b, mel)
    return out[:t]
