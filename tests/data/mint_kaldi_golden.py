"""Provenance script for the pinned Kaldi-convention feature goldens.

Run once to (re)mint:

    python tests/data/mint_kaldi_golden.py

Oracles are INDEPENDENT of nnacousticmodeling_tpu:

* ``kaldi_mel_fb40.npy`` — the (257, 40) Kaldi-convention mel filter
  bank from ``transformers.audio_utils.mel_filter_bank`` with
  ``mel_scale="kaldi", triangularize_in_mel_space=True`` (the
  implementation HuggingFace validates against
  torchaudio.compliance.kaldi / Kaldi's mel-banks.cc), at the fbank40
  settings: 16 kHz, nfft 512, low 20 Hz, high 8 kHz, no norm.
* ``kaldi_fbank_golden.npz`` — {x: (4000,) deterministic waveform,
  y: (23, 40) log-mel} computed here with plain numpy (snip-edges
  framing, per-frame preemphasis 0.97 with first-sample
  self-subtraction, Povey window hann^0.85, np.fft.rfft power
  spectrum) and the transformers filter bank — no shared code with
  ops/features.py (which uses DFT-as-matmul and its own mel builder).
"""

import numpy as np
from transformers.audio_utils import mel_filter_bank

HERE = __file__.rsplit("/", 1)[0]

SR, FRAME, HOP, NFFT, NMEL = 16000, 400, 160, 512, 40

fb = mel_filter_bank(
    num_frequency_bins=NFFT // 2 + 1, num_mel_filters=NMEL,
    min_frequency=20.0, max_frequency=SR / 2.0, sampling_rate=SR,
    norm=None, mel_scale="kaldi", triangularize_in_mel_space=True,
).astype(np.float32)
np.save(f"{HERE}/kaldi_mel_fb40.npy", fb)

rng = np.random.default_rng(123)
x = rng.standard_normal(4000).astype(np.float32)
t = 1 + (len(x) - FRAME) // HOP
frames = np.stack([x[i * HOP:i * HOP + FRAME] for i in range(t)])
prev = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
frames = frames - 0.97 * prev
n = np.arange(FRAME)
povey = (0.5 - 0.5 * np.cos(2 * np.pi * n / (FRAME - 1))) ** 0.85
spec = np.fft.rfft(frames * povey, NFFT)
power = (spec.real ** 2 + spec.imag ** 2).astype(np.float32)
y = np.log(np.maximum(power @ fb, 1.1921e-07)).astype(np.float32)
np.savez(f"{HERE}/kaldi_fbank_golden.npz", x=x, y=y)
print("minted:", fb.shape, y.shape)
