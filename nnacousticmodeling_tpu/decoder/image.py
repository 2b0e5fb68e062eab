"""Triphone-HMM decoding image: byte-exact reader/writer + builders.

The "image" is the compiled decoding graph the native recognizer
consumes. Byte layout (little-endian), reverse-specified from the
reference reader ``recog_src/source/phone_recog.cpp:84-136``::

    int32  num_phones, num_biphones, num_triphones, num_states
    int32  start_idxs[num_phones]        # entry biphone per phone
    int32  end_idxs[num_phones]          # final biphone per phone
    int32  biphone_in[num_triphones]     # in-biphone per triphone
    int32  biphone_out[num_triphones]    # out-biphone per triphone
    int32  state_idxs[num_triphones*3]   # pdf ids, triphone-major
    f32    tp_selfloop[num_triphones*3]  # log self-loop prob per state
    f32    tp_transition[num_triphones*3]# log forward-transition prob
    int32  out_offsets[num_biphones+1]   # CSR: triphones feeding each
    int32  out_values[out_offsets[-1]]   #      out-biphone
    f32    lm[num_biphones]              # log bigram LM per biphone
    int32  num_chars                     # then space-separated phone
    char   phone_table[num_chars]        # names, one per TRIPHONE

A "biphone" is a phone-pair connection point (left, center); triphone
(a-b+c) enters from biphone (a,b) and exits into (b,c). ``phone_table``
maps each triphone to its center phone's name (what gets emitted).

This module also provides a synthetic-image builder for unit tests and
the dense-fan-in arrays the TPU Viterbi uses instead of CSR loops.
"""

from __future__ import annotations

import io
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np


@dataclass
class HmmImage:
    num_phones: int
    num_biphones: int
    num_triphones: int
    num_states: int
    start_idxs: np.ndarray      # (P,) int32
    end_idxs: np.ndarray        # (P,) int32
    biphone_in: np.ndarray      # (T3,) int32
    biphone_out: np.ndarray     # (T3,) int32
    state_idxs: np.ndarray      # (T3, 3) int32 pdf ids
    tp_selfloop: np.ndarray     # (T3, 3) float32 log probs
    tp_transition: np.ndarray   # (T3, 3) float32 log probs
    out_offsets: np.ndarray     # (B+1,) int32 CSR offsets
    out_values: np.ndarray      # (nnz,) int32 triphone ids
    lm: np.ndarray              # (B,) float32 log LM scores (unscaled)
    phone_names: List[str]      # per-triphone emitted phone name

    def validate(self) -> "HmmImage":
        P, B, T3 = self.num_phones, self.num_biphones, self.num_triphones
        assert self.start_idxs.shape == (P,) and self.end_idxs.shape == (P,)
        assert self.biphone_in.shape == (T3,) and self.biphone_out.shape == (T3,)
        assert self.state_idxs.shape == (T3, 3)
        assert self.tp_selfloop.shape == (T3, 3)
        assert self.tp_transition.shape == (T3, 3)
        assert self.out_offsets.shape == (B + 1,)
        assert self.out_offsets[0] == 0
        assert len(self.out_values) == self.out_offsets[-1]
        assert len(self.phone_names) == T3
        assert self.biphone_in.min() >= 0 and self.biphone_in.max() < B
        assert self.biphone_out.min() >= 0 and self.biphone_out.max() < B
        assert self.state_idxs.min() >= 0 and self.state_idxs.max() < self.num_states
        # CSR must be consistent with biphone_out
        for b in range(B):
            tris = self.out_values[self.out_offsets[b]:self.out_offsets[b + 1]]
            assert np.all(self.biphone_out[tris] == b)
        return self

    # ------------------------------------------------------------------
    # Dense fan-in layout for the TPU decoder: (B, F) triphone-id matrix
    # with -1 padding, preserving CSR order so first-max tie-breaking
    # matches the native decoder's sequential loop.
    # ------------------------------------------------------------------
    def dense_fanin(self):
        B = self.num_biphones
        counts = np.diff(self.out_offsets)
        F = max(1, int(counts.max()))
        fanin = np.full((B, F), -1, dtype=np.int32)
        for b in range(B):
            c = counts[b]
            fanin[b, :c] = self.out_values[self.out_offsets[b]:self.out_offsets[b] + c]
        return fanin


def save_image(filename_or_buf, img: HmmImage) -> None:
    own = isinstance(filename_or_buf, (str, bytes))
    fid = open(filename_or_buf, "wb") if own else filename_or_buf
    try:
        hdr = np.array([img.num_phones, img.num_biphones,
                        img.num_triphones, img.num_states], dtype=np.int32)
        hdr.tofile(fid)
        img.start_idxs.astype(np.int32).tofile(fid)
        img.end_idxs.astype(np.int32).tofile(fid)
        img.biphone_in.astype(np.int32).tofile(fid)
        img.biphone_out.astype(np.int32).tofile(fid)
        img.state_idxs.astype(np.int32).reshape(-1).tofile(fid)
        img.tp_selfloop.astype(np.float32).reshape(-1).tofile(fid)
        img.tp_transition.astype(np.float32).reshape(-1).tofile(fid)
        img.out_offsets.astype(np.int32).tofile(fid)
        img.out_values.astype(np.int32).tofile(fid)
        img.lm.astype(np.float32).tofile(fid)
        table = " ".join(img.phone_names).encode("ascii")
        np.array([len(table)], dtype=np.int32).tofile(fid)
        fid.write(table)
    finally:
        if own:
            fid.close()


def load_image(filename_or_buf) -> HmmImage:
    own = isinstance(filename_or_buf, (str, bytes))
    fid = open(filename_or_buf, "rb") if own else filename_or_buf
    try:
        def ints(n):
            return np.fromfile(fid, dtype=np.int32, count=n)

        def floats(n):
            return np.fromfile(fid, dtype=np.float32, count=n)

        P, B, T3, S = (int(v) for v in ints(4))
        start_idxs = ints(P)
        end_idxs = ints(P)
        biphone_in = ints(T3)
        biphone_out = ints(T3)
        state_idxs = ints(3 * T3).reshape(T3, 3)
        tp_selfloop = floats(3 * T3).reshape(T3, 3)
        tp_transition = floats(3 * T3).reshape(T3, 3)
        out_offsets = ints(B + 1)
        out_values = ints(int(out_offsets[-1]))
        lm = floats(B)
        num_chars = int(ints(1)[0])
        table = fid.read(num_chars).decode("ascii")
        phone_names = table.split(" ")
        return HmmImage(
            num_phones=P, num_biphones=B, num_triphones=T3, num_states=S,
            start_idxs=start_idxs, end_idxs=end_idxs,
            biphone_in=biphone_in, biphone_out=biphone_out,
            state_idxs=state_idxs, tp_selfloop=tp_selfloop,
            tp_transition=tp_transition, out_offsets=out_offsets,
            out_values=out_values, lm=lm, phone_names=phone_names,
        )
    finally:
        if own:
            fid.close()


def _csr_from_biphone_out(biphone_out: np.ndarray, num_biphones: int):
    """Build the CSR fan-in lists (triphones sorted by out-biphone,
    ascending triphone id within a list — the construction order the
    native decoder's tie-breaking expects)."""
    order = np.argsort(biphone_out, kind="stable").astype(np.int32)
    counts = np.bincount(biphone_out, minlength=num_biphones)
    offsets = np.zeros(num_biphones + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    return offsets, order


def make_synthetic_image(
    num_phones: int = 4,
    num_states: Optional[int] = None,
    seed: int = 0,
    full_context: bool = True,
    tied: bool = True,
    pdf_tied_transitions: bool = False,
) -> HmmImage:
    """Random but structurally consistent image for tests.

    Phones p in [0, P); biphone (a, b) has index a*P + b; triphone
    (a-b+c) spans biphones (a,b) -> (b,c) and emits phone b's name.
    Start biphone of phone p is (p, p); end biphone of p is (p, 0).
    Random tied pdf ids and random (normalized) log transition probs.
    """
    rng = np.random.default_rng(seed)
    P = num_phones
    B = P * P
    tris = []
    for a in range(P):
        for b in range(P):
            for c in range(P):
                if full_context or rng.random() < 0.7:
                    tris.append((a, b, c))
    T3 = len(tris)
    biphone_in = np.array([a * P + b for a, b, c in tris], dtype=np.int32)
    biphone_out = np.array([b * P + c for a, b, c in tris], dtype=np.int32)
    if num_states is None:
        num_states = 3 * P + 2
    if tied:
        state_idxs = rng.integers(0, num_states, size=(T3, 3)).astype(np.int32)
    else:
        # context-independent: phone b's states use pdfs 3b, 3b+1, 3b+2
        # (requires num_states >= 3P); lets tests peak one phone uniquely
        if num_states < 3 * P:
            raise ValueError("untied image needs num_states >= 3*num_phones")
        state_idxs = np.array([[3 * b, 3 * b + 1, 3 * b + 2] for a, b, c in tris],
                              dtype=np.int32)
    if pdf_tied_transitions:
        # Kaldi ties transition params to the pdf (one transition-state
        # per (phone, hmm-state, pdf)); the Pallas cube kernel relies on
        # this, so tests use it to model the real images
        per_pdf = rng.uniform(0.3, 0.8, size=num_states)
        self_p = per_pdf[state_idxs]
    else:
        self_p = rng.uniform(0.3, 0.8, size=(T3, 3))
    tp_selfloop = np.log(self_p).astype(np.float32)
    tp_transition = np.log(1.0 - self_p).astype(np.float32)
    out_offsets, out_values = _csr_from_biphone_out(biphone_out, B)
    lm = rng.uniform(-3.0, -0.1, size=B).astype(np.float32)
    names = [f"p{b}" for a, b, c in tris]
    start_idxs = np.array([p * P + p for p in range(P)], dtype=np.int32)
    end_idxs = np.array([p * P for p in range(P)], dtype=np.int32)
    return HmmImage(
        num_phones=P, num_biphones=B, num_triphones=T3, num_states=num_states,
        start_idxs=start_idxs, end_idxs=end_idxs,
        biphone_in=biphone_in, biphone_out=biphone_out,
        state_idxs=state_idxs, tp_selfloop=tp_selfloop,
        tp_transition=tp_transition, out_offsets=out_offsets,
        out_values=out_values, lm=lm, phone_names=names,
    ).validate()
