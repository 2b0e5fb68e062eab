"""Batched triphone Viterbi decoding on TPU.

Behavioral twin of the native recognizer's token passing
(``recog_src/source/phone_recog.cpp:138-254``), re-designed for XLA:

* the per-triphone 3-state update is fully vectorized — a gather of the
  previous biphone scores plus elementwise max over (T3, 3) lanes (the
  C++ inner loops read only pre-update snapshots, so no sequential
  dependency exists inside a frame);
* the per-biphone export (max over each out-biphone's feeding
  triphones, C++ CSR loop at phone_recog.cpp:198-212) becomes a dense
  (num_biphones, max_fanin) gather + row max/argmax — static shapes,
  VPU-friendly, no scatter;
* ``jnp.argmax``'s first-max tie-breaking over the CSR-ordered fan-in
  matrix reproduces the native decoder's strict ``<`` update order;
* frames scan via ``lax.scan``; utterances batch via ``vmap`` with
  length masking; the backtrace (sequential, tiny) runs on host over
  the int32 backpointer matrices the scan emits.

Decode-relevant quirks preserved: initial mass ``lm[start_p] - log(P)``
on each phone's start biphone (phone_recog.cpp:148), the phone
insertion penalty applied on every phone entry including the first
(:172), entry times recorded as ``k-1`` (:173), and segment boundaries
emitted as ``t+1`` (:236-244).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .image import HmmImage

NEG_INF = -1.0e20  # the reference's infinity stand-in


@dataclass
class DecodeResult:
    """Segments of one utterance: (begin_frame, end_frame, phone)."""

    segments: List[Tuple[int, int, str]]

    @property
    def phones(self) -> List[str]:
        return [p for _, _, p in self.segments]


class ViterbiDecoder:
    """Decodes log-posterior matrices into phone segmentations."""

    def __init__(self, image: HmmImage, pip: float = 20.0, lmw: float = 1.0):
        self.image = image
        # the CLI contract passes -|PIP| to the recognizer
        # (evaluateModelForTest.py:124); Init then adds it on phone entry.
        self.pip = -abs(pip)
        self.lmw = lmw

        img = image
        self._biphone_in = jnp.asarray(img.biphone_in)
        self._state_idxs = jnp.asarray(img.state_idxs)           # (T3, 3)
        self._tp_self = jnp.asarray(img.tp_selfloop)             # (T3, 3)
        self._tp_trans = jnp.asarray(img.tp_transition)          # (T3, 3)
        self._lm = jnp.asarray(img.lm * np.float32(lmw))         # (B,)
        fanin = img.dense_fanin()                                # (B, F) ids, -1 pad
        self._fanin = jnp.asarray(fanin)
        self._fanin_valid = jnp.asarray(fanin >= 0)
        self._end_idxs = jnp.asarray(img.end_idxs)               # (P,)

        # initial biphone scores: lm[start_p] - log(P) on start biphones
        p0 = np.full(img.num_biphones, NEG_INF, dtype=np.float32)
        lmw_lm = img.lm * np.float32(lmw)
        for p in range(img.num_phones):
            p0[img.start_idxs[p]] = lmw_lm[img.start_idxs[p]] - np.log(
                np.float32(img.num_phones))
        self._p0 = jnp.asarray(p0)

        self._scan_fn = jax.jit(self._make_scan())
        self._scan_fn_batched = jax.jit(jax.vmap(self._make_scan()))

    # ------------------------------------------------------------------
    def _make_scan(self):
        biphone_in = self._biphone_in
        state_idxs = self._state_idxs
        tp_self = self._tp_self
        tp_trans = self._tp_trans
        lm = self._lm
        fanin = self._fanin
        fanin_valid = self._fanin_valid
        end_idxs = self._end_idxs
        pip = jnp.float32(self.pip)
        t3 = self.image.num_triphones

        def frame_step(carry, inp):
            p, pp, tt = carry          # p (B,), pp (T3,3), tt (T3,3) int32
            lp_t, k = inp              # lp_t (S,), k frame index
            p_in = p[biphone_in] + pip                     # (T3,)
            obs = lp_t[state_idxs]                         # (T3, 3)
            go = jnp.stack([p_in, pp[:, 0] + tp_trans[:, 0],
                            pp[:, 1] + tp_trans[:, 1]], axis=1)
            stay = pp + tp_self
            t_in = jnp.full((t3,), k - 1, dtype=jnp.int32)
            t_go = jnp.stack([t_in, tt[:, 0], tt[:, 1]], axis=1)
            take_go = go > stay                            # strict >, C++ :181
            pp_new = jnp.where(take_go, go, stay) + obs
            tt_new = jnp.where(take_go, t_go, tt)

            # export: max over each out-biphone's feeding triphones
            out_score = pp_new[:, 2] + tp_trans[:, 2]      # (T3,)
            gathered = jnp.where(fanin_valid, out_score[fanin], NEG_INF)  # (B, F)
            col = jnp.argmax(gathered, axis=1)             # first max = CSR order
            mx = jnp.take_along_axis(gathered, col[:, None], axis=1)[:, 0]
            best_i = jnp.where(fanin_valid.any(axis=1),
                               jnp.take_along_axis(fanin, col[:, None], axis=1)[:, 0],
                               0)                          # C++ default mxi=0
            p_new = mx + lm
            best_t = tt_new[best_i, 2]
            end_scores = p_new[end_idxs]                   # (P,)
            return (p_new, pp_new, tt_new), (best_i, best_t, end_scores)

        def run(lp):
            """lp: (T, S) log posteriors -> backpointers + end scores."""
            T = lp.shape[0]
            pp0 = jnp.full((t3, 3), NEG_INF, dtype=jnp.float32)
            tt0 = jnp.zeros((t3, 3), dtype=jnp.int32)
            ks = jnp.arange(T, dtype=jnp.int32)
            _, (best_i, best_t, end_scores) = jax.lax.scan(
                frame_step, (self._p0, pp0, tt0), (lp, ks))
            return best_i, best_t, end_scores

        return run

    # ------------------------------------------------------------------
    def _backtrace(self, best_i: np.ndarray, best_t: np.ndarray,
                   end_scores: np.ndarray, num_frames: int) -> DecodeResult:
        img = self.image
        # final argmax over phones' end biphones, first max wins (C++ :226-232)
        last = end_scores[num_frames - 1]                  # (P,)
        mxi = int(img.end_idxs[int(np.argmax(last))])
        segments: List[Tuple[int, int, str]] = []
        t = num_frames - 1
        while t >= 0:
            tri = int(best_i[t, mxi])
            end = t + 1
            t_prev = t
            t = int(best_t[t, mxi])
            begin = t + 1
            segments.append((begin, end, img.phone_names[tri]))
            mxi = int(img.biphone_in[tri])
            if t >= t_prev:
                # no complete path exists (utterance shorter than the
                # 3-state HMM): the native decoder's backtrace loops
                # forever here (phone_recog.cpp:236-244); we stop.
                break
        segments.reverse()
        return DecodeResult(segments=segments)

    # ------------------------------------------------------------------
    def decode_one(self, log_probs: np.ndarray) -> DecodeResult:
        """Decode one utterance's (T, S) log-posterior matrix."""
        if log_probs.shape[1] != self.image.num_states:
            raise ValueError(
                f"posterior columns {log_probs.shape[1]} != image states "
                f"{self.image.num_states}")
        best_i, best_t, end_scores = self._scan_fn(jnp.asarray(log_probs))
        return self._backtrace(np.asarray(best_i), np.asarray(best_t),
                               np.asarray(end_scores), log_probs.shape[0])

    def decode_batch(
        self,
        log_probs: np.ndarray,
        lengths: Sequence[int],
    ) -> List[DecodeResult]:
        """Decode a padded batch (U, T_max, S) with per-utterance lengths.

        Frames past each utterance's length are computed but ignored:
        backpointers at t < len are unaffected by later frames, and the
        backtrace starts from each utterance's own last frame.
        """
        if log_probs.shape[2] != self.image.num_states:
            raise ValueError("posterior/state mismatch")
        best_i, best_t, end_scores = self._scan_fn_batched(jnp.asarray(log_probs))
        best_i = np.asarray(best_i)
        best_t = np.asarray(best_t)
        end_scores = np.asarray(end_scores)
        return [
            self._backtrace(best_i[u], best_t[u], end_scores[u], int(lengths[u]))
            for u in range(log_probs.shape[0])
        ]
