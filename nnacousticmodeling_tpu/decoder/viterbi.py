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
  length masking; backpointers stay ON DEVICE, packed as one int32 per
  (frame, biphone) — ``triphone * 2048 + entry_time`` — and the
  backtrace runs as a vmapped ``lax.while_loop``, so only the final
  (segments, counts) tensors ever reach the host (the posterior and
  backpointer matrices never cross the interconnect).

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

NEG_INF = -1.0e20   # the reference's infinity stand-in
TIME_PACK = 2048    # minimum packing: tri * pack + (t_entry + 1); grows
                    # per-decode as the next power of two > T+1 so long
                    # utterances decode without chunking (bounded by
                    # num_triphones * pack < 2^31)


@dataclass
class DecodeResult:
    """Segments of one utterance: (begin_frame, end_frame, phone)."""

    segments: List[Tuple[int, int, str]]

    @property
    def phones(self) -> List[str]:
        return [p for _, _, p in self.segments]


class ViterbiDecoder:
    """Decodes log-posterior matrices into phone segmentations.

    ``backend``: "auto" picks, in order, the right-context-collapsed
    Pallas kernel (``viterbi_collapsed.py`` — the fastest path), the
    dense cube kernel (``viterbi_pallas.py``), then the XLA scan path,
    degrading whenever an image's structure is unsupported; off-TPU
    "auto" is always the XLA path. "collapsed"/"pallas" force the
    respective kernel (interpreted off-TPU, for tests); "xla" forces
    the scan path. The ``NNAM_VITERBI_BACKEND`` env var overrides
    "auto".
    """

    def __init__(self, image: HmmImage, pip: float = 20.0, lmw: float = 1.0,
                 backend: str = "auto", beam: Optional[float] = None):
        self.image = image
        # the CLI contract passes -|PIP| to the recognizer
        # (evaluateModelForTest.py:124); Init then adds it on phone entry.
        self.pip = -abs(pip)
        self.lmw = lmw
        # beam pruning: after each frame's biphone export (+LM), scores
        # below (frame max - beam) clamp to NEG_INF. The same rule as
        # the native decoder's (Decoder::set_beam) — identical decoded
        # segments for the same beam, and a wide beam reproduces the
        # exact search. None/<=0 disables. On TPU the compute stays
        # dense (pruning is one select per frame, not a speedup — the
        # speedup case is the host decoder's skip of all-dead triphones).
        self.beam = float(beam) if beam is not None and beam > 0 else None

        img = image
        if img.num_triphones * TIME_PACK >= 2 ** 31:
            raise ValueError("image too large for packed backpointers")
        self.max_frames = 2 ** 31 // img.num_triphones - 2
        self._biphone_in = jnp.asarray(img.biphone_in)
        self._state_idxs = jnp.asarray(img.state_idxs)           # (T3, 3)
        self._tp_self = jnp.asarray(img.tp_selfloop)             # (T3, 3)
        self._tp_trans = jnp.asarray(img.tp_transition)          # (T3, 3)
        self._lm = jnp.asarray(img.lm * np.float32(lmw))         # (B,)
        fanin = img.dense_fanin()                                # (B, F) ids, -1 pad
        self._fanin = jnp.asarray(fanin)
        self._fanin_valid = jnp.asarray(fanin >= 0)
        self._fanin_any = jnp.asarray(fanin.max(axis=1) >= 0)
        self._end_idxs = jnp.asarray(img.end_idxs)               # (P,)

        # initial biphone scores: lm[start_p] - log(P) on start biphones
        p0 = np.full(img.num_biphones, NEG_INF, dtype=np.float32)
        lmw_lm = img.lm * np.float32(lmw)
        for p in range(img.num_phones):
            p0[img.start_idxs[p]] = lmw_lm[img.start_idxs[p]] - np.log(
                np.float32(img.num_phones))
        self._p0 = jnp.asarray(p0)

        self._cube_order = self._detect_cube_order()
        if self._cube_order is not None:
            self._build_cube_obs_tables()
        self._decode_jit = jax.jit(jax.vmap(self._decode_device),
                                   static_argnums=())

        import os
        if backend == "auto":
            backend = os.environ.get("NNAM_VITERBI_BACKEND", "auto")
        self.backend = "xla"
        self._pallas_fwd = None
        self._collapsed_fwd = None
        if backend != "xla" and self._cube_order is not None:
            on_tpu = jax.default_backend() == "tpu"
            from .viterbi_pallas import UnsupportedImage
            if backend == "collapsed" or (backend == "auto" and on_tpu):
                # preferred: right-context-collapsed lanes (2.25x
                # smaller DP planes than the dense cube kernel)
                from .viterbi_collapsed import PallasCollapsedViterbi
                try:
                    self._collapsed_fwd = PallasCollapsedViterbi(
                        image, self._cube_order, pip=self.pip, lmw=lmw,
                        beam=self.beam, interpret=not on_tpu)
                    self.backend = "collapsed"
                except UnsupportedImage:
                    if backend == "collapsed":
                        raise
            if (self._collapsed_fwd is None
                    and backend in ("pallas", "auto") and on_tpu
                    or backend == "pallas"):
                from .viterbi_pallas import PallasCubeViterbi
                try:
                    self._pallas_fwd = PallasCubeViterbi(
                        image, self._cube_order, pip=self.pip, lmw=lmw,
                        beam=self.beam, interpret=not on_tpu)
                    self.backend = "pallas"
                except UnsupportedImage:
                    if backend == "pallas":
                        raise
        self._backtrace_jit = jax.jit(jax.vmap(self._pallas_backtrace))
        self._pallas_decode_jit = None

    def _pallas_backtrace(self, packed, end_scores, length):
        """Backtrace over the Pallas kernel's permuted-lane packed
        backpointers (maps built in ``PallasCubeViterbi.__init__``)."""
        return self._device_backtrace(
            packed, end_scores, length,
            end_map=self._pallas_fwd.end_lane,
            bi_map=self._pallas_fwd.bi_in_lane)

    def _validate_frames(self, t: int) -> None:
        """Frame-count ceiling for the backend that will decode: the
        collapsed kernel packs only the left context (P * pack bound);
        the cube/XLA paths pack whole triphone ids."""
        if self._collapsed_fwd is not None:
            self._collapsed_pack_for(t)
        else:
            self._time_pack_for(t)

    @staticmethod
    def _grow_pack(t: int) -> int:
        """Smallest power-of-two pack > t+1 (>= TIME_PACK) — the one
        packing-growth rule shared by every backend."""
        pack = TIME_PACK
        while pack <= t + 1:
            pack *= 2
        return pack

    def _collapsed_pack_for(self, t: int) -> int:
        """Pack factor for a T-frame collapsed decode. The collapsed
        rows pack only the LEFT CONTEXT, so the ceiling is P * pack —
        far above the XLA/cube paths' num_triphones * pack bound (a
        TIMIT-scale image decodes ~45M frames instead of ~19k)."""
        pack = self._grow_pack(t)
        if self.image.num_phones * pack >= 2 ** 31:
            raise ValueError(
                f"utterance of {t} frames exceeds the collapsed "
                f"packed-backpointer ceiling; split the utterance")
        return pack

    def _collapsed_for_t(self, t: int):
        """Collapsed kernel instance whose pack factor covers ``t``
        frames (the default instance handles t < its own pack - 1;
        longer utterances get a per-pack cached instance instead of
        the cube kernels' XLA fallback — long-form audio decodes at
        kernel speed)."""
        if t < self._collapsed_fwd.pack - 1:
            return self._collapsed_fwd
        pack = self._collapsed_pack_for(t)
        cache = getattr(self, "_collapsed_long", None)
        if cache is None:
            cache = self._collapsed_long = {}
        if pack not in cache:
            from .viterbi_collapsed import PallasCollapsedViterbi
            k = self._collapsed_fwd
            # may run inside an outer jit trace (decode_arrays_fn):
            # the instance's device tables must be concrete constants,
            # not trace-captured tracers
            with jax.ensure_compile_time_eval():
                cache[pack] = PallasCollapsedViterbi(
                    self.image, self._cube_order, pip=self.pip,
                    lmw=self.lmw, beam=self.beam, interpret=k.interpret,
                    pack=pack)
        return cache[pack]

    def _collapsed_backtrace(self, packed, end_scores, length):
        """Backtrace over the collapsed kernel's per-lane ``a* *
        TIME_PACK + t_entry + 1`` backpointers.  The collapsed lane
        loses the right context, but the walk always KNOWS the real
        biphone it is tracing (the first hop starts from an end biphone
        and each hop computes its predecessor as (a*, center)), so the
        triphone id is reconstructed arithmetically per hop."""
        ck = self._collapsed_fwd
        P = self.image.num_phones
        T = packed.shape[0]
        # the pack factor of the instance that PRODUCED these rows —
        # never recomputed independently (single source of truth)
        pack = self._collapsed_for_t(T).pack
        bi2lane = ck.bi2lane

        last = end_scores[length - 1]
        mxi0 = self._end_idxs[jnp.argmax(last)]          # real biphone id

        segs0 = jnp.zeros((T, 3), dtype=jnp.int32)

        def cond(c):
            t, bi, k, segs = c
            return t >= 0

        def body(c):
            t, bi, k, segs = c
            entry = packed[t, bi2lane[bi]]
            a = entry // pack
            t_new = entry % pack - 1
            b = bi // P
            cc = bi % P
            if self._cube_order == "bac":
                tri = b * (P * P) + a * P + cc
            else:
                tri = a * (P * P) + b * P + cc
            segs = segs.at[k].set(jnp.stack([t_new + 1, t + 1, tri]))
            bi_new = a * P + b
            t_next = jnp.where(t_new >= t, -1, t_new)
            return (t_next, bi_new, k + 1, segs)

        t0 = length - 1
        _, _, count, segs = jax.lax.while_loop(
            cond, body, (t0, mxi0, jnp.int32(0), segs0))
        return segs, count

    def _pallas_decode_traced(self, lp, lengths):
        """Jit-composable Pallas forward + backtrace (one program)."""
        if self._collapsed_fwd is not None:
            ck = self._collapsed_for_t(lp.shape[1])
            packed, end_scores = ck.forward_traced(lp, lengths)
            return jax.vmap(self._collapsed_backtrace)(packed, end_scores,
                                                       lengths)
        packed, end_scores = self._pallas_fwd.forward_traced(lp, lengths)
        return jax.vmap(self._pallas_backtrace)(packed, end_scores,
                                                lengths)

    def _build_cube_obs_tables(self):
        """Tied-pdf observation tables for the cube fast path.

        The naive per-frame pdf gather (995k lookups from the 1909-entry
        posterior row) dominates decode time AND compile time on TPU.
        State tying means each (center phone, state) only ever uses a
        few dozen distinct pdfs (TIMIT: mean 13.7, max 35), so instead:
        gather the tiny (P, 3, K) table of distinct-pdf scores per
        frame, then expand to the cube with an exact one-hot
        contraction over K (each output touches exactly one table
        entry, so float32 results are bit-equal to the gather).
        """
        img = self.image
        P = img.num_phones
        cube = img.state_idxs.reshape(P, P, P, 3)
        if self._cube_order == "abc":
            # center phone is axis 1; normalize view to center-first
            cube = cube.transpose(1, 0, 2, 3)
        k_max = 0
        tables = np.zeros((P, 3, 1), dtype=np.int32)
        sels = np.zeros((P, P, P, 3), dtype=np.int32)
        per_bs = {}
        for b in range(P):
            for s in range(3):
                distinct, inverse = np.unique(cube[b, :, :, s],
                                              return_inverse=True)
                per_bs[(b, s)] = (distinct, inverse.reshape(P, P))
                k_max = max(k_max, len(distinct))
        table = np.zeros((P, 3, k_max), dtype=np.int32)
        sel = np.zeros((P, P, P, 3), dtype=np.int32)
        for (b, s), (distinct, inverse) in per_bs.items():
            table[b, s, :len(distinct)] = distinct
            sel[b, :, :, s] = inverse
        if self._cube_order == "abc":
            sel = sel.transpose(1, 0, 2, 3)
        self._obs_pdf_table = jnp.asarray(table)    # (P, 3, K)
        self._obs_sel = jnp.asarray(sel)            # cube-order (.., 3)
        self._obs_k = k_max

    def _cube_obs(self, lp_t):
        """lp_t (S,) -> (P, P, P, 3) observation cube, gather-free."""
        P = self.image.num_phones
        vals = lp_t[self._obs_pdf_table]            # (P, 3, K) tiny gather
        onehot = jax.nn.one_hot(self._obs_sel, self._obs_k,
                                dtype=lp_t.dtype)   # (.., 3, K)
        # precision HIGHEST: the contraction is one-hot (exactly one
        # nonzero term per output), but TPU DEFAULT precision multiplies
        # in bf16 — which silently rounds every observation value and
        # breaks float-exact parity with the gather-based Pallas kernel
        # and the native decoder (caught by an on-TPU parity check;
        # CPU backends multiply in f32 and never see it)
        if self._cube_order == "bac":
            # vals indexed by center phone = cube axis 0
            return jnp.einsum("bacsk,bsk->bacs", onehot, vals,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
        # 'abc': center phone = cube axis 1
        return jnp.einsum("abcsk,bsk->abcs", onehot, vals,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

    # ------------------------------------------------------------------
    def _time_pack_for(self, t: int) -> int:
        """Packing factor for a T-frame decode: the smallest power of
        two > T+1 (>= 2048, matching the Pallas kernel's fixed factor
        for short utterances). Static per compiled shape."""
        pack = self._grow_pack(t)
        if self.image.num_triphones * pack >= 2 ** 31:
            raise ValueError(
                f"utterance of {t} frames exceeds the packed-backpointer "
                f"ceiling ({self.max_frames} frames for this image); "
                f"split the utterance")
        return pack

    # ------------------------------------------------------------------
    def _detect_cube_order(self) -> Optional[str]:
        """Detect a dense full-context triphone cube and its index
        order: 'bac' (graph builder: idx = b*P^2 + a*P + c) or 'abc'
        (synthetic builder: idx = a*P^2 + b*P + c), with biphone
        (x, y) = x*P + y. For cube images both Viterbi gathers reduce to
        reshapes/transposes and axis reductions — the TPU fast path.
        """
        img = self.image
        P = img.num_phones
        if img.num_triphones != P ** 3 or img.num_biphones != P * P:
            return None
        a, b, c = np.meshgrid(np.arange(P), np.arange(P), np.arange(P),
                              indexing="ij")
        for order, (left, center, right) in (("abc", (a, b, c)),
                                             ("bac", (b, a, c))):
            bi_in = (left * P + center).reshape(-1)
            bi_out = (center * P + right).reshape(-1)
            if (np.array_equal(img.biphone_in, bi_in)
                    and np.array_equal(img.biphone_out, bi_out)):
                return order
        return None

    def _forward_scan_cube(self, lp, order: str):
        """Cube fast path: no gathers except the pdf observation lookup.

        Cube axes are [i0, i1, i2] where (left, center) come from the
        order: 'abc' -> (i0, i1), a-axis = 0; 'bac' -> (i1, i0),
        a-axis = 1. Export biphone is always (center, right); the
        first-max tie-break over the left-context axis equals the CSR
        order because triphone ids ascend with the left context within
        each (center, right) pair.
        """
        P = self.image.num_phones
        pack = self._time_pack_for(lp.shape[0])
        a_axis = 0 if order == "abc" else 1
        state_idxs = self._state_idxs.reshape(P, P, P, 3)
        tp_self = self._tp_self.reshape(P, P, P, 3)
        tp_trans = self._tp_trans.reshape(P, P, P, 3)
        lm = self._lm.reshape(P, P)          # [center, right]
        pip = jnp.float32(self.pip)
        # sil is phone id 1 -> name index 0: end biphone (p, sil) is
        # column 0 of the (center, right) matrix; general end_idxs kept
        # for images with non-contiguous conventions
        end_idxs = self._end_idxs

        def p_in_from(p_mat):
            # p_mat is [first, second] = (left, center); broadcast over
            # the right-context axis
            if order == "abc":
                return p_mat[:, :, None]          # [a, b, c]
            return p_mat.T[:, :, None]            # [b, a, c]

        def frame_step(carry, inp):
            p_mat, pp, tt = carry      # p (P,P), pp (P,P,P,3), tt int32
            lp_t, k = inp
            p_in = jnp.broadcast_to(p_in_from(p_mat) + pip, (P, P, P))
            obs = self._cube_obs(lp_t)                      # (P,P,P,3)
            go = jnp.stack([p_in, pp[..., 0] + tp_trans[..., 0],
                            pp[..., 1] + tp_trans[..., 1]], axis=-1)
            stay = pp + tp_self
            t_in = jnp.full((P, P, P), k - 1, dtype=jnp.int32)
            t_go = jnp.stack([t_in, tt[..., 0], tt[..., 1]], axis=-1)
            take_go = go > stay
            pp_new = jnp.where(take_go, go, stay) + obs
            tt_new = jnp.where(take_go, t_go, tt)

            out_score = pp_new[..., 2] + tp_trans[..., 2]   # (P,P,P)
            arg_a = jnp.argmax(out_score, axis=a_axis)      # (P,P) first max
            mx = jnp.max(out_score, axis=a_axis)
            best_t = jnp.take_along_axis(
                tt_new[..., 2], jnp.expand_dims(arg_a, a_axis),
                axis=a_axis).squeeze(a_axis)
            if order == "abc":
                tri = arg_a * (P * P) + (
                    jax.lax.broadcasted_iota(jnp.int32, (P, P), 0) * P
                    + jax.lax.broadcasted_iota(jnp.int32, (P, P), 1))
            else:
                tri = (jax.lax.broadcasted_iota(jnp.int32, (P, P), 0) * (P * P)
                       + arg_a * P
                       + jax.lax.broadcasted_iota(jnp.int32, (P, P), 1))
            p_new = mx + lm                                  # (P,P) [b, c]
            if self.beam is not None:
                p_new = jnp.where(p_new >= jnp.max(p_new) - self.beam,
                                  p_new, NEG_INF)
            packed = (tri * pack + (best_t + 1)).reshape(-1)
            end_scores = p_new.reshape(-1)[end_idxs]
            return (p_new, pp_new, tt_new), (packed, end_scores)

        T = lp.shape[0]
        pp0 = jnp.full((P, P, P, 3), NEG_INF, dtype=jnp.float32)
        tt0 = jnp.zeros((P, P, P, 3), dtype=jnp.int32)
        ks = jnp.arange(T, dtype=jnp.int32)
        # unroll amortizes per-step dispatch (measured +13% decode
        # throughput on v5e at batch 128)
        _, (packed, end_scores) = jax.lax.scan(
            frame_step, (self._p0.reshape(P, P), pp0, tt0), (lp, ks),
            unroll=4)
        return packed, end_scores

    def _forward_scan(self, lp):
        """lp (T, S) -> packed backpointers (T, B) int32 + end scores."""
        if self._cube_order is not None:
            return self._forward_scan_cube(lp, self._cube_order)
        biphone_in = self._biphone_in
        state_idxs = self._state_idxs
        tp_self = self._tp_self
        tp_trans = self._tp_trans
        lm = self._lm
        fanin = self._fanin
        fanin_valid = self._fanin_valid
        fanin_any = self._fanin_any
        pip = jnp.float32(self.pip)
        t3 = self.image.num_triphones
        pack = self._time_pack_for(lp.shape[0])

        def frame_step(carry, inp):
            p, pp, tt = carry          # p (B,), pp (T3,3) f32, tt (T3,3) i32
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
            best_i = jnp.where(fanin_any,
                               jnp.take_along_axis(fanin, col[:, None], axis=1)[:, 0],
                               0)                          # C++ default mxi=0
            p_new = mx + lm
            if self.beam is not None:
                p_new = jnp.where(p_new >= jnp.max(p_new) - self.beam,
                                  p_new, NEG_INF)
            best_t = tt_new[best_i, 2]
            packed = best_i * pack + (best_t + 1)          # entry time >= -1
            end_scores = p_new[self._end_idxs]             # (P,)
            return (p_new, pp_new, tt_new), (packed, end_scores)

        T = lp.shape[0]
        pp0 = jnp.full((t3, 3), NEG_INF, dtype=jnp.float32)
        tt0 = jnp.zeros((t3, 3), dtype=jnp.int32)
        ks = jnp.arange(T, dtype=jnp.int32)
        _, (packed, end_scores) = jax.lax.scan(
            frame_step, (self._p0, pp0, tt0), (lp, ks))
        return packed, end_scores

    # ------------------------------------------------------------------
    def _device_backtrace(self, packed, end_scores, length,
                          end_map=None, bi_map=None):
        """On-device backtrace (C++ :224-244 as a lax.while_loop).

        Returns segs (T, 3) int32 [begin, end, triphone] filled from
        index 0 = LAST segment, and the segment count.  ``end_map`` /
        ``bi_map`` translate (end-phone -> packed lane) and
        (triphone -> predecessor packed lane); they default to the
        original biphone indexing used by the XLA scan path, while the
        Pallas kernel supplies its permuted-lane maps.
        """
        T = packed.shape[0]
        pack = self._time_pack_for(T)
        biphone_in = self._biphone_in if bi_map is None else bi_map
        end_idxs = self._end_idxs if end_map is None else end_map

        last = end_scores[length - 1]                    # (P,)
        mxi0 = end_idxs[jnp.argmax(last)]                # first max wins

        segs0 = jnp.zeros((T, 3), dtype=jnp.int32)

        def cond(c):
            t, mxi, k, segs = c
            return t >= 0

        def body(c):
            t, mxi, k, segs = c
            entry = packed[t, mxi]
            tri = entry // pack
            t_new = entry % pack - 1
            segs = segs.at[k].set(
                jnp.stack([t_new + 1, t + 1, tri]))
            mxi_new = biphone_in[tri]
            # degenerate guard: native decoder loops forever when no
            # complete path exists (< 3 frames); we stop instead
            t_next = jnp.where(t_new >= t, -1, t_new)
            return (t_next, mxi_new, k + 1, segs)

        t0 = length - 1
        _, _, count, segs = jax.lax.while_loop(
            cond, body, (t0, mxi0, jnp.int32(0), segs0))
        return segs, count

    def _decode_device(self, lp, length):
        packed, end_scores = self._forward_scan(lp)
        return self._device_backtrace(packed, end_scores, length)

    # ------------------------------------------------------------------
    def _to_results(self, segs: np.ndarray, counts: np.ndarray
                    ) -> List[DecodeResult]:
        names = self.image.phone_names
        out = []
        for u in range(segs.shape[0]):
            k = int(counts[u])
            rows = segs[u, :k][::-1]                      # stored last-first
            out.append(DecodeResult(segments=[
                (int(b), int(e), names[int(tri)]) for b, e, tri in rows]))
        return out

    def decode_one(self, log_probs) -> DecodeResult:
        """Decode one utterance's (T, S) log-posterior matrix."""
        if log_probs.shape[1] != self.image.num_states:
            raise ValueError(
                f"posterior columns {log_probs.shape[1]} != image states "
                f"{self.image.num_states}")
        self._validate_frames(log_probs.shape[0])
        segs, count = self._decode_arrays(
            jnp.asarray(log_probs)[None],
            jnp.asarray([log_probs.shape[0]], dtype=jnp.int32))
        return self._to_results(np.asarray(segs), np.asarray(count))[0]

    def _decode_arrays(self, lp, lengths):
        # the collapsed kernel covers ANY length via per-pack cached
        # instances (left-context-only packing); the cube kernel packs
        # whole triphone ids at the fixed minimum factor, so long
        # utterances without a collapsed kernel take the XLA path
        if (self._collapsed_fwd is not None
                or (self._pallas_fwd is not None
                    and lp.shape[1] < TIME_PACK - 1)):
            # forward + backtrace as ONE program: one dispatch, and the
            # backtrace launches without a host round-trip
            if self._pallas_decode_jit is None:
                self._pallas_decode_jit = jax.jit(self._pallas_decode_traced)
            return self._pallas_decode_jit(
                lp, jnp.asarray(lengths, jnp.int32))
        return self._decode_jit(lp, lengths)

    def decode_arrays_fn(self):
        """Jit-composable ``(lp (U,T,S), lengths (U,)) -> (segs, counts)``
        using the fastest available backend — compose it with the
        acoustic forward under ONE ``jax.jit`` so the fused pipeline
        pays a single dispatch and never materializes the (U, T, S)
        posterior round-trip on the host side."""
        def fn(lp, lengths):
            lengths = jnp.asarray(lengths, jnp.int32)
            if (self._collapsed_fwd is not None
                    or (self._pallas_fwd is not None
                        and lp.shape[1] < TIME_PACK - 1)):
                return self._pallas_decode_traced(lp, lengths)
            return jax.vmap(self._decode_device)(lp, lengths)
        return fn

    def decode_batch(self, log_probs, lengths: Sequence[int]
                     ) -> List[DecodeResult]:
        """Decode a padded batch (U, T_max, S) with per-utterance lengths.

        Accepts numpy or device arrays; frames past each utterance's
        length are computed but ignored (backpointers at t < len are
        unaffected by later frames and each backtrace starts at its own
        last frame).
        """
        if log_probs.shape[2] != self.image.num_states:
            raise ValueError("posterior/state mismatch")
        self._validate_frames(log_probs.shape[1])
        segs, counts = self._decode_arrays(
            jnp.asarray(log_probs),
            jnp.asarray(lengths, dtype=jnp.int32))
        return self._to_results(np.asarray(segs), np.asarray(counts))

    def decode_fn(self):
        """Jit-composable (lp (U,T,S), lengths (U,)) -> (segs, counts)
        for fusing forward + decode into one compiled program."""
        return jax.vmap(self._decode_device)
