"""Right-context-collapsed Pallas TPU kernel for the cube Viterbi.

The dense cube kernel (``viterbi_pallas.py``) keeps DP planes of shape
(3, P, P^2) — for TIMIT (P = 48) that is 18 lane-tiles per plane, and
its per-frame cost is VPU-issue-bound (r04 ablation).  This kernel
shrinks the lane axis itself using a structural property of tied-state
triphone images: two triphones (a, b, c) and (a, b, c') whose pdf ids
agree for every (left context a, HMM state s) have IDENTICAL DP
traces — same entry stream (the entry score depends only on (a, b),
phone_recog.cpp:167-176), same observation scores, and same transition
probs (Kaldi ties transitions to the pdf).  The right-context axis
therefore collapses into joint equivalence classes; on the TIMIT
1909-pdf image the 48 right contexts collapse to 15.8 classes per
center phone on average (max 31).

Layout:

* Each real center phone's classes are split into pseudo-centers of at
  most ``cap`` (default 8) classes; TIMIT yields 115 pseudo-centers,
  padded to P' = 128.  DP state lives as (3 states, P sublanes = left
  context, L = cap * P' lanes) with lane = class_slot * P' +
  pseudo_center — L = 1024 = 8 lane-tiles, a 2.25x plane shrink.
* The per-frame observation table is (3, K8, P') distinct-pdf scores
  (gathered in XLA); in-kernel expansion is the cube kernel's grouped
  hardware sublane ``dynamic_gather``, now with per-(state, band,
  lane-chunk) adaptive group counts and first-use-ordered class
  numbering, on 8-tile planes.
* The LM score is per-biphone, which no longer fits a collapsed lane
  (one lane holds several biphones), so LM moves from export-time to
  ENTRY-time: pc holds raw biphone maxima, and the entry rearrangement
  adds lm[(a, b)] — a constant (P, P') plane — before the phone
  insertion penalty.  Addition order matches the XLA path bit-exactly
  (((mx + lm) + pip)); start scores get lm the same way, with the
  initial row holding only -log(P) mass on start lanes.
* Beam pruning becomes entry/end-side: the per-frame threshold
  max(pnew + lm) - beam is computed with a per-lane max-member-lm row
  (f32 addition is monotone, so the lane winner equals the per-biphone
  winner bit-exactly) and carried in SMEM to the next frame's entry
  clamp, replicating the XLA rule (viterbi.py) exactly.
* End-biphone extraction: classes are numbered with the common end
  right-context's class FIRST, so every phone's end lane is
  lane = base_of[phone] < P' — the end row is a static lane slice of
  pnew plus a constant lm row; the (P',) -> (P,) selection happens in
  XLA after the kernel.
* Backpointers pack (winning left context a*, entry time) per
  collapsed lane: ``a* * TIME_PACK + t_entry + 1``.  The backtrace
  (ViterbiDecoder._collapsed_backtrace) tracks the REAL biphone id it
  is tracing — the right context is always known there — and
  reconstructs the triphone id arithmetically, so losing c in the lane
  does not lose it in the result.  ``packed_to_full`` expands a packed
  batch to the XLA path's (T, B) layout for bit-parity tests.

Reference hot loop this replaces: recog_src/source/phone_recog.cpp:
166-216 (per-frame per-triphone 3-state max recursion + per-biphone
export).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .viterbi_pallas import UnsupportedImage

NEG_INF = -1.0e20
TIME_PACK = 2048
_HIGHEST = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_HIGHEST)


def _ceil(x: int, m: int) -> int:
    return -(-x // m) * m


class PallasCollapsedViterbi:
    """Collapsed-lane forward token passing for dense cube images.

    ``forward(lp, lengths)`` maps a padded posterior batch (U, T, S) to
    packed backpointers (U, T, L) int32 in collapsed-lane space (see
    ``bi2lane``) and end scores (U, T, P) float32 in original phone
    order (bit-identical to the XLA scan path's).
    """

    def __init__(self, image, cube_order: str, pip: float, lmw: float,
                 chunk: int = 16, n_utt: int = 2, beam=None,
                 interpret: bool = False, cap: int = 8,
                 pack: int = TIME_PACK):
        # chunk=16 n_utt=2 measured best on v5e (6059 audio-s/s vs 5925
        # at chunk=8, 5300 at chunk=32)
        P = image.num_phones
        B = image.num_biphones
        if image.num_triphones != P ** 3 or B != P * P:
            raise UnsupportedImage("not a dense cube image")
        # collapsed rows pack only the LEFT CONTEXT (not the triphone),
        # so the packing ceiling is P * pack — long-form utterances get
        # a per-pack kernel instance (ViterbiDecoder._decode_arrays)
        # instead of the cube kernels' XLA fallback
        self.pack = int(pack)
        if P * self.pack >= 2 ** 31:
            raise UnsupportedImage("pack factor too large")
        self.P, self.B, self.S = P, B, image.num_states
        self.PS = _ceil(P, 8)
        PS = self.PS
        if interpret:
            # interpret mode executes the unrolled frame bodies in
            # Python — shrink the per-grid-step work (the chunk-skip /
            # interleave logic is structurally identical at any size)
            chunk, n_utt = min(chunk, 4), 1
        self.chunk = chunk
        self.n_utt = max(1, n_utt)
        self.interpret = interpret
        self.cube_order = cube_order

        # --- cube views in (left, center, right) order ----------------
        def to_lcr(arr3):
            cube = arr3.reshape((P, P, P) + arr3.shape[1:])
            if cube_order == "bac":               # (center, left, right)
                cube = cube.transpose((1, 0, 2) + tuple(
                    range(3, cube.ndim)))
            return cube

        pdf = to_lcr(image.state_idxs)            # (a, b, c, 3)
        tps_c = to_lcr(image.tp_selfloop)
        tpt_c = to_lcr(image.tp_transition)

        # --- transition tying check (same contract as the cube kernel):
        # tp must be a function of (center, state, pdf id)
        for b in range(P):
            for s in range(3):
                plane = pdf[:, b, :, s]
                for cube_tp in (tps_c, tpt_c):
                    tpl = cube_tp[:, b, :, s]
                    distinct, inverse = np.unique(plane, return_inverse=True)
                    inverse = inverse.reshape(-1)
                    sums = np.zeros(len(distinct), np.float64)
                    np.add.at(sums, inverse, tpl.reshape(-1))
                    counts = np.bincount(inverse, minlength=len(distinct))
                    means = (sums / counts).astype(np.float32)
                    if not np.all(tpl.reshape(-1) == means[inverse]):
                        raise UnsupportedImage(
                            "transition probs not tied to pdf classes")

        # --- common end right-context (for the static end-lane slice) --
        end_idxs = np.asarray(image.end_idxs)
        if not (len(end_idxs) == P
                and np.all(end_idxs // P == np.arange(P))
                and len(set(end_idxs % P)) == 1):
            raise UnsupportedImage("ends not (p, r_end) per phone")
        r_end = int(end_idxs[0] % P)

        # --- joint right-context classes per center --------------------
        cls_of = np.zeros((P, P), np.int64)
        n_cls = np.zeros(P, np.int64)
        for b in range(P):
            key = pdf[:, b, :, :].transpose(1, 0, 2).reshape(P, -1)
            u, inv = np.unique(key, axis=0, return_inverse=True)
            n = len(u)
            # end class first: end lane = lane 0 of the first chunk
            order = list(range(n))
            ke = int(inv[r_end])
            order.remove(ke)
            order.insert(0, ke)
            rank = np.empty(n, np.int64)
            rank[order] = np.arange(n)
            cls_of[b] = rank[inv]
            n_cls[b] = n

        # --- pseudo-centers: chunks of <= cap classes ------------------
        pseudo_real = []
        pseudo_cls0 = []
        base_of = np.zeros(P, np.int64)
        for b in range(P):
            base_of[b] = len(pseudo_real)
            for i in range(0, int(n_cls[b]), cap):
                pseudo_real.append(b)
                pseudo_cls0.append(i)
        n_pseudo = len(pseudo_real)
        gran = 128 // math.gcd(128, cap)
        Pp = _ceil(max(n_pseudo, 1), gran)
        L = cap * Pp                     # multiple of lcm(128, cap)
        self.Pp, self.L, self.cap = Pp, L, cap
        pseudo_real = np.asarray(pseudo_real + [0] * (Pp - n_pseudo))
        pseudo_cls0 = np.asarray(pseudo_cls0 + [0] * (Pp - n_pseudo))
        self._n_pseudo = n_pseudo

        # slots per pseudo (valid class count) and member rep contexts
        n_slot = np.minimum(np.maximum(
            n_cls[pseudo_real] - pseudo_cls0, 0), cap)
        n_slot[n_pseudo:] = 0
        reps = np.zeros((Pp, cap), np.int64)
        for bp in range(n_pseudo):
            b = pseudo_real[bp]
            for cc in range(cap):
                k = pseudo_cls0[bp] + min(cc, max(int(n_slot[bp]) - 1, 0))
                members = np.where(cls_of[b] == k)[0]
                reps[bp, cc] = members[0]

        # --- bi2lane: biphone (x*P + y) -> collapsed lane --------------
        x = np.arange(B) // P
        y = np.arange(B) % P
        k_of = cls_of[x, y]
        bp_of = base_of[x] + k_of // cap
        bi2lane = (k_of % cap) * Pp + bp_of
        self.bi2lane = jnp.asarray(bi2lane.astype(np.int32))
        self._bi2lane_np = bi2lane.astype(np.int64)
        self.pc0_map = jnp.asarray(base_of.astype(np.int32))

        # --- observation tables: distinct pdfs per (pseudo, state),
        # first-use (band-major) ordered for low early-band sel values
        lists = {}
        k_max = 1
        for bp in range(Pp):
            b = pseudo_real[bp]
            for s in range(3):
                plane = pdf[:, b, :, s][:, reps[bp]]      # (P, cap)
                flat = plane.reshape(-1)
                _, first = np.unique(flat, return_index=True)
                # distinct values ordered by first (band-major) use
                distinct = flat[np.sort(first)]
                remap = {v: i for i, v in enumerate(distinct)}
                sel_plane = np.vectorize(remap.__getitem__)(plane)
                lists[(bp, s)] = (distinct, sel_plane)
                k_max = max(k_max, len(distinct))
        K8 = _ceil(k_max, 8)
        self.K8 = K8
        table = np.zeros((3, K8, Pp), np.int32)
        sel = np.zeros((3, PS, L), np.int32)
        for bp in range(Pp):
            for s in range(3):
                distinct, sel_plane = lists[(bp, s)]
                table[s, :len(distinct), bp] = distinct
                lanes = np.arange(cap) * Pp + bp
                sel[s, :P, lanes] = sel_plane.T       # (cap, P) -> rows
        self._table_flat = jnp.asarray(table.reshape(-1))
        self._sel_lo = jnp.asarray(sel & 7)
        self._sel_hi = jnp.asarray(sel >> 3)
        # adaptive group counts per (state, 8-row band, 128-lane chunk)
        hi = sel >> 3
        n_chunk = max(L // 128, 1)
        self._chunk_w = 128 if L >= 128 else L
        self._g_sbc = [[[int(hi[s, sc * 8:sc * 8 + 8,
                               ck * self._chunk_w:(ck + 1) * self._chunk_w
                               ].max()) + 1
                         for ck in range(n_chunk)]
                        for sc in range(PS // 8)] for s in range(3)]

        # --- transition planes ----------------------------------------
        tps = np.full((6, PS, L), NEG_INF, dtype=np.float32)
        for bp in range(n_pseudo):
            b = pseudo_real[bp]
            for cc in range(cap):
                lane = cc * Pp + bp
                r = reps[bp, cc]
                for s in range(3):
                    tps[s, :P, lane] = tps_c[:, b, r, s]
                    tps[3 + s, :P, lane] = tpt_c[:, b, r, s]
        self._tps = jnp.asarray(tps)

        # --- entry rearrangement + lm/start/beam constants -------------
        lanes = np.arange(L)
        lane_bp = lanes % Pp
        lane_cc = lanes // Pp
        lane_x = pseudo_real[lane_bp]                 # real center
        lane_k = pseudo_cls0[lane_bp] + lane_cc       # class id (if valid)
        lane_valid = (lane_bp < n_pseudo) & (lane_cc < n_slot[lane_bp])

        Ea = np.zeros((PS, L), np.float32)
        Ea[lane_x, lanes] = (lane_bp < n_pseudo).astype(np.float32)
        self._Ea = jnp.asarray(Ea)
        # Fb[j, bp] = 1 iff biphone (x(j), real(bp)) belongs to lane j:
        # for each target column bp (entry center = real(bp)), the
        # source lane is bi2lane[x * P + real(bp)] for every left x
        Fb = np.zeros((L, Pp), np.float32)
        for bp in range(n_pseudo):
            yb = int(pseudo_real[bp])
            src = self._bi2lane_np[np.arange(P) * P + yb]
            Fb[src, bp] = 1.0
        self._Fb = jnp.asarray(Fb)

        lm = image.lm.astype(np.float32) * np.float32(lmw)
        lmq = np.full((PS, Pp), NEG_INF, dtype=np.float32)
        for bp in range(n_pseudo):
            yb = int(pseudo_real[bp])
            lmq[:P, bp] = lm[np.arange(P) * P + yb]
        self._lmq = jnp.asarray(lmq)

        # per-lane max member lm (beam row-max) and start mass
        starts = np.zeros(B, bool)
        starts[np.asarray(image.start_idxs)] = True
        lmmax = np.full((1, L), NEG_INF, np.float32)
        p0 = np.full((1, L), NEG_INF, np.float32)
        for j in range(L):
            if not lane_valid[j]:
                continue
            xj = int(lane_x[j])
            members = np.where(cls_of[xj] == lane_k[j])[0]
            bis = xj * P + members
            lmmax[0, j] = lm[bis].max()
            st = starts[bis]
            if st.any() != st.all():
                raise UnsupportedImage(
                    "start biphones not class-consistent")
            if st.all():
                p0[0, j] = -np.log(np.float32(P))
        self._lmmax = jnp.asarray(lmmax)
        self._p0 = jnp.asarray(p0)

        lmend = np.zeros((1, Pp), np.float32)
        for p in range(P):
            lmend[0, int(base_of[p])] = lm[p * P + r_end]
        self._lmend = jnp.asarray(lmend)

        self._pip = float(pip)
        self._beam = float(beam) if beam is not None and beam > 0 else None
        self._fwd = jax.jit(self._forward_impl)

    # ------------------------------------------------------------------
    def packed_to_full(self, packed_c: np.ndarray) -> np.ndarray:
        """Expand (..., L) collapsed packed rows to the XLA path's
        (..., B) ``tri * pack + t_entry + 1`` layout (tests; requires
        the XLA path to use the same pack factor)."""
        P = self.P
        v = np.asarray(packed_c)[..., self._bi2lane_np]      # (..., B)
        a = v // self.pack
        rest = v % self.pack
        b = np.arange(self.B) // P
        c = np.arange(self.B) % P
        if self.cube_order == "bac":
            tri = b * P * P + a * P + c
        else:
            tri = a * P * P + b * P + c
        return (tri * self.pack + rest).astype(np.int32)

    # ------------------------------------------------------------------
    def _kernel(self, lens_ref, vals_ref, lo_ref, hi_ref, tps_ref, ea_ref,
                fb_ref, lmq_ref, lmmax_ref, lmend_ref, p0_ref,
                packed_ref, end_ref, pp_ref, tt_ref, pc_ref, thr_ref):
        P, PS, L, Pp, K8 = self.P, self.PS, self.L, self.Pp, self.K8
        NU = self.n_utt
        cap = self.cap
        chunk = self.chunk
        cw = self._chunk_w
        n_chunk = max(L // 128, 1)
        pip = jnp.float32(self._pip)
        u = pl.program_id(0)
        ch = pl.program_id(1)

        @pl.when(ch == 0)
        def _init():
            pp_ref[:] = jnp.full((NU, 3, PS, L), NEG_INF, jnp.float32)
            tt_ref[:] = jnp.zeros((NU, 3, PS, L), jnp.int32)
            pc_ref[:] = jnp.broadcast_to(p0_ref[:], (NU, L))
            for v in range(NU):        # SMEM only takes scalar stores
                thr_ref[v, 0] = jnp.float32(-3.0e38)

        # gather-source strategy per 128-lane chunk: when Pp % 128 == 0
        # every chunk lies inside one class-slot block, so the source is
        # a plain column slice of the (8, Pp) value rows; otherwise the
        # rows are lane-tiled once to full width (source[:, j] =
        # rows[:, j % Pp] matches lane = cc*Pp + b' for ANY Pp)
        sliced_src = Pp % 128 == 0

        def obs_plane(vt, s):
            """(PS, L) observation scores for state s: grouped hardware
            sublane gathers off the compact (K8, Pp) value rows —
            per-(band, chunk) adaptive group counts."""

            cache = {}

            def src(g):
                if g not in cache:
                    rows = vt[s * K8 + 8 * g:
                              s * K8 + 8 * g + 8, :]         # (8, Pp)
                    cache[g] = (rows if sliced_src
                                else pltpu.repeat(rows, cap, axis=1))
                return cache[g]

            bands = []
            for sc in range(PS // 8):
                r0 = sc * 8
                chunks = []
                for ck in range(n_chunk):
                    c0 = ck * cw

                    def chunk_src(g):
                        if sliced_src:
                            off = c0 % Pp
                            return src(g)[:, off:off + cw]
                        return src(g)[:, c0:c0 + cw]

                    lo_c = lo_ref[s, r0:r0 + 8, c0:c0 + cw]
                    part = jnp.take_along_axis(chunk_src(0), lo_c, axis=0)
                    g_max = self._g_sbc[s][sc][ck]
                    if g_max > 1:
                        hi_c = hi_ref[s, r0:r0 + 8, c0:c0 + cw]
                        for g in range(1, g_max):
                            gath = jnp.take_along_axis(chunk_src(g), lo_c,
                                                       axis=0)
                            part = jnp.where(hi_c == g, gath, part)
                    chunks.append(part)
                bands.append(chunks[0] if len(chunks) == 1
                             else jnp.concatenate(chunks, axis=1))
            return bands[0] if len(bands) == 1 else jnp.concatenate(
                bands, axis=0)

        aidx = jax.lax.broadcasted_iota(jnp.int32, (PS, L), 0)
        # packed (left-context, entry-time) key for the single-pass
        # first-max export reduction: key = a*pack + (tt+1) IS the
        # packed backpointer; min over rows where out == mx gives the
        # lowest-a winner AND its entry time in ONE masked
        # min-reduction (tt+1 <= T < pack cannot cross an `a`
        # boundary, so min order == (a, ·) lexicographic)
        pack_base = aidx * self.pack + 1

        def entry_all(i):
            """All NU utterances' entry scores in ONE one-hot matmul
            (doubles the MXU rows at the same dispatch latency)."""
            rows = [ea_ref[:] * pc_ref[pl.ds(v, 1)] for v in range(NU)]
            masked = (rows[0] if NU == 1
                      else jnp.concatenate(rows, axis=0))   # (NU*PS, L)
            qq = _dot(masked, fb_ref[:])                    # (NU*PS, Pp)
            qs = []
            for v in range(NU):
                q = qq[v * PS:(v + 1) * PS] + lmq_ref[:]
                if self._beam is not None:
                    q = jnp.where(q >= thr_ref[v, 0], q, NEG_INF)
                qs.append(q + pip)
            return qs

        def frame_one(v, i, k_glob, q):
            vt = vals_ref[v, i]                          # (3*K8, Pp)
            p_in = pltpu.repeat(q, cap, axis=1)          # (PS, L)

            old0, old1, old2 = pp_ref[v, 0], pp_ref[v, 1], pp_ref[v, 2]
            t0o, t1o, t2o = tt_ref[v, 0], tt_ref[v, 1], tt_ref[v, 2]

            go2 = old1 + tps_ref[4]
            stay2 = old2 + tps_ref[2]
            take2 = go2 > stay2
            pp2 = jnp.where(take2, go2, stay2) + obs_plane(vt, 2)
            tt2 = jnp.where(take2, t1o, t2o)

            go1 = old0 + tps_ref[3]
            stay1 = old1 + tps_ref[1]
            take1 = go1 > stay1
            pp1 = jnp.where(take1, go1, stay1) + obs_plane(vt, 1)
            tt1 = jnp.where(take1, t0o, t1o)

            stay0 = old0 + tps_ref[0]
            take0 = p_in > stay0
            pp0 = jnp.where(take0, p_in, stay0) + obs_plane(vt, 0)
            tt0 = jnp.where(take0,
                            jnp.full((PS, L), k_glob - 1, jnp.int32), t0o)

            pp_ref[v, 0], pp_ref[v, 1], pp_ref[v, 2] = pp0, pp1, pp2
            tt_ref[v, 0], tt_ref[v, 1], tt_ref[v, 2] = tt0, tt1, tt2

            # export: first-max over left-context sublanes (C++ strict-<)
            out_score = pp2 + tps_ref[5]                 # (PS, L)
            mx = jnp.max(out_score, axis=0, keepdims=True)
            key = jnp.min(jnp.where(out_score == mx, pack_base + tt2,
                                    jnp.int32(2 ** 31 - 1)),
                          axis=0, keepdims=True)         # (1, L)
            packed_ref[v, pl.ds(i, 1), :] = key
            pnew = mx                                    # raw max, NO lm
            if self._beam is not None:
                rowm = jnp.max(pnew + lmmax_ref[:])
                thr_ref[v, 0] = rowm - self._beam
            endrow = pnew[:, 0:Pp] + lmend_ref[:]
            if self._beam is not None:
                endrow = jnp.where(endrow >= thr_ref[v, 0], endrow,
                                   NEG_INF)
            end_ref[v, pl.ds(i, 1), :] = endrow
            pc_ref[pl.ds(v, 1)] = pnew

        def frame(i):
            k_glob = ch * chunk + i
            qs = entry_all(i)
            for v in range(NU):
                frame_one(v, i, k_glob, qs[v])

        max_len = lens_ref[u * NU]
        for v in range(1, NU):
            max_len = jnp.maximum(max_len, lens_ref[u * NU + v])

        @pl.when(ch * chunk < max_len)
        def _run():
            # unrolled: the frame chain has a 3-frame pipeline depth, so
            # exposing the whole chunk lets independent planes overlap
            for i in range(chunk):
                frame(i)

    # ------------------------------------------------------------------
    def _forward_impl(self, lp: jax.Array, lengths: jax.Array
                      ) -> Tuple[jax.Array, jax.Array]:
        P, PS, L, Pp, K8 = self.P, self.PS, self.L, self.Pp, self.K8
        chunk = self.chunk
        NU = self.n_utt
        U, T, S = lp.shape
        lengths = jnp.asarray(lengths, jnp.int32)
        Tp = _ceil(T, chunk)
        Up = _ceil(U, NU)
        if Tp != T or Up != U:
            lp = jnp.pad(lp, ((0, Up - U), (0, Tp - T), (0, 0)))
        if Up != U:
            lengths = jnp.pad(lengths, (0, Up - U))
        vals = jnp.take(lp, self._table_flat, axis=2,
                        indices_are_sorted=False, unique_indices=False)
        vals = vals.reshape(Up, Tp, 3 * K8, Pp)

        const = lambda u, c, lens: (0, 0)
        const3 = lambda u, c, lens: (0, 0, 0)
        packed, end = pl.pallas_call(
            self._kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(Up // NU, Tp // chunk),
                in_specs=[
                    pl.BlockSpec((NU, chunk, 3 * K8, Pp),
                                 lambda u, c, lens: (u, c, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((3, PS, L), const3,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((3, PS, L), const3,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((6, PS, L), const3,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((PS, L), const, memory_space=pltpu.VMEM),
                    pl.BlockSpec((L, Pp), const, memory_space=pltpu.VMEM),
                    pl.BlockSpec((PS, Pp), const, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, L), const, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, Pp), const, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, L), const, memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((NU, chunk, L),
                                 lambda u, c, lens: (u, c, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((NU, chunk, Pp),
                                 lambda u, c, lens: (u, c, 0),
                                 memory_space=pltpu.VMEM),
                ],
                scratch_shapes=[
                    pltpu.VMEM((NU, 3, PS, L), jnp.float32),   # pp
                    pltpu.VMEM((NU, 3, PS, L), jnp.int32),     # tt
                    pltpu.VMEM((NU, L), jnp.float32),          # pc
                    pltpu.SMEM((NU, 1), jnp.float32),          # beam thr
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((Up, Tp, L), jnp.int32),
                jax.ShapeDtypeStruct((Up, Tp, Pp), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=self.interpret,
        )(lengths, vals, self._sel_lo, self._sel_hi, self._tps,
          self._Ea, self._Fb, self._lmq, self._lmmax, self._lmend,
          self._p0)
        end_full = jnp.take(end, self.pc0_map, axis=2)
        return packed[:U, :T], end_full[:U, :T]

    def forward(self, lp: jax.Array, lengths=None
                ) -> Tuple[jax.Array, jax.Array]:
        """(U, T, S) log-posteriors -> packed bptrs (U, T, L) int32 in
        collapsed-lane space (``a* * TIME_PACK + t_entry + 1``; index
        via ``bi2lane``) and end scores (U, T, P) float32, value-
        identical to the XLA path for every frame t < lengths[u]."""
        if lengths is None:
            lengths = jnp.full((lp.shape[0],), lp.shape[1], jnp.int32)
        return self._fwd(lp, jnp.asarray(lengths, jnp.int32))

    def forward_traced(self, lp: jax.Array, lengths: jax.Array
                       ) -> Tuple[jax.Array, jax.Array]:
        """Unjitted forward for composing under an outer ``jax.jit``."""
        return self._forward_impl(lp, jnp.asarray(lengths, jnp.int32))
