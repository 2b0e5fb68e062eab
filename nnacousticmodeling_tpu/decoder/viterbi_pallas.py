"""Pallas TPU kernel for the cube-path triphone Viterbi forward pass.

The XLA ``lax.scan`` cube path (``viterbi.py::_forward_scan_cube``) is
HBM-bound: the (P, P, P, 3) score/backpointer carries round-trip to HBM
on every frame.  This kernel keeps the whole DP state VMEM-resident for
the entire utterance and streams only the per-frame observation table
in and the packed backpointer rows out.

Layout — the TPU-native redesign of ``phone_recog.cpp:138-216``, chosen
so that every per-frame data movement is either a hardware sublane
gather or a free lane-tiling, with exactly ONE small matmul left:

* DP state lives as (3 states, P sublanes = left context, P^2 lanes)
  with the lane axis in RIGHT-MAJOR biphone order: triphone (a, b, c)
  sits at [sublane a, lane c*P + b], which IS its out-biphone (b, c)
  at lane c*P + b.  The per-biphone export (max over feeding
  triphones, C++ CSR loop at phone_recog.cpp:198-212) is a plain
  sublane reduction, and the exported lane row is the next frame's
  biphone score row in place.
* Observations use the tied-pdf tables: each (center, state) touches
  <= K distinct pdfs (TIMIT: mean 13.7, max 35).  The (T, 3*K8, P)
  table of distinct-pdf scores is gathered once in XLA; in-kernel it
  broadcasts to lanes by ``pltpu.repeat`` (lane j holds center
  j % P — free tiling, no matmul), and the class expansion splits the
  class index into (group = k//8, slot = k%8) and runs ONE hardware
  sublane ``dynamic_gather`` per (state, group, 8-row band) at full
  lane width (~0.5 ns/vreg on v5e), overlaid by group.  This replaces
  the former K-step compare-select loop (~3 VPU passes per class)
  that dominated decode time.
* The phone-entry scores need the previous row rearranged from lane
  (a, b) = b*P + a to [sublane a, every lane with center b]: one
  one-hot matmul builds q[a, b] = p[b*P + a] (exact: single nonzero
  term per output, ``Precision.HIGHEST``), and ``pltpu.repeat`` tiles
  q across the right-context — the second rearrangement matmul of the
  earlier design is gone.
* End-biphone scores are a STATIC LANE SLICE when the image ends every
  phone in the same right context (the TIMIT graph's (p, sil) rule):
  in right-major order those are lanes [sil*P, sil*P + P).  Irregular
  images fall back to a one-hot extraction matmul.
* Kaldi ties transition probs to the pdf (one transition-state per
  (phone, hmm-state, pdf)), so the six per-(state, kind) transition
  log-prob planes are fully host-precomputed and DMA'd once; images
  whose transitions break this tying raise ``UnsupportedImage`` and
  fall back to the XLA path.

Outputs are the same packed backpointers (``tri * TIME_PACK +
entry_time + 1``) and per-frame end-biphone scores the XLA path
produces, except that the backpointer lane axis is right-major — the
``end_lane``/``bi_in_lane`` attributes give the backtrace the
original-id -> lane maps, and ``lane_map`` converts whole rows for
tests.  Backpointers are bit-identical to the XLA path (verified on
real TPU against the einsum-HIGHEST XLA path); gathers and tilings
move bits and the single matmul is a one-hot contraction, so scores
agree to the last ulp on CPU and within 1 ulp on TPU hardware (the
entry rearrangement runs through the MXU's f32 pass decomposition,
the XLA path broadcasts the row directly — ~0.1% of end-score entries
drift by one ulp over a 64-frame utterance, never flipping a
backpointer compare).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e20
TIME_PACK = 2048
_HIGHEST = jax.lax.Precision.HIGHEST


class UnsupportedImage(Exception):
    """Image shape/tying not expressible by the cube kernel."""


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_HIGHEST)


def _ceil(x: int, m: int) -> int:
    return -(-x // m) * m


class PallasCubeViterbi:
    """Forward token passing for dense full-context cube images.

    Built from an ``HmmImage`` whose triphones form the full P^3 cube
    (``cube_order`` as detected by ``ViterbiDecoder._detect_cube_order``:
    'bac' for the graph builder's ``idx = b*P^2 + a*P + c``, 'abc' for
    the synthetic builder).  ``forward(lp)`` maps a padded posterior
    batch (U, T, S) to packed backpointers (U, T, B) int32 (lane axis
    right-major — see ``end_lane``/``bi_in_lane``/``lane_map``) and end
    scores (U, T, P) float32 in original phone order.
    """

    def __init__(self, image, cube_order: str, pip: float, lmw: float,
                 chunk: int = 8, n_utt: int = 2, beam=None,
                 interpret: bool = False):
        P = image.num_phones
        B = image.num_biphones
        if image.num_triphones != P ** 3 or B != P * P:
            raise UnsupportedImage("not a dense cube image")
        if image.num_triphones * TIME_PACK >= 2 ** 31:
            raise UnsupportedImage("triphone count too large to pack")
        if not interpret and B % 128 != 0:
            # the in-kernel sublane gathers need lane-tile-aligned
            # widths; tiny (synthetic) images fall back to the XLA path
            raise UnsupportedImage("biphone count not lane-tile aligned")
        self.P, self.B, self.S = P, B, image.num_states
        self.PS = _ceil(P, 8)
        PS = self.PS
        if interpret:
            # shrink per-grid-step work off-TPU (see viterbi_collapsed)
            chunk, n_utt = min(chunk, 4), 1
        self.chunk = chunk
        # utterances interleaved per kernel instance: their frame
        # chains are independent so the scheduler can overlap them
        # (small measured gain on v5e — the kernel is VPU-issue-bound,
        # not latency-bound); frames past a shorter utterance's length
        # compute garbage the backtrace never reads (same contract as
        # the chunk-skip path)
        self.n_utt = max(1, n_utt)
        self.interpret = interpret

        # --- cube views in (left, center, right) order ----------------
        def to_lcr(arr3):
            cube = arr3.reshape((P, P, P) + arr3.shape[1:])
            if cube_order == "bac":               # (center, left, right)
                cube = cube.transpose((1, 0, 2) + tuple(
                    range(3, cube.ndim)))
            return cube

        pdf = to_lcr(image.state_idxs)            # (l, c, r, 3)
        tps_c = to_lcr(image.tp_selfloop)
        tpt_c = to_lcr(image.tp_transition)

        # --- tied-pdf classes per (center, state) ----------------------
        per = {}
        k_max = 0
        for b in range(P):
            for s in range(3):
                plane = pdf[:, b, :, s]           # (left, right)
                distinct, inverse = np.unique(plane, return_inverse=True)
                per[(b, s)] = (distinct, inverse.reshape(P, P))
                k_max = max(k_max, len(distinct))
        K8 = _ceil(max(k_max, 1), 8)
        G = K8 // 8
        self.K8, self.G = K8, G

        # --- per-frame value table (XLA-side gather): row s*K8 + k,
        # column = center; padding -> pdf 0
        table = np.zeros((3, K8, P), dtype=np.int32)
        # --- class-selection planes: sel[s, a, c*P + b] ----------------
        sel = np.zeros((3, PS, B), dtype=np.int32)
        for b in range(P):
            for s in range(3):
                distinct, inverse = per[(b, s)]
                table[s, :len(distinct), b] = distinct
                # lanes {c*P + b} for center b: start b, stride P
                sel[s, :P, b::P] = inverse        # (left, right)
        self._table_flat = jnp.asarray(table.reshape(-1))
        self._sel_lo = jnp.asarray(sel & 7)
        self._sel_hi = jnp.asarray(sel >> 3)
        # adaptive group counts: how many 8-row gather groups each
        # (state, 8-left-context band) actually needs — the global K8
        # padding is driven by the worst (center, state) pair, but most
        # bands stop well short of it (TIMIT: 59 of 90 groups)
        hi = sel >> 3
        self._g_sb = [[int(hi[s, sc * 8:sc * 8 + 8, :].max()) + 1
                       for sc in range(PS // 8)] for s in range(3)]

        # --- transition planes, host-precomputed ------------------------
        # tps[which*3 + s][a, c*P + b]; tying check: constant per class
        tps = np.full((6, PS, B), NEG_INF, dtype=np.float32)
        for which, cube_tp in ((0, tps_c), (1, tpt_c)):
            for b in range(P):
                for s in range(3):
                    distinct, inverse = per[(b, s)]
                    plane = cube_tp[:, b, :, s]
                    sums = np.zeros(len(distinct), np.float64)
                    np.add.at(sums, inverse.reshape(-1), plane.reshape(-1))
                    counts = np.bincount(inverse.reshape(-1),
                                         minlength=len(distinct))
                    means = (sums / counts).astype(np.float32)
                    if not np.all(plane == means[inverse]):
                        raise UnsupportedImage(
                            "transition probs not tied to pdf classes")
                    tps[which * 3 + s, :P, b::P] = means[inverse]
        self._tps = jnp.asarray(tps)

        # --- entry rearrangement: q[a, b] = p[lane b*P + a] -------------
        lane = np.arange(B)
        Ea = np.zeros((PS, B), np.float32)        # Ea[a, j] = (j % P == a)
        Fb = np.zeros((B, P), np.float32)         # Fb[j, b] = (j // P == b)
        Ea[lane % P, lane] = 1.0
        Fb[lane, lane // P] = 1.0
        self._Ea, self._Fb = jnp.asarray(Ea), jnp.asarray(Fb)

        # --- lane maps (original biphone id x*P + y -> lane y*P + x) ----
        lane_map = (np.arange(B) % P) * P + np.arange(B) // P
        self.lane_map = lane_map
        end_idxs = np.asarray(image.end_idxs)
        # end extraction: static slice when every phone ends in the same
        # right context with first == the phone itself (TIMIT: (p, sil))
        if (len(end_idxs) == P
                and np.all(end_idxs % P == end_idxs[0] % P)
                and np.all(end_idxs // P == np.arange(P))):
            self._end_slice = int(end_idxs[0] % P) * P
            self._E_end = None
        else:
            self._end_slice = None
            E_end = np.zeros((B, P), np.float32)
            E_end[lane_map[end_idxs], np.arange(P)] = 1.0
            self._E_end = jnp.asarray(E_end)

        # --- rows: LM, initial biphone scores, triphone id bases --------
        lm = image.lm.astype(np.float32) * np.float32(lmw)
        p0 = np.full(B, NEG_INF, dtype=np.float32)
        p0[image.start_idxs] = (lm[image.start_idxs]
                                - np.log(np.float32(P)))
        lm_p = np.empty(B, np.float32)
        p0_p = np.empty(B, np.float32)
        lm_p[lane_map] = lm
        p0_p[lane_map] = p0
        self._lm = jnp.asarray(lm_p[None, :])
        self._p0 = jnp.asarray(p0_p[None, :])
        b_of, c_of = lane % P, lane // P
        if cube_order == "abc":                   # tri = a*P^2 + b*P + c
            self._a_coef = P * P
            tri_base = b_of * P + c_of
        else:                                     # tri = b*P^2 + a*P + c
            self._a_coef = P
            tri_base = b_of * (P * P) + c_of
        self._tri_base = jnp.asarray(tri_base.astype(np.int32)[None, :])

        # original-id maps for the backtrace (viterbi.py)
        self.end_lane = jnp.asarray(lane_map[end_idxs].astype(np.int32))
        self.bi_in_lane = jnp.asarray(
            lane_map[np.asarray(image.biphone_in)].astype(np.int32))

        self._pip = float(pip)
        # beam pruning (ViterbiDecoder.beam rule): clamp exported
        # biphone scores below (frame max - beam) to NEG_INF
        self._beam = float(beam) if beam is not None and beam > 0 else None
        self._fwd = jax.jit(self._forward_impl)

    # ------------------------------------------------------------------
    def _kernel(self, lens_ref, vals_ref, lo_ref, hi_ref, tps_ref, ea_ref,
                fb_ref, eend_ref, lm_ref, p0_ref, tbase_ref,
                packed_ref, end_ref, pp_ref, tt_ref, pc_ref):
        P, PS, B, K8 = self.P, self.PS, self.B, self.K8
        NU = self.n_utt
        chunk = self.chunk
        pip = jnp.float32(self._pip)
        u = pl.program_id(0)
        ch = pl.program_id(1)

        @pl.when(ch == 0)
        def _init():
            pp_ref[:] = jnp.full((NU, 3, PS, B), NEG_INF, jnp.float32)
            tt_ref[:] = jnp.zeros((NU, 3, PS, B), jnp.int32)
            pc_ref[:] = jnp.broadcast_to(p0_ref[:], (NU, B))

        def obs_plane(tab, s):
            """(PS, B) observation scores for state s: grouped hardware
            sublane gathers over the tiled class-value rows, with
            per-(state, band) adaptive group counts."""
            rows = []
            for sc in range(PS // 8):
                r0 = sc * 8
                lo_s = lo_ref[s, r0:r0 + 8, :]
                part = jnp.take_along_axis(tab[s * K8:s * K8 + 8, :],
                                           lo_s, axis=0)
                g_max = self._g_sb[s][sc]
                if g_max > 1:
                    hi_s = hi_ref[s, r0:r0 + 8, :]
                    for g in range(1, g_max):
                        gath = jnp.take_along_axis(
                            tab[s * K8 + 8 * g:s * K8 + 8 * g + 8, :],
                            lo_s, axis=0)
                        part = jnp.where(hi_s == g, gath, part)
                rows.append(part)
            return rows[0] if len(rows) == 1 else jnp.concatenate(rows,
                                                                  axis=0)

        aidx = jax.lax.broadcasted_iota(jnp.int32, (PS, B), 0)

        def frame_one(v, i, k_glob):
            vt = vals_ref[v, i]                          # (3*K8, P)
            tab = pltpu.repeat(vt, P, axis=1)            # lane j: center j%P

            # entry scores: p_in[a, c*P + b] = p[b*P + a] + pip
            prow = pc_ref[pl.ds(v, 1)]                   # (1, B)
            q = _dot(ea_ref[:] * prow, fb_ref[:])        # (PS, P) exact
            p_in = pltpu.repeat(q, P, axis=1) + pip      # (PS, B)

            old0, old1, old2 = pp_ref[v, 0], pp_ref[v, 1], pp_ref[v, 2]
            t0o, t1o, t2o = tt_ref[v, 0], tt_ref[v, 1], tt_ref[v, 2]

            # states updated from pre-frame snapshots (C++ :167-190)
            go2 = old1 + tps_ref[4]
            stay2 = old2 + tps_ref[2]
            take2 = go2 > stay2
            pp2 = jnp.where(take2, go2, stay2) + obs_plane(tab, 2)
            tt2 = jnp.where(take2, t1o, t2o)

            go1 = old0 + tps_ref[3]
            stay1 = old1 + tps_ref[1]
            take1 = go1 > stay1
            pp1 = jnp.where(take1, go1, stay1) + obs_plane(tab, 1)
            tt1 = jnp.where(take1, t0o, t1o)

            stay0 = old0 + tps_ref[0]
            take0 = p_in > stay0
            pp0 = jnp.where(take0, p_in, stay0) + obs_plane(tab, 0)
            tt0 = jnp.where(take0,
                            jnp.full((PS, B), k_glob - 1, jnp.int32), t0o)

            pp_ref[v, 0], pp_ref[v, 1], pp_ref[v, 2] = pp0, pp1, pp2
            tt_ref[v, 0], tt_ref[v, 1], tt_ref[v, 2] = tt0, tt1, tt2

            # per-biphone export: max over the left-context sublanes;
            # first-max tie-break matches the C++ strict-< update order
            out_score = pp2 + tps_ref[5]                 # (PS, B)
            mx = jnp.max(out_score, axis=0, keepdims=True)
            arg = jnp.min(jnp.where(out_score == mx, aidx, P),
                          axis=0, keepdims=True)         # (1, B)
            bt = jnp.sum(jnp.where(aidx == arg, tt2, 0),
                         axis=0, keepdims=True)
            tri = arg * self._a_coef + tbase_ref[:]
            packed_ref[v, pl.ds(i, 1), :] = tri * TIME_PACK + bt + 1
            pnew = mx + lm_ref[:]
            if self._beam is not None:
                rowmax = jnp.max(pnew, axis=1, keepdims=True)
                pnew = jnp.where(pnew >= rowmax - self._beam, pnew, NEG_INF)
            pc_ref[pl.ds(v, 1)] = pnew
            if self._end_slice is not None:
                end_ref[v, pl.ds(i, 1), :] = (
                    pnew[:, self._end_slice:self._end_slice + P])
            else:
                end_ref[v, pl.ds(i, 1), :] = _dot(pnew, eend_ref[:])

        def frame(i, _):
            k_glob = ch * chunk + i
            for v in range(NU):
                frame_one(v, i, k_glob)
            return 0

        # skip chunks entirely past the interleaved utterances' last
        # frame: the backtrace never reads packed/end rows at t >= length
        max_len = lens_ref[u * NU]
        for v in range(1, NU):
            max_len = jnp.maximum(max_len, lens_ref[u * NU + v])

        @pl.when(ch * chunk < max_len)
        def _run():
            # unrolled (not fori_loop): the frame chain has a 3-frame
            # pipeline depth (entry(t) feeds state 0, whose mass only
            # reaches the export two frames later), so exposing the
            # whole chunk to the scheduler lets independent planes
            # overlap across frames (measured +4% on v5e)
            for i in range(chunk):
                frame(i, 0)

    # ------------------------------------------------------------------
    def _forward_impl(self, lp: jax.Array, lengths: jax.Array
                      ) -> Tuple[jax.Array, jax.Array]:
        P, PS, B, K8, chunk = self.P, self.PS, self.B, self.K8, self.chunk
        NU = self.n_utt
        U, T, S = lp.shape
        lengths = jnp.asarray(lengths, jnp.int32)
        Tp = -(-T // chunk) * chunk
        Up = -(-U // NU) * NU
        if Tp != T or Up != U:
            lp = jnp.pad(lp, ((0, Up - U), (0, Tp - T), (0, 0)))
        if Up != U:
            lengths = jnp.pad(lengths, (0, Up - U))
        # distinct-pdf score table per frame, gathered in XLA
        vals = jnp.take(lp, self._table_flat, axis=2,
                        indices_are_sorted=False, unique_indices=False)
        vals = vals.reshape(Up, Tp, 3 * K8, P)

        const = lambda u, c, lens: (0, 0)
        const3 = lambda u, c, lens: (0, 0, 0)
        eend = (self._E_end if self._E_end is not None
                else jnp.zeros((B, P), jnp.float32))
        packed, end = pl.pallas_call(
            self._kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(Up // NU, Tp // chunk),
                in_specs=[
                    pl.BlockSpec((NU, chunk, 3 * K8, P),
                                 lambda u, c, lens: (u, c, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((3, PS, B), const3,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((3, PS, B), const3,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((6, PS, B), const3,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((PS, B), const, memory_space=pltpu.VMEM),
                    pl.BlockSpec((B, P), const, memory_space=pltpu.VMEM),
                    pl.BlockSpec((B, P), const, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, B), const, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, B), const, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, B), const, memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((NU, chunk, B), lambda u, c, lens: (u, c, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((NU, chunk, P), lambda u, c, lens: (u, c, 0),
                                 memory_space=pltpu.VMEM),
                ],
                scratch_shapes=[
                    pltpu.VMEM((NU, 3, PS, B), jnp.float32),  # pp
                    pltpu.VMEM((NU, 3, PS, B), jnp.int32),    # tt
                    pltpu.VMEM((NU, B), jnp.float32),         # biphone scores
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((Up, Tp, B), jnp.int32),
                jax.ShapeDtypeStruct((Up, Tp, P), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=self.interpret,
        )(lengths, vals, self._sel_lo,
          self._sel_hi, self._tps, self._Ea, self._Fb, eend,
          self._lm, self._p0, self._tri_base)
        return packed[:U, :T], end[:U, :T]

    def forward(self, lp: jax.Array, lengths=None
                ) -> Tuple[jax.Array, jax.Array]:
        """(U, T, S) log-posteriors -> packed bptrs (U, T, B) int32
        (right-major lane axis — index via ``end_lane``/``bi_in_lane``)
        and end-biphone scores (U, T, P) float32 in original phone
        order, value-identical to the XLA path's per-frame scan outputs
        for every frame t < lengths[u] (rows at or past an utterance's
        length are skipped — the backtrace never reads them).
        ``lengths`` defaults to T."""
        if lengths is None:
            lengths = jnp.full((lp.shape[0],), lp.shape[1], jnp.int32)
        return self._fwd(lp, jnp.asarray(lengths, jnp.int32))

    def forward_traced(self, lp: jax.Array, lengths: jax.Array
                       ) -> Tuple[jax.Array, jax.Array]:
        """Unjitted forward for composing under an outer ``jax.jit``
        (fused forward+decode programs)."""
        return self._forward_impl(lp, jnp.asarray(lengths, jnp.int32))
