"""Pallas TPU kernel for the cube-path triphone Viterbi forward pass.

The XLA ``lax.scan`` cube path (``viterbi.py::_forward_scan_cube``) is
HBM-bound: the (P, P, P, 3) score/backpointer carries round-trip to HBM
on every frame (~5 MB/frame/utterance of carry traffic alone).  This
kernel keeps the whole DP state VMEM-resident for the entire utterance
and streams only the per-frame observation table in and the packed
backpointer rows out, so HBM traffic drops from O(state x frames) to
O(posteriors + backpointers) -- the decode becomes VPU-bound.

Layout (the TPU-native redesign of ``phone_recog.cpp:138-216``):

* DP state lives as (3 states, P sublanes = left context, P^2 lanes =
  center*P + right).  The lane axis is the out-biphone index, so the
  per-biphone export (max over feeding triphones, C++ CSR loop at
  phone_recog.cpp:198-212) is a plain sublane reduction, and the lane
  vector of exported scores IS the next frame's biphone score row.
* Observations use the tied-pdf tables (each (center, state) touches
  <= K distinct pdfs): the (T, 3K, P) table of distinct-pdf scores is
  gathered once in XLA, broadcast to lanes with a one-hot matmul, and
  expanded with a K-step select loop -- no in-kernel gathers.
* Every cross-lane rearrangement (biphone row -> entry matrix, end-
  biphone extraction, lane broadcast) is a one-hot f32 matmul at
  ``Precision.HIGHEST``, which is bit-exact (exactly one nonzero term
  per output), so scores match the XLA path and the native decoder
  float-for-float.
* Kaldi ties transition probs to the pdf (one transition-state per
  (phone, hmm-state, pdf)), so the per-class self/forward log-probs are
  selected into VMEM once per utterance, not per frame; images whose
  transitions break this tying raise ``UnsupportedImage`` and fall back
  to the XLA path.

Outputs are the same packed backpointers (``tri * TIME_PACK +
entry_time + 1``) and per-frame end-biphone scores the XLA path
produces; the on-device backtrace in ``viterbi.py`` consumes both
unchanged.
"""

from __future__ import annotations

from functools import partial
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


class PallasCubeViterbi:
    """Forward token passing for dense full-context cube images.

    Built from an ``HmmImage`` whose triphones form the full P^3 cube
    (``cube_order`` as detected by ``ViterbiDecoder._detect_cube_order``:
    'bac' for the graph builder's ``idx = b*P^2 + a*P + c``, 'abc' for
    the synthetic builder).  ``forward(lp)`` maps a padded posterior
    batch (U, T, S) to packed backpointers (U, T, B) int32 and end
    scores (U, T, P) float32.
    """

    def __init__(self, image, cube_order: str, pip: float, lmw: float,
                 chunk: int = 8, interpret: bool = False):
        P = image.num_phones
        B = image.num_biphones
        if image.num_triphones != P ** 3 or B != P * P:
            raise UnsupportedImage("not a dense cube image")
        if image.num_triphones * TIME_PACK >= 2 ** 31:
            raise UnsupportedImage("triphone count too large to pack")
        self.P, self.B, self.S = P, B, image.num_states
        self.chunk = chunk
        self.interpret = interpret

        # --- cube views in (left, center, right) order ----------------
        def to_lcr(arr3):
            cube = arr3.reshape((P, P, P) + arr3.shape[1:])
            if cube_order == "bac":               # (center, left, right)
                cube = cube.transpose((1, 0, 2) + tuple(
                    range(3, cube.ndim)))
            return cube

        pdf = to_lcr(image.state_idxs)            # (l, c, r, 3)
        tps = to_lcr(image.tp_selfloop)
        tpt = to_lcr(image.tp_transition)

        # --- tied-pdf tables per (center, state) -----------------------
        k_max = 0
        per = {}
        for b in range(P):
            for s in range(3):
                # pdf over the (left, right) plane for this center/state
                plane = pdf[:, b, :, s]
                distinct, inverse = np.unique(plane, return_inverse=True)
                per[(b, s)] = (distinct, inverse.reshape(P, P))
                k_max = max(k_max, len(distinct))
        K = k_max
        bits = max(1, int(K - 1).bit_length()) if K > 1 else 1
        if 3 * bits > 31:
            raise UnsupportedImage("too many pdf classes to pack")
        self.K, self._bits = K, bits

        table = np.zeros((P, 3, K), dtype=np.int32)
        sel = np.zeros((3, P, B), dtype=np.int32)   # (s, left, c*P+r)
        tpv = np.zeros((6, K, P), dtype=np.float32)  # [self*3, trans*3]
        for (b, s), (distinct, inverse) in per.items():
            table[b, s, :len(distinct)] = distinct
            sel[s, :, b * P:(b + 1) * P] = inverse
            # transition tying check: constant per pdf class
            for which, cube_tp in ((0, tps), (1, tpt)):
                plane = cube_tp[:, b, :, s]
                sums = np.zeros(len(distinct), np.float64)
                np.add.at(sums, inverse.reshape(-1), plane.reshape(-1))
                counts = np.bincount(inverse.reshape(-1),
                                     minlength=len(distinct))
                means = (sums / counts).astype(np.float32)
                if not np.all(plane == means[inverse]):
                    raise UnsupportedImage(
                        "transition probs not tied to pdf classes")
                tpv[which * 3 + s, :len(distinct), b] = means

        self._sel_packed = jnp.asarray(
            sel[0] | (sel[1] << bits) | (sel[2] << (2 * bits)))
        self._tpv = jnp.asarray(tpv.reshape(6 * K, P))
        # rows [s*K + k] of the per-frame value table, columns = center
        self._table_flat = jnp.asarray(
            table.transpose(1, 2, 0).reshape(-1))   # (3*K*P,) pdf ids

        # --- one-hot rearrangement matrices ----------------------------
        E = np.zeros((P, B), np.float32)            # E[x, x*P+y] = 1
        F = np.zeros((B, P), np.float32)            # F[x*P+y, y] = 1
        for x in range(P):
            E[x, x * P:(x + 1) * P] = 1.0
        F[np.arange(B), np.arange(B) % P] = 1.0
        E_end = np.zeros((B, P), np.float32)
        E_end[np.asarray(image.end_idxs), np.arange(P)] = 1.0
        self._E, self._F, self._E_end = map(jnp.asarray, (E, F, E_end))

        # --- rows: LM, initial biphone scores, triphone id bases --------
        lm = image.lm.astype(np.float32) * np.float32(lmw)
        p0 = np.full(B, NEG_INF, dtype=np.float32)
        p0[image.start_idxs] = (lm[image.start_idxs]
                                - np.log(np.float32(P)))
        self._lm = jnp.asarray(lm[None, :])
        self._p0 = jnp.asarray(p0[None, :])
        lane = np.arange(B, dtype=np.int32)
        if cube_order == "abc":                     # tri = a*P^2 + lane
            self._a_coef = P * P
            tri_base = lane
        else:                                       # tri = b*P^2+a*P+c
            self._a_coef = P
            tri_base = (lane // P) * (P * P) + lane % P
        self._tri_base = jnp.asarray(tri_base[None, :])
        self._pip = float(pip)
        self._fwd = jax.jit(self._forward_impl)

    # ------------------------------------------------------------------
    def _kernel(self, lens_ref, vals_ref, selp_ref, tpv_ref, e_ref, f_ref,
                eend_ref, lm_ref, p0_ref, tbase_ref,
                packed_ref, end_ref, pp_ref, tt_ref, pc_ref, tps_ref):
        P, B, K, bits = self.P, self.B, self.K, self._bits
        chunk = self.chunk
        mask = (1 << bits) - 1
        pip = jnp.float32(self._pip)
        u = pl.program_id(0)
        ch = pl.program_id(1)

        def sel_s(s):
            return (selp_ref[:] >> (bits * s)) & mask

        @pl.when(ch == 0)
        def _init():
            pp_ref[:] = jnp.full((3, P, B), NEG_INF, jnp.float32)
            tt_ref[:] = jnp.zeros((3, P, B), jnp.int32)
            pc_ref[:] = p0_ref[:]
            # per-class transition log-probs -> dense VMEM planes, once
            tpv_bc = _dot(tpv_ref[:], e_ref[:])          # (6K, B)
            for g in range(6):
                sg = sel_s(g % 3)
                acc = jnp.zeros((P, B), jnp.float32)
                for k in range(K):
                    row = tpv_bc[g * K + k:g * K + k + 1, :]
                    acc = acc + jnp.where(sg == k, row, 0.0)
                tps_ref[g] = acc

        s0, s1, s2 = sel_s(0), sel_s(1), sel_s(2)
        aidx = jax.lax.broadcasted_iota(jnp.int32, (P, B), 0)

        def frame(i, _):
            k_glob = ch * chunk + i
            vt = vals_ref[0, i]                          # (3K, P)
            vbc = _dot(vt, e_ref[:])                     # (3K, B)

            def obs(s, sg):
                acc = jnp.zeros((P, B), jnp.float32)
                for k in range(K):
                    row = vbc[s * K + k:s * K + k + 1, :]
                    acc = acc + jnp.where(sg == k, row, 0.0)
                return acc

            # entry scores: p_in[a, b*P+c] = p[a*P+b] + pip
            prow = pc_ref[:]                             # (1, B)
            pmat = _dot(e_ref[:] * prow, f_ref[:])       # (P, P)
            p_in = _dot(pmat, e_ref[:]) + pip            # (P, B)

            old0, old1, old2 = pp_ref[0], pp_ref[1], pp_ref[2]
            t0o, t1o, t2o = tt_ref[0], tt_ref[1], tt_ref[2]

            # states updated from pre-frame snapshots (C++ :167-190)
            go2 = old1 + tps_ref[4]
            stay2 = old2 + tps_ref[2]
            take2 = go2 > stay2
            pp2 = jnp.where(take2, go2, stay2) + obs(2, s2)
            tt2 = jnp.where(take2, t1o, t2o)

            go1 = old0 + tps_ref[3]
            stay1 = old1 + tps_ref[1]
            take1 = go1 > stay1
            pp1 = jnp.where(take1, go1, stay1) + obs(1, s1)
            tt1 = jnp.where(take1, t0o, t1o)

            stay0 = old0 + tps_ref[0]
            take0 = p_in > stay0
            pp0 = jnp.where(take0, p_in, stay0) + obs(0, s0)
            tt0 = jnp.where(take0,
                            jnp.full((P, B), k_glob - 1, jnp.int32), t0o)

            pp_ref[0], pp_ref[1], pp_ref[2] = pp0, pp1, pp2
            tt_ref[0], tt_ref[1], tt_ref[2] = tt0, tt1, tt2

            # per-biphone export: max over the left-context sublanes
            out_score = pp2 + tps_ref[5]                 # (P, B)
            mx = jnp.max(out_score, axis=0, keepdims=True)
            arg = jnp.min(jnp.where(out_score == mx, aidx, P),
                          axis=0, keepdims=True)         # first max
            bt = jnp.sum(jnp.where(aidx == arg, tt2, 0),
                         axis=0, keepdims=True)           # (1, B)
            tri = arg * self._a_coef + tbase_ref[:]
            packed_ref[0, pl.ds(i, 1), :] = tri * TIME_PACK + bt + 1
            pnew = mx + lm_ref[:]
            pc_ref[:] = pnew
            end_ref[0, pl.ds(i, 1), :] = _dot(pnew, eend_ref[:])
            return 0

        # skip chunks entirely past this utterance's last frame: the
        # backtrace never reads packed/end rows at t >= length, so the
        # ~20-30% of bucket-padding frames cost nothing
        @pl.when(ch * chunk < lens_ref[u])
        def _run():
            jax.lax.fori_loop(0, chunk, frame, 0)

    # ------------------------------------------------------------------
    def _forward_impl(self, lp: jax.Array, lengths: jax.Array
                      ) -> Tuple[jax.Array, jax.Array]:
        P, B, K, chunk = self.P, self.B, self.K, self.chunk
        U, T, S = lp.shape
        Tp = -(-T // chunk) * chunk
        if Tp != T:
            lp = jnp.pad(lp, ((0, 0), (0, Tp - T), (0, 0)))
        # distinct-pdf score table per frame, gathered in XLA
        vals = jnp.take(lp, self._table_flat, axis=2,
                        indices_are_sorted=False, unique_indices=False)
        vals = vals.reshape(U, Tp, 3 * K, P)

        const = lambda u, c, lens: (0, 0)
        packed, end = pl.pallas_call(
            self._kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(U, Tp // chunk),
                in_specs=[
                    pl.BlockSpec((1, chunk, 3 * K, P),
                                 lambda u, c, lens: (u, c, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((P, B), const, memory_space=pltpu.VMEM),
                    pl.BlockSpec((6 * K, P), const, memory_space=pltpu.VMEM),
                    pl.BlockSpec((P, B), const, memory_space=pltpu.VMEM),
                    pl.BlockSpec((B, P), const, memory_space=pltpu.VMEM),
                    pl.BlockSpec((B, P), const, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, B), const, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, B), const, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, B), const, memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((1, chunk, B), lambda u, c, lens: (u, c, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, chunk, P), lambda u, c, lens: (u, c, 0),
                                 memory_space=pltpu.VMEM),
                ],
                scratch_shapes=[
                    pltpu.VMEM((3, P, B), jnp.float32),   # pp
                    pltpu.VMEM((3, P, B), jnp.int32),     # tt
                    pltpu.VMEM((1, B), jnp.float32),      # biphone scores
                    pltpu.VMEM((6, P, B), jnp.float32),   # tied transitions
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((U, Tp, B), jnp.int32),
                jax.ShapeDtypeStruct((U, Tp, P), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=self.interpret,
        )(jnp.asarray(lengths, jnp.int32), vals, self._sel_packed,
          self._tpv, self._E, self._F, self._E_end, self._lm, self._p0,
          self._tri_base)
        return packed[:, :T], end[:, :T]

    def forward(self, lp: jax.Array, lengths=None
                ) -> Tuple[jax.Array, jax.Array]:
        """(U, T, S) log-posteriors -> packed bptrs (U, T, B) int32 and
        end-biphone scores (U, T, P) float32, identical to the XLA
        path's per-frame scan outputs for every frame t < lengths[u]
        (rows at or past an utterance's length are skipped — the
        backtrace never reads them). ``lengths`` defaults to T."""
        if lengths is None:
            lengths = jnp.full((lp.shape[0],), lp.shape[1], jnp.int32)
        return self._fwd(lp, jnp.asarray(lengths, jnp.int32))
