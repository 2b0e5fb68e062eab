"""Weight-resident Pallas LSTM sequence scan.

Why: the XLA ``lax.scan`` LSTM spends most of each step streaming the
recurrent gate matrix from HBM — per step it re-reads W_h (H, 4H)
(bf16: 8 MB at H=1024) to compute a (B, H) @ (H, 4H) matmul whose
arithmetic intensity sits below the MXU roofline, so the scan is
weight-bandwidth-bound (see BASELINE.md roofline). This kernel keeps
W_h resident in VMEM across ALL timesteps and streams only the
per-step tensors:

    HBM traffic/step:  x_proj (B, 4H) in + h (B, H) out   (~1.25 MB)
    vs the scan's      W_h (H, 4H)                          (~8 MB)

The grid walks time blocks; Mosaic's pipeline double-buffers the
x_proj blocks while the in-kernel ``fori_loop`` runs the recurrence:

    z = x_proj[t] + h @ W_h          (MXU, bf16 inputs, f32 accum)
    a, i, f, o = tanh/sigmoid(split z)   (VPU, f32)
    c = f*c + i*a;  h = o*tanh(c)        (VPU, f32 carry in VMEM scratch)

Numerics: matmul operands are bf16 with float32 accumulation — the
same one-pass-bf16 the TPU MXU uses for DEFAULT-precision float32
matmuls — and the carry/gates stay float32, matching the engine's
mixed-precision recipe (engine.py `_mixed_apply`). Gate order/equations
are cells.lstm_step's (Chainer L.LSTM twin: a,i,f,o).

Used by the runners behind networks.py `scan_impl="pallas"` and
bench.py. Training goes through the custom-VJP variants below
(`lstm_scan_pallas_train`, `gated_scan_pallas_train`): the reverse-time
backward kernels keep W^T and the f32 dW accumulators VMEM-resident —
the XLA autodiff scan re-streams W, W^T AND the (H, 4H) dW accumulator
from HBM every timestep (~50 MB/step/layer at H=1024), which is what
makes TBPTT weight-bandwidth-bound (measured: LSTM 4x1024 TBPTT step
15.9 -> 8.9 ms f32 on v5e).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def lstm_scan_pallas(proj, wh, c0, h0, *, time_block: int = 8,
                     vmem_limit_bytes: int = 64 * 1024 * 1024,
                     batch_split: bool = False,
                     interpret: bool | None = None):
    """Run a full LSTM recurrence over a precomputed input projection.

    proj: (T, B, 4H) — x @ W_x + b for every timestep (any float dtype)
    wh:   (H, 4H) recurrent gate matrix
    c0/h0: (B, H) initial state (float32)

    Returns ``(c_T, h_T), hs`` with hs (T, B, H) in ``proj.dtype`` —
    the same contract as ``lax.scan`` over ``cells.lstm_step``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    t, b, g = proj.shape
    carry_dtype = c0.dtype
    h_dim = wh.shape[0]
    if g != 4 * h_dim:
        raise ValueError(f"proj gate dim {g} != 4*{h_dim}")
    out_dtype = proj.dtype
    tb = max(1, min(time_block, t))
    tp = _cdiv(t, tb) * tb
    if tp != t:
        proj = jnp.pad(proj, ((0, tp - t), (0, 0), (0, 0)))
    proj = proj.astype(jnp.bfloat16)
    wh = wh.astype(jnp.bfloat16)
    c0 = c0.astype(jnp.float32)
    h0 = h0.astype(jnp.float32)

    def _gates(z, c_prev):
        a = jnp.tanh(z[:, :h_dim])
        ig = jax.nn.sigmoid(z[:, h_dim:2 * h_dim])
        f = jax.nn.sigmoid(z[:, 2 * h_dim:3 * h_dim])
        o = jax.nn.sigmoid(z[:, 3 * h_dim:])
        c = f * c_prev + ig * a
        h = o * jnp.tanh(c)
        return c, h

    def kernel(proj_ref, wh_ref, c0_ref, h0_ref,
               hs_ref, ct_ref, ht_ref, c_scr, h_scr):
        @pl.when(pl.program_id(0) == 0)
        def _():
            c_scr[:] = c0_ref[:]
            h_scr[:] = h0_ref[:]

        base = pl.program_id(0) * tb

        def step(i, _):
            z = proj_ref[i].astype(jnp.float32) + jnp.dot(
                h_scr[:].astype(jnp.bfloat16), wh_ref[:],
                preferred_element_type=jnp.float32)
            c, h = _gates(z, c_scr[:])
            # time-padded tail steps must not advance the state (the
            # returned final carry is the step-T state, lax.scan-like)
            live = base + i < t
            c_scr[:] = jnp.where(live, c, c_scr[:])
            h_scr[:] = jnp.where(live, h, h_scr[:])
            hs_ref[i] = h.astype(hs_ref.dtype)
            return 0

        jax.lax.fori_loop(0, tb, step, 0)
        ct_ref[:] = c_scr[:]
        ht_ref[:] = h_scr[:]

    def kernel_split(proj_ref, wh_ref, c0_ref, h0_ref,
                     hs_ref, ct_ref, ht_ref, c_scr, h_scr):
        # Two independent batch halves whose per-step work is issued
        # interleaved: the MXU matmul of half B has no data dependence
        # on the VPU gate math of half A for the same step, so the
        # scheduler can overlap them — the serial chain per half is
        # matmul -> gates -> next matmul, and the two chains share the
        # hardware in counter-phase (MXU on one while VPU on the other).
        bh = b // 2
        @pl.when(pl.program_id(0) == 0)
        def _():
            c_scr[:] = c0_ref[:]
            h_scr[:] = h0_ref[:]

        base = pl.program_id(0) * tb

        def step(i, _):
            za = proj_ref[i, :bh].astype(jnp.float32) + jnp.dot(
                h_scr[:bh].astype(jnp.bfloat16), wh_ref[:],
                preferred_element_type=jnp.float32)
            zb = proj_ref[i, bh:].astype(jnp.float32) + jnp.dot(
                h_scr[bh:].astype(jnp.bfloat16), wh_ref[:],
                preferred_element_type=jnp.float32)
            ca, ha = _gates(za, c_scr[:bh])
            cb, hb = _gates(zb, c_scr[bh:])
            live = base + i < t
            c_scr[:bh] = jnp.where(live, ca, c_scr[:bh])
            h_scr[:bh] = jnp.where(live, ha, h_scr[:bh])
            c_scr[bh:] = jnp.where(live, cb, c_scr[bh:])
            h_scr[bh:] = jnp.where(live, hb, h_scr[bh:])
            hs_ref[i, :bh] = ha.astype(hs_ref.dtype)
            hs_ref[i, bh:] = hb.astype(hs_ref.dtype)
            return 0

        jax.lax.fori_loop(0, tb, step, 0)
        ct_ref[:] = c_scr[:]
        ht_ref[:] = h_scr[:]

    const = lambda i: (0, 0)
    body = kernel_split if (batch_split and b % 2 == 0) else kernel
    hs, c_t, h_t = pl.pallas_call(
        body,
        grid=(tp // tb,),
        in_specs=[
            pl.BlockSpec((tb, b, g), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, g), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h_dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h_dim), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, b, h_dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h_dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h_dim), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, b, h_dim), out_dtype),
            jax.ShapeDtypeStruct((b, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((b, h_dim), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h_dim), jnp.float32),
            pltpu.VMEM((b, h_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # W_h alone is 8 MB (bf16, H=1024); with double-buffered
            # proj/hs blocks the footprint tops the 16 MB default
            # scoped-vmem budget, so ask Mosaic for headroom.
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        interpret=interpret,
    )(proj, wh, c0, h0)
    # carry keeps the caller's dtype so jit loops that thread state
    # (TBPTT streams) see an unchanged structure
    return (c_t.astype(carry_dtype), h_t.astype(carry_dtype)), hs[:t]


def gated_scan_pallas(proj, w1, w2, h0, *, kind, activation=jnp.tanh,
                      time_block: int = 8,
                      vmem_limit_bytes: int = 64 * 1024 * 1024,
                      interpret: bool | None = None):
    """Weight-resident GRU / minimal-GRU sequence scan.

    Same recipe as ``lstm_scan_pallas``: the recurrent matrices stay in
    VMEM across ALL timesteps; only the hoisted input projection blocks
    stream in and the hiddens stream out. Matmul operands are bf16 with
    f32 accumulation; gates and the h carry stay f32.

    kind selects the gate wiring (cells.py twins of
    chainer_networks.py:123-141 and MGRU.py:67-85):

    * ``"gru"``    — proj (T, B, 3H) packs [r, z, cand]; ``w1`` is
      wh_rz (H, 2H), ``w2`` is wh_c (H, H) applied to r*h.
    * ``"mgru_r"`` — proj packs [z, cand, r]; ``w1`` = [u_z | u_r]
      (H, 2H), ``w2`` = u applied to r*h.
    * ``"mgru"``   — proj (T, B, 2H) packs [z, cand]; ``w1`` =
      [u_z | u] (H, 2H), no ``w2``.

    All kinds share h' = z*h_bar + (1-z)*h (Chainer
    ``linear_interpolate``; note z gates the CANDIDATE). First-step
    ``fresh``/"bu" semantics are handled by the callers (networks.py)
    as a proj-side pre-add, so the kernel sees plain recurrences.

    Returns ``(h_T, hs)`` with hs (T, B, H) in ``proj.dtype``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if kind not in ("gru", "mgru_r", "mgru"):
        raise ValueError(f"unknown kind {kind!r}")

    t, b, g = proj.shape
    carry_dtype = h0.dtype
    h_dim = w1.shape[0]
    gp = {"gru": 3, "mgru_r": 3, "mgru": 2}[kind]
    if g != gp * h_dim:
        raise ValueError(f"proj gate dim {g} != {gp}*{h_dim}")
    out_dtype = proj.dtype
    tb = max(1, min(time_block, t))
    tp = _cdiv(t, tb) * tb
    if tp != t:
        proj = jnp.pad(proj, ((0, tp - t), (0, 0), (0, 0)))
    proj = proj.astype(jnp.bfloat16)
    w1 = w1.astype(jnp.bfloat16)
    has_w2 = w2 is not None
    w2 = w2.astype(jnp.bfloat16) if has_w2 else jnp.zeros((1, 1), jnp.bfloat16)
    h0 = h0.astype(jnp.float32)

    def _step_math(p, m1, h, mm2):
        """p: (B, gp*H) f32 proj row; m1: (B, 2H) f32 first matmul;
        mm2(x) -> x @ w2 f32."""
        if kind == "gru":
            r = jax.nn.sigmoid(p[:, :h_dim] + m1[:, :h_dim])
            z = jax.nn.sigmoid(p[:, h_dim:2 * h_dim] + m1[:, h_dim:])
            hb = jnp.tanh(p[:, 2 * h_dim:] + mm2(r * h))
        elif kind == "mgru_r":
            z = jax.nn.sigmoid(p[:, :h_dim] + m1[:, :h_dim])
            r = jax.nn.sigmoid(p[:, 2 * h_dim:] + m1[:, h_dim:])
            hb = activation(p[:, h_dim:2 * h_dim] + mm2(r * h))
        else:                                  # mgru, no reset gate
            z = jax.nn.sigmoid(p[:, :h_dim] + m1[:, :h_dim])
            hb = activation(p[:, h_dim:2 * h_dim] + m1[:, h_dim:])
        return z * hb + (1.0 - z) * h

    def kernel(proj_ref, w1_ref, w2_ref, h0_ref, hs_ref, ht_ref, h_scr):
        @pl.when(pl.program_id(0) == 0)
        def _():
            h_scr[:] = h0_ref[:]

        base = pl.program_id(0) * tb

        def mm2(x):
            return jnp.dot(x.astype(jnp.bfloat16), w2_ref[:],
                           preferred_element_type=jnp.float32)

        def step(i, _):
            h = h_scr[:]
            m1 = jnp.dot(h.astype(jnp.bfloat16), w1_ref[:],
                         preferred_element_type=jnp.float32)
            h_new = _step_math(proj_ref[i].astype(jnp.float32), m1, h, mm2)
            live = base + i < t
            h_scr[:] = jnp.where(live, h_new, h)
            hs_ref[i] = h_new.astype(hs_ref.dtype)
            return 0

        jax.lax.fori_loop(0, tb, step, 0)
        ht_ref[:] = h_scr[:]

    const = lambda i: (0, 0)
    hs, h_t = pl.pallas_call(
        kernel,
        grid=(tp // tb,),
        in_specs=[
            pl.BlockSpec((tb, b, g), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h_dim), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, b, h_dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h_dim), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, b, h_dim), out_dtype),
            jax.ShapeDtypeStruct((b, h_dim), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b, h_dim), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        interpret=interpret,
    )(proj, w1, w2, h0)
    return h_t.astype(carry_dtype), hs[:t]


def gated_scan_mixed_reference(proj, w1, w2, h0, *, kind,
                               activation=jnp.tanh):
    """lax.scan twin of ``gated_scan_pallas`` with the kernel's exact
    precision contract, for equivalence tests."""
    proj = proj.astype(jnp.bfloat16)
    w1 = w1.astype(jnp.bfloat16)
    w2b = w2.astype(jnp.bfloat16) if w2 is not None else None
    h_dim = w1.shape[0]

    def step(h, p):
        p = p.astype(jnp.float32)
        m1 = jnp.dot(h.astype(jnp.bfloat16), w1,
                     preferred_element_type=jnp.float32)

        def mm2(x):
            return jnp.dot(x.astype(jnp.bfloat16), w2b,
                           preferred_element_type=jnp.float32)

        if kind == "gru":
            r = jax.nn.sigmoid(p[:, :h_dim] + m1[:, :h_dim])
            z = jax.nn.sigmoid(p[:, h_dim:2 * h_dim] + m1[:, h_dim:])
            hb = jnp.tanh(p[:, 2 * h_dim:] + mm2(r * h))
        elif kind == "mgru_r":
            z = jax.nn.sigmoid(p[:, :h_dim] + m1[:, :h_dim])
            r = jax.nn.sigmoid(p[:, 2 * h_dim:] + m1[:, h_dim:])
            hb = activation(p[:, h_dim:2 * h_dim] + mm2(r * h))
        else:
            z = jax.nn.sigmoid(p[:, :h_dim] + m1[:, :h_dim])
            hb = activation(p[:, h_dim:2 * h_dim] + m1[:, h_dim:])
        h_new = z * hb + (1.0 - z) * h
        return h_new, h_new.astype(proj.dtype)

    h_t, hs = jax.lax.scan(step, h0.astype(jnp.float32), proj)
    return h_t, hs


def lstm_scan_mixed_reference(proj, wh, c0, h0):
    """jnp reference with the kernel's exact precision contract (bf16
    matmul operands, f32 accumulation/carry) for equivalence tests."""
    proj = proj.astype(jnp.bfloat16)
    wh = wh.astype(jnp.bfloat16)
    h_dim = wh.shape[0]

    def step(carry, x_proj):
        c, h = carry
        z = x_proj.astype(jnp.float32) + jnp.dot(
            h.astype(jnp.bfloat16), wh, preferred_element_type=jnp.float32)
        a = jnp.tanh(z[:, :h_dim])
        ig = jax.nn.sigmoid(z[:, h_dim:2 * h_dim])
        f = jax.nn.sigmoid(z[:, 2 * h_dim:3 * h_dim])
        o = jax.nn.sigmoid(z[:, 3 * h_dim:])
        c_new = f * c + ig * a
        h_new = o * jnp.tanh(c_new)
        return (c_new, h_new), h_new.astype(proj.dtype)

    (c_t, h_t), hs = jax.lax.scan(
        step, (c0.astype(jnp.float32), h0.astype(jnp.float32)), proj)
    return (c_t, h_t), hs


# ---------------------------------------------------------------------------
# trainable weight-resident scan (custom VJP)
# ---------------------------------------------------------------------------

def _lstm_train_fwd_impl(proj, wh, c0, h0, *, time_block=8,
                         vmem_limit_bytes=100 * 1024 * 1024,
                         interpret=None):
    """Forward pass that also streams out the per-step residuals the
    backward kernel needs: [a | i | f | o | tanh(c_t) | c_{t-1} | h_{t-1}]
    packed as one (T, B, 7H) bf16 row per step."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t, b, g = proj.shape
    h_dim = wh.shape[0]
    out_dtype = proj.dtype
    tb = max(1, min(time_block, t))
    tp = _cdiv(t, tb) * tb
    if tp != t:
        proj = jnp.pad(proj, ((0, tp - t), (0, 0), (0, 0)))
    projb = proj.astype(jnp.bfloat16)
    whb = wh.astype(jnp.bfloat16)
    c0f = c0.astype(jnp.float32)
    h0f = h0.astype(jnp.float32)
    H = h_dim

    def kernel(proj_ref, wh_ref, c0_ref, h0_ref,
               hs_ref, res_ref, ct_ref, ht_ref, c_scr, h_scr):
        @pl.when(pl.program_id(0) == 0)
        def _():
            c_scr[:] = c0_ref[:]
            h_scr[:] = h0_ref[:]

        base = pl.program_id(0) * tb

        def step(i, _):
            c_prev = c_scr[:]
            h_prev = h_scr[:]
            z = proj_ref[i].astype(jnp.float32) + jnp.dot(
                h_prev.astype(jnp.bfloat16), wh_ref[:],
                preferred_element_type=jnp.float32)
            a = jnp.tanh(z[:, :H])
            ig = jax.nn.sigmoid(z[:, H:2 * H])
            f = jax.nn.sigmoid(z[:, 2 * H:3 * H])
            o = jax.nn.sigmoid(z[:, 3 * H:])
            c = f * c_prev + ig * a
            tc = jnp.tanh(c)
            h = o * tc
            live = base + i < t
            c_scr[:] = jnp.where(live, c, c_prev)
            h_scr[:] = jnp.where(live, h, h_prev)
            hs_ref[i] = h.astype(hs_ref.dtype)
            res_ref[i, :, 0:H] = a.astype(jnp.bfloat16)
            res_ref[i, :, H:2 * H] = ig.astype(jnp.bfloat16)
            res_ref[i, :, 2 * H:3 * H] = f.astype(jnp.bfloat16)
            res_ref[i, :, 3 * H:4 * H] = o.astype(jnp.bfloat16)
            res_ref[i, :, 4 * H:5 * H] = tc.astype(jnp.bfloat16)
            res_ref[i, :, 5 * H:6 * H] = c_prev.astype(jnp.bfloat16)
            res_ref[i, :, 6 * H:7 * H] = h_prev.astype(jnp.bfloat16)
            return 0

        jax.lax.fori_loop(0, tb, step, 0)
        ct_ref[:] = c_scr[:]
        ht_ref[:] = h_scr[:]

    const = lambda i: (0, 0)
    hs, res, c_t, h_t = pl.pallas_call(
        kernel,
        grid=(tp // tb,),
        in_specs=[
            pl.BlockSpec((tb, b, g), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, g), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h_dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h_dim), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, b, h_dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, b, 7 * h_dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h_dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h_dim), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, b, h_dim), out_dtype),
            jax.ShapeDtypeStruct((tp, b, 7 * h_dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((b, h_dim), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h_dim), jnp.float32),
            pltpu.VMEM((b, h_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        interpret=interpret,
    )(projb, whb, c0f, h0f)
    return hs[:t], res, c_t, h_t


def _lstm_train_bwd_impl(res, whT, dhs, dct, dht, t, proj_dtype, wh_dtype,
                         *, time_block=4,
                         vmem_limit_bytes=100 * 1024 * 1024,
                         interpret=None):
    # time_block 4 (not the forward's 8): the backward holds the res
    # block, the f32 dproj block, the dz scratch AND the (H, 4H) f32 dW
    # accumulator at once — tb=8 tops the scoped-vmem budget at H=1024
    """Reverse-time backward kernel. Keeps W_h^T AND the (H, 4H) f32
    dW accumulator VMEM-resident for the whole sequence — the XLA
    backward re-streams both from HBM every timestep, which is what
    makes TBPTT weight-bandwidth-bound. dW is accumulated per time
    block as ONE (tb*B, H)^T (tb*B, 4H) MXU contraction."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tp, b, seven_h = res.shape
    H = seven_h // 7
    g = 4 * H
    tb = max(1, min(time_block, tp))
    # the forward pads to a multiple of ITS time_block (min(8, T)), which
    # need not be a multiple of this kernel's tb — pad up to nb*tb so the
    # grid covers every timestep (live-masking zeroes the padded rows)
    nb = _cdiv(tp, tb)
    tp = nb * tb
    if res.shape[0] != tp:
        res = jnp.pad(res, ((0, tp - res.shape[0]), (0, 0), (0, 0)))
    if dhs.shape[0] != tp:
        dhs = jnp.pad(dhs, ((0, tp - dhs.shape[0]), (0, 0), (0, 0)))
    dhs = dhs.astype(jnp.float32)
    dct = dct.astype(jnp.float32)
    dht = dht.astype(jnp.float32)

    def kernel(res_ref, dhs_ref, whT_ref, dct_ref, dht_ref,
               dproj_ref, dwh_ref, dc0_ref, dh0_ref,
               dc_scr, dh_scr, dw_scr, dz_scr):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dc_scr[:] = dct_ref[:]
            dh_scr[:] = dht_ref[:]
            dw_scr[:] = jnp.zeros((H, g), jnp.float32)

        base = (nb - 1 - i) * tb

        def step(j, _):
            idx = tb - 1 - j
            live = base + idx < t
            a = res_ref[idx, :, 0:H].astype(jnp.float32)
            ig = res_ref[idx, :, H:2 * H].astype(jnp.float32)
            f = res_ref[idx, :, 2 * H:3 * H].astype(jnp.float32)
            o = res_ref[idx, :, 3 * H:4 * H].astype(jnp.float32)
            tc = res_ref[idx, :, 4 * H:5 * H].astype(jnp.float32)
            c_prev = res_ref[idx, :, 5 * H:6 * H].astype(jnp.float32)

            dh_tot = dhs_ref[idx] + dh_scr[:]
            do = dh_tot * tc
            dc = dc_scr[:] + dh_tot * o * (1.0 - tc * tc)
            da = dc * ig
            dig = dc * a
            df = dc * c_prev
            dc_prev = dc * f
            dz_a = da * (1.0 - a * a)
            dz_i = dig * ig * (1.0 - ig)
            dz_f = df * f * (1.0 - f)
            dz_o = do * o * (1.0 - o)
            zero = jnp.zeros((b, H), jnp.float32)
            dz_a = jnp.where(live, dz_a, zero)
            dz_i = jnp.where(live, dz_i, zero)
            dz_f = jnp.where(live, dz_f, zero)
            dz_o = jnp.where(live, dz_o, zero)
            dproj_ref[idx, :, 0:H] = dz_a.astype(dproj_ref.dtype)
            dproj_ref[idx, :, H:2 * H] = dz_i.astype(dproj_ref.dtype)
            dproj_ref[idx, :, 2 * H:3 * H] = dz_f.astype(dproj_ref.dtype)
            dproj_ref[idx, :, 3 * H:4 * H] = dz_o.astype(dproj_ref.dtype)
            dz_scr[idx, :, 0:H] = dz_a.astype(jnp.bfloat16)
            dz_scr[idx, :, H:2 * H] = dz_i.astype(jnp.bfloat16)
            dz_scr[idx, :, 2 * H:3 * H] = dz_f.astype(jnp.bfloat16)
            dz_scr[idx, :, 3 * H:4 * H] = dz_o.astype(jnp.bfloat16)
            dzb = dz_scr[idx]
            dh_prev = jnp.dot(dzb, whT_ref[:],
                              preferred_element_type=jnp.float32)
            dc_scr[:] = jnp.where(live, dc_prev, dc_scr[:])
            dh_scr[:] = jnp.where(live, dh_prev, dh_scr[:])
            return 0

        jax.lax.fori_loop(0, tb, step, 0)

        # block dW: contract the block's h_prev rows against dz rows
        h_prev_blk = res_ref[:, :, 6 * H:7 * H].reshape(tb * b, H)
        dz_blk = dz_scr[:].reshape(tb * b, g)
        dw_scr[:] = dw_scr[:] + jax.lax.dot_general(
            h_prev_blk, dz_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(i == nb - 1)
        def _():
            dwh_ref[:] = dw_scr[:].astype(dwh_ref.dtype)
            dc0_ref[:] = dc_scr[:]
            dh0_ref[:] = dh_scr[:]

    const = lambda i: (0, 0)
    rev = lambda i: (nb - 1 - i, 0, 0)
    dproj, dwh, dc0, dh0 = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((tb, b, seven_h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, b, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((g, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, H), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, b, g), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, g), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, H), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, b, g), proj_dtype),
            jax.ShapeDtypeStruct((H, g), wh_dtype),
            jax.ShapeDtypeStruct((b, H), jnp.float32),
            jax.ShapeDtypeStruct((b, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, H), jnp.float32),
            pltpu.VMEM((b, H), jnp.float32),
            pltpu.VMEM((H, g), jnp.float32),
            pltpu.VMEM((tb, b, g), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        interpret=interpret,
    )(res, dhs, whT, dct, dht)
    return dproj[:t], dwh, dc0, dh0


@jax.custom_vjp
def lstm_scan_pallas_train(proj, wh, c0, h0):
    """Differentiable weight-resident LSTM scan (training hot path).

    Forward math is exactly ``lstm_scan_pallas``'s (bf16 matmul
    operands, f32 accumulation/carry); the custom backward runs a
    reverse-time Pallas kernel that keeps W_h^T and the f32 dW
    accumulator VMEM-resident across all timesteps. The XLA autodiff
    scan instead re-streams W_h, W_h^T AND the (H, 4H) dW accumulator
    from HBM every timestep — at H=1024, B=128 that is ~50 MB/step
    against this kernel's ~5 MB/step of residual traffic.

    Residuals (gates, tanh c, carries) are stored bf16, so gradients
    carry bf16-level rounding relative to an f32-residual autodiff —
    the same order as the bf16 matmuls already in the mixed recipe.
    """
    (c_t, h_t), hs = _lstm_train_fwd(proj, wh, c0, h0)[0]
    return (c_t, h_t), hs


def _lstm_train_fwd(proj, wh, c0, h0):
    hs, res, c_t, h_t = _lstm_train_fwd_impl(proj, wh, c0, h0)
    carry_dtype = c0.dtype
    out = ((c_t.astype(carry_dtype), h_t.astype(carry_dtype)), hs)
    # residuals must be jax types: dtype witnesses as 0-size arrays,
    # t recovered from the hs cotangent's shape in the bwd rule
    saved = (res, wh, jnp.zeros((0,), proj.dtype))
    return out, saved


def _lstm_train_bwd(saved, cot):
    res, wh, proj_witness = saved
    (dct, dht), dhs = cot
    t = dhs.shape[0]
    whT = wh.astype(jnp.bfloat16).T
    dproj, dwh, dc0, dh0 = _lstm_train_bwd_impl(
        res, whT, dhs, dct, dht, t, proj_witness.dtype, wh.dtype)
    return (dproj, dwh, dc0.astype(dct.dtype), dh0.astype(dht.dtype))


lstm_scan_pallas_train.defvjp(_lstm_train_fwd, _lstm_train_bwd)


_ACTS = {"tanh": jnp.tanh, "relu": jax.nn.relu, "sigmoid": jax.nn.sigmoid}


def _act_grad(name, hb):
    """d activation / d preact expressed through the OUTPUT hb."""
    if name == "tanh":
        return 1.0 - hb * hb
    if name == "relu":
        return (hb > 0.0).astype(jnp.float32)
    if name == "sigmoid":
        return hb * (1.0 - hb)
    raise ValueError(name)


def _gated_train_fwd_impl(kind, act_name, proj, w1, w2, h0, *,
                          time_block=8,
                          vmem_limit_bytes=100 * 1024 * 1024,
                          interpret=None):
    """Gated forward with residual stream [r | z | hb | h_prev] bf16."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    activation = _ACTS[act_name]
    t, b, g = proj.shape
    h_dim = w1.shape[0]
    H = h_dim
    out_dtype = proj.dtype
    tb = max(1, min(time_block, t))
    tp = _cdiv(t, tb) * tb
    if tp != t:
        proj = jnp.pad(proj, ((0, tp - t), (0, 0), (0, 0)))
    projb = proj.astype(jnp.bfloat16)
    w1b = w1.astype(jnp.bfloat16)
    has_w2 = w2 is not None
    w2b = (w2.astype(jnp.bfloat16) if has_w2
           else jnp.zeros((1, 1), jnp.bfloat16))
    h0f = h0.astype(jnp.float32)

    def kernel(proj_ref, w1_ref, w2_ref, h0_ref,
               hs_ref, res_ref, ht_ref, h_scr):
        @pl.when(pl.program_id(0) == 0)
        def _():
            h_scr[:] = h0_ref[:]

        base = pl.program_id(0) * tb

        def mm2(x):
            return jnp.dot(x.astype(jnp.bfloat16), w2_ref[:],
                           preferred_element_type=jnp.float32)

        def step(i, _):
            h = h_scr[:]
            p = proj_ref[i].astype(jnp.float32)
            m1 = jnp.dot(h.astype(jnp.bfloat16), w1_ref[:],
                         preferred_element_type=jnp.float32)
            if kind == "gru":
                r = jax.nn.sigmoid(p[:, :H] + m1[:, :H])
                z = jax.nn.sigmoid(p[:, H:2 * H] + m1[:, H:])
                hb = jnp.tanh(p[:, 2 * H:] + mm2(r * h))
            elif kind == "mgru_r":
                z = jax.nn.sigmoid(p[:, :H] + m1[:, :H])
                r = jax.nn.sigmoid(p[:, 2 * H:] + m1[:, H:])
                hb = activation(p[:, H:2 * H] + mm2(r * h))
            else:
                z = jax.nn.sigmoid(p[:, :H] + m1[:, :H])
                r = jnp.zeros((b, H), jnp.float32)
                hb = activation(p[:, H:2 * H] + m1[:, H:])
            h_new = z * hb + (1.0 - z) * h
            live = base + i < t
            h_scr[:] = jnp.where(live, h_new, h)
            hs_ref[i] = h_new.astype(hs_ref.dtype)
            res_ref[i, :, 0:H] = r.astype(jnp.bfloat16)
            res_ref[i, :, H:2 * H] = z.astype(jnp.bfloat16)
            res_ref[i, :, 2 * H:3 * H] = hb.astype(jnp.bfloat16)
            res_ref[i, :, 3 * H:4 * H] = h.astype(jnp.bfloat16)
            return 0

        jax.lax.fori_loop(0, tb, step, 0)
        ht_ref[:] = h_scr[:]

    const = lambda i: (0, 0)
    hs, res, h_t = pl.pallas_call(
        kernel,
        grid=(tp // tb,),
        in_specs=[
            pl.BlockSpec((tb, b, g), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1b.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(w2b.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h_dim), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, b, h_dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, b, 4 * h_dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h_dim), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, b, h_dim), out_dtype),
            jax.ShapeDtypeStruct((tp, b, 4 * h_dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, h_dim), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b, h_dim), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        interpret=interpret,
    )(projb, w1b, w2b, h0f)
    return hs[:t], res, h_t


def _gated_train_bwd_impl(kind, act_name, res, w1T, w2T, dhs, dht, t,
                          gp, proj_dtype, w1_dtype, w2_dtype,
                          *, time_block=4,
                          vmem_limit_bytes=100 * 1024 * 1024,
                          interpret=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tp, b, four_h = res.shape
    H = four_h // 4
    g = gp * H
    tb = max(1, min(time_block, tp))
    # pad to a multiple of THIS kernel's tb (forward pads to min(8, T),
    # not necessarily divisible by 4 — e.g. T=5..7); see _lstm_train_bwd_impl
    nb = _cdiv(tp, tb)
    tp = nb * tb
    if res.shape[0] != tp:
        res = jnp.pad(res, ((0, tp - res.shape[0]), (0, 0), (0, 0)))
    if dhs.shape[0] != tp:
        dhs = jnp.pad(dhs, ((0, tp - dhs.shape[0]), (0, 0), (0, 0)))
    dhs = dhs.astype(jnp.float32)
    dht = dht.astype(jnp.float32)
    has_w2 = kind in ("gru", "mgru_r")

    def kernel(res_ref, dhs_ref, w1T_ref, w2T_ref, dht_ref,
               dproj_ref, dw1_ref, dw2_ref, dh0_ref,
               dh_scr, dw1_scr, dw2_scr, pair_scr, dc_scr, rh_scr):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dh_scr[:] = dht_ref[:]
            dw1_scr[:] = jnp.zeros((H, 2 * H), jnp.float32)
            dw2_scr[:] = jnp.zeros((H, H), jnp.float32)

        base = (nb - 1 - i) * tb

        def step(j, _):
            idx = tb - 1 - j
            live = base + idx < t
            r = res_ref[idx, :, 0:H].astype(jnp.float32)
            z = res_ref[idx, :, H:2 * H].astype(jnp.float32)
            hb = res_ref[idx, :, 2 * H:3 * H].astype(jnp.float32)
            h_prev = res_ref[idx, :, 3 * H:4 * H].astype(jnp.float32)

            dh_tot = dhs_ref[idx] + dh_scr[:]
            dz = dh_tot * (hb - h_prev)
            dhb = dh_tot * z
            dh_new = dh_tot * (1.0 - z)
            dzpre = dz * z * (1.0 - z)
            dcpre = dhb * _act_grad(
                "tanh" if kind == "gru" else act_name, hb)
            zero = jnp.zeros((b, H), jnp.float32)
            dzpre = jnp.where(live, dzpre, zero)
            dcpre = jnp.where(live, dcpre, zero)
            if has_w2:
                drh = jnp.dot(dcpre.astype(jnp.bfloat16), w2T_ref[:],
                              preferred_element_type=jnp.float32)
                dr = drh * h_prev
                dh_new = dh_new + drh * r
                drpre = dr * r * (1.0 - r)
                drpre = jnp.where(live, drpre, zero)
            else:
                drpre = zero
            # pair = the two w1-fed preact grads, in w1's column order
            if kind == "gru":            # w1 = wh_rz: [r | z]
                pa, pb_ = drpre, dzpre
            elif kind == "mgru_r":       # w1 = [u_z | u_r]
                pa, pb_ = dzpre, drpre
            else:                        # mgru: w1 = [u_z | u]
                pa, pb_ = dzpre, dcpre
            dh_new = dh_new + jnp.dot(
                jnp.concatenate([pa, pb_], axis=1).astype(jnp.bfloat16),
                w1T_ref[:], preferred_element_type=jnp.float32)
            dh_scr[:] = jnp.where(live, dh_new, dh_scr[:])

            # dproj in the proj packing order of this kind
            if kind == "gru":            # [r, z, cand]
                dproj_ref[idx, :, 0:H] = drpre.astype(dproj_ref.dtype)
                dproj_ref[idx, :, H:2 * H] = dzpre.astype(dproj_ref.dtype)
                dproj_ref[idx, :, 2 * H:3 * H] = dcpre.astype(
                    dproj_ref.dtype)
            elif kind == "mgru_r":       # [z, cand, r]
                dproj_ref[idx, :, 0:H] = dzpre.astype(dproj_ref.dtype)
                dproj_ref[idx, :, H:2 * H] = dcpre.astype(dproj_ref.dtype)
                dproj_ref[idx, :, 2 * H:3 * H] = drpre.astype(
                    dproj_ref.dtype)
            else:                        # [z, cand]
                dproj_ref[idx, :, 0:H] = dzpre.astype(dproj_ref.dtype)
                dproj_ref[idx, :, H:2 * H] = dcpre.astype(dproj_ref.dtype)

            pair_scr[idx, :, 0:H] = pa.astype(jnp.bfloat16)
            pair_scr[idx, :, H:2 * H] = pb_.astype(jnp.bfloat16)
            dc_scr[idx] = dcpre.astype(jnp.bfloat16)
            rh_scr[idx] = (r * h_prev).astype(jnp.bfloat16)
            return 0

        jax.lax.fori_loop(0, tb, step, 0)

        h_prev_blk = res_ref[:, :, 3 * H:4 * H].reshape(tb * b, H)
        dw1_scr[:] = dw1_scr[:] + jax.lax.dot_general(
            h_prev_blk, pair_scr[:].reshape(tb * b, 2 * H),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        if has_w2:
            dw2_scr[:] = dw2_scr[:] + jax.lax.dot_general(
                rh_scr[:].reshape(tb * b, H),
                dc_scr[:].reshape(tb * b, H),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(i == nb - 1)
        def _():
            dw1_ref[:] = dw1_scr[:].astype(dw1_ref.dtype)
            dw2_ref[:] = dw2_scr[:].astype(dw2_ref.dtype)
            dh0_ref[:] = dh_scr[:]

    const = lambda i: (0, 0)
    rev = lambda i: (nb - 1 - i, 0, 0)
    w2T_shape = w2T.shape
    dproj, dw1, dw2, dh0 = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((tb, b, four_h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, b, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * H, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(w2T_shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, H), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, b, g), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 2 * H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, H), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, b, g), proj_dtype),
            jax.ShapeDtypeStruct((H, 2 * H), w1_dtype),
            jax.ShapeDtypeStruct((H, H), w2_dtype),
            jax.ShapeDtypeStruct((b, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, H), jnp.float32),          # dh carry
            pltpu.VMEM((H, 2 * H), jnp.float32),      # dw1 acc
            pltpu.VMEM((H, H), jnp.float32),          # dw2 acc
            pltpu.VMEM((tb, b, 2 * H), jnp.bfloat16),  # pair rows
            pltpu.VMEM((tb, b, H), jnp.bfloat16),      # dcpre rows
            pltpu.VMEM((tb, b, H), jnp.bfloat16),      # r*h rows
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        interpret=interpret,
    )(res, dhs, w1T, w2T, dht)
    return dproj[:t], dw1, dw2, dh0


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _gated_train(kind, act_name, proj, w1, w2, h0):
    out, _ = _gated_train_fwd(kind, act_name, proj, w1, w2, h0)
    return out


def _gated_train_fwd(kind, act_name, proj, w1, w2, h0):
    hs, res, h_t = _gated_train_fwd_impl(kind, act_name, proj, w1, w2, h0)
    out = (h_t.astype(h0.dtype), hs)
    saved = (res, w1, w2, jnp.zeros((0,), proj.dtype))
    return out, saved


def _gated_train_bwd(kind, act_name, saved, cot):
    res, w1, w2, proj_witness = saved
    dht, dhs = cot
    t = dhs.shape[0]
    H = w1.shape[0]
    gp = {"gru": 3, "mgru_r": 3, "mgru": 2}[kind]
    w1T = w1.astype(jnp.bfloat16).T
    w2b = (w2 if w2 is not None else jnp.zeros((H, H), jnp.float32))
    w2T = w2b.astype(jnp.bfloat16).T
    dproj, dw1, dw2, dh0 = _gated_train_bwd_impl(
        kind, act_name, res, w1T, w2T, dhs, dht, t, gp,
        proj_witness.dtype, w1.dtype, w2b.dtype)
    return (dproj, dw1, dw2 if w2 is not None else None,
            dh0.astype(dht.dtype))


_gated_train.defvjp(_gated_train_fwd, _gated_train_bwd)


def gated_scan_pallas_train(proj, w1, w2, h0, *, kind, activation="tanh"):
    """Differentiable weight-resident GRU / minimal-GRU scan.

    Same forward math as ``gated_scan_pallas``; the custom backward is
    a reverse-time Pallas kernel with W1^T/W2^T and the f32 dW
    accumulators VMEM-resident (see ``lstm_scan_pallas_train``).
    ``activation`` is the candidate nonlinearity NAME ("tanh"/"relu"/
    "sigmoid" — mgru variants; gru always tanh)."""
    if kind not in ("gru", "mgru_r", "mgru"):
        raise ValueError(f"unknown kind {kind!r}")
    if kind == "mgru":
        return _gated_train(kind, activation, proj, w1, None, h0)
    return _gated_train(kind, activation, proj, w1, w2, h0)


def _peep_train_fwd_impl(proj, wh, pi, pf, po, c0, h0, *, time_block=8,
                         vmem_limit_bytes=100 * 1024 * 1024,
                         interpret=None):
    """Peephole forward streaming the backward's residuals:
    [a | i | f | o | tanh(c_t) | c_{t-1} | h_{t-1} | c_t] as one
    (T, B, 8H) bf16 row per step."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t, b, g = proj.shape
    H = wh.shape[0]
    out_dtype = proj.dtype
    tb = max(1, min(time_block, t))
    tp = _cdiv(t, tb) * tb
    if tp != t:
        proj = jnp.pad(proj, ((0, tp - t), (0, 0), (0, 0)))
    projb = proj.astype(jnp.bfloat16)
    whb = wh.astype(jnp.bfloat16)
    pib = pi.astype(jnp.bfloat16)
    pfb = pf.astype(jnp.bfloat16)
    pob = po.astype(jnp.bfloat16)
    c0f = c0.astype(jnp.float32)
    h0f = h0.astype(jnp.float32)

    def kernel(proj_ref, wh_ref, pi_ref, pf_ref, po_ref, c0_ref, h0_ref,
               hs_ref, res_ref, ct_ref, ht_ref, c_scr, h_scr):
        @pl.when(pl.program_id(0) == 0)
        def _():
            c_scr[:] = c0_ref[:]
            h_scr[:] = h0_ref[:]

        base = pl.program_id(0) * tb

        def mm(x, w_ref):
            return jnp.dot(x.astype(jnp.bfloat16), w_ref[:],
                           preferred_element_type=jnp.float32)

        def step(i, _):
            c_prev = c_scr[:]
            h_prev = h_scr[:]
            z = proj_ref[i].astype(jnp.float32) + mm(h_prev, wh_ref)
            a = jnp.tanh(z[:, :H])
            ig = jax.nn.sigmoid(z[:, H:2 * H] + mm(c_prev, pi_ref))
            f = jax.nn.sigmoid(z[:, 2 * H:3 * H] + mm(c_prev, pf_ref))
            c = f * c_prev + ig * a
            o = jax.nn.sigmoid(z[:, 3 * H:] + mm(c, po_ref))
            tc = jnp.tanh(c)
            h = o * tc
            live = base + i < t
            c_scr[:] = jnp.where(live, c, c_prev)
            h_scr[:] = jnp.where(live, h, h_prev)
            hs_ref[i] = h.astype(hs_ref.dtype)
            res_ref[i, :, 0:H] = a.astype(jnp.bfloat16)
            res_ref[i, :, H:2 * H] = ig.astype(jnp.bfloat16)
            res_ref[i, :, 2 * H:3 * H] = f.astype(jnp.bfloat16)
            res_ref[i, :, 3 * H:4 * H] = o.astype(jnp.bfloat16)
            res_ref[i, :, 4 * H:5 * H] = tc.astype(jnp.bfloat16)
            res_ref[i, :, 5 * H:6 * H] = c_prev.astype(jnp.bfloat16)
            res_ref[i, :, 6 * H:7 * H] = h_prev.astype(jnp.bfloat16)
            res_ref[i, :, 7 * H:8 * H] = c.astype(jnp.bfloat16)
            return 0

        jax.lax.fori_loop(0, tb, step, 0)
        ct_ref[:] = c_scr[:]
        ht_ref[:] = h_scr[:]

    const = lambda i: (0, 0)
    hs, res, c_t, h_t = pl.pallas_call(
        kernel,
        grid=(tp // tb,),
        in_specs=[
            pl.BlockSpec((tb, b, g), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, g), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, H), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, b, H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, b, 8 * H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, H), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, b, H), out_dtype),
            jax.ShapeDtypeStruct((tp, b, 8 * H), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, H), jnp.float32),
            jax.ShapeDtypeStruct((b, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, H), jnp.float32),
            pltpu.VMEM((b, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        interpret=interpret,
    )(projb, whb, pib, pfb, pob, c0f, h0f)
    return hs[:t], res, c_t, h_t


def _peep_train_bwd_impl(res, whT, piT, pfT, poT, dhs, dct, dht, t,
                         proj_dtype, w_dtype, *, time_block=4,
                         vmem_limit_bytes=110 * 1024 * 1024,
                         interpret=None):
    """Reverse-time peephole backward: W^T, the three peep^T matrices
    and all four f32 dW accumulators stay VMEM-resident; dW/dPeep
    accumulate per time block as MXU contractions over the block's
    residual rows (see ``_lstm_train_bwd_impl``)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tp, b, eight_h = res.shape
    H = eight_h // 8
    g = 4 * H
    tb = max(1, min(time_block, tp))
    # pad to a multiple of THIS kernel's tb (forward pads to min(8, T))
    nb = _cdiv(tp, tb)
    tp = nb * tb
    if res.shape[0] != tp:
        res = jnp.pad(res, ((0, tp - res.shape[0]), (0, 0), (0, 0)))
    if dhs.shape[0] != tp:
        dhs = jnp.pad(dhs, ((0, tp - dhs.shape[0]), (0, 0), (0, 0)))
    dhs = dhs.astype(jnp.float32)
    dct = dct.astype(jnp.float32)
    dht = dht.astype(jnp.float32)

    def kernel(res_ref, dhs_ref, whT_ref, piT_ref, pfT_ref, poT_ref,
               dct_ref, dht_ref,
               dproj_ref, dwh_ref, dpi_ref, dpf_ref, dpo_ref,
               dc0_ref, dh0_ref,
               dc_scr, dh_scr, dw_scr, dpi_scr, dpf_scr, dpo_scr, dz_scr):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dc_scr[:] = dct_ref[:]
            dh_scr[:] = dht_ref[:]
            dw_scr[:] = jnp.zeros((H, g), jnp.float32)
            dpi_scr[:] = jnp.zeros((H, H), jnp.float32)
            dpf_scr[:] = jnp.zeros((H, H), jnp.float32)
            dpo_scr[:] = jnp.zeros((H, H), jnp.float32)

        base = (nb - 1 - i) * tb

        def step(j, _):
            idx = tb - 1 - j
            live = base + idx < t
            a = res_ref[idx, :, 0:H].astype(jnp.float32)
            ig = res_ref[idx, :, H:2 * H].astype(jnp.float32)
            f = res_ref[idx, :, 2 * H:3 * H].astype(jnp.float32)
            o = res_ref[idx, :, 3 * H:4 * H].astype(jnp.float32)
            tc = res_ref[idx, :, 4 * H:5 * H].astype(jnp.float32)
            c_prev = res_ref[idx, :, 5 * H:6 * H].astype(jnp.float32)

            dh_tot = dhs_ref[idx] + dh_scr[:]
            dz_o = (dh_tot * tc) * o * (1.0 - o)
            zero = jnp.zeros((b, H), jnp.float32)
            dz_o = jnp.where(live, dz_o, zero)
            # c feeds h (through o's peephole) AND the o-gate preact
            dc = (dc_scr[:] + dh_tot * o * (1.0 - tc * tc)
                  + jnp.dot(dz_o.astype(jnp.bfloat16), poT_ref[:],
                            preferred_element_type=jnp.float32))
            da = dc * ig
            dig = dc * a
            df = dc * c_prev
            dz_a = da * (1.0 - a * a)
            dz_i = dig * ig * (1.0 - ig)
            dz_f = df * f * (1.0 - f)
            dz_a = jnp.where(live, dz_a, zero)
            dz_i = jnp.where(live, dz_i, zero)
            dz_f = jnp.where(live, dz_f, zero)
            dproj_ref[idx, :, 0:H] = dz_a.astype(dproj_ref.dtype)
            dproj_ref[idx, :, H:2 * H] = dz_i.astype(dproj_ref.dtype)
            dproj_ref[idx, :, 2 * H:3 * H] = dz_f.astype(dproj_ref.dtype)
            dproj_ref[idx, :, 3 * H:4 * H] = dz_o.astype(dproj_ref.dtype)
            dz_scr[idx, :, 0:H] = dz_a.astype(jnp.bfloat16)
            dz_scr[idx, :, H:2 * H] = dz_i.astype(jnp.bfloat16)
            dz_scr[idx, :, 2 * H:3 * H] = dz_f.astype(jnp.bfloat16)
            dz_scr[idx, :, 3 * H:4 * H] = dz_o.astype(jnp.bfloat16)
            dc_prev = (dc * f
                       + jnp.dot(dz_scr[idx, :, H:2 * H], piT_ref[:],
                                 preferred_element_type=jnp.float32)
                       + jnp.dot(dz_scr[idx, :, 2 * H:3 * H], pfT_ref[:],
                                 preferred_element_type=jnp.float32))
            dh_prev = jnp.dot(dz_scr[idx], whT_ref[:],
                              preferred_element_type=jnp.float32)
            dc_scr[:] = jnp.where(live, dc_prev, dc_scr[:])
            dh_scr[:] = jnp.where(live, dh_prev, dh_scr[:])
            return 0

        jax.lax.fori_loop(0, tb, step, 0)

        h_prev_blk = res_ref[:, :, 6 * H:7 * H].reshape(tb * b, H)
        c_prev_blk = res_ref[:, :, 5 * H:6 * H].reshape(tb * b, H)
        c_blk = res_ref[:, :, 7 * H:8 * H].reshape(tb * b, H)
        dz_blk = dz_scr[:].reshape(tb * b, g)

        def acc(x, y):
            return jax.lax.dot_general(
                x, y, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        dw_scr[:] = dw_scr[:] + acc(h_prev_blk, dz_blk)
        dpi_scr[:] = dpi_scr[:] + acc(c_prev_blk, dz_blk[:, H:2 * H])
        dpf_scr[:] = dpf_scr[:] + acc(c_prev_blk, dz_blk[:, 2 * H:3 * H])
        dpo_scr[:] = dpo_scr[:] + acc(c_blk, dz_blk[:, 3 * H:4 * H])

        @pl.when(i == nb - 1)
        def _():
            dwh_ref[:] = dw_scr[:].astype(dwh_ref.dtype)
            dpi_ref[:] = dpi_scr[:].astype(dpi_ref.dtype)
            dpf_ref[:] = dpf_scr[:].astype(dpf_ref.dtype)
            dpo_ref[:] = dpo_scr[:].astype(dpo_ref.dtype)
            dc0_ref[:] = dc_scr[:]
            dh0_ref[:] = dh_scr[:]

    const = lambda i: (0, 0)
    rev = lambda i: (nb - 1 - i, 0, 0)
    dproj, dwh, dpi, dpf, dpo, dc0, dh0 = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((tb, b, eight_h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, b, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((g, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, H), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, b, g), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, g), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, H), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, b, g), proj_dtype),
            jax.ShapeDtypeStruct((H, g), w_dtype),
            jax.ShapeDtypeStruct((H, H), w_dtype),
            jax.ShapeDtypeStruct((H, H), w_dtype),
            jax.ShapeDtypeStruct((H, H), w_dtype),
            jax.ShapeDtypeStruct((b, H), jnp.float32),
            jax.ShapeDtypeStruct((b, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, H), jnp.float32),
            pltpu.VMEM((b, H), jnp.float32),
            pltpu.VMEM((H, g), jnp.float32),
            pltpu.VMEM((H, H), jnp.float32),
            pltpu.VMEM((H, H), jnp.float32),
            pltpu.VMEM((H, H), jnp.float32),
            pltpu.VMEM((tb, b, g), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        interpret=interpret,
    )(res, dhs, whT, piT, pfT, poT, dct, dht)
    return dproj[:t], dwh, dpi, dpf, dpo, dc0, dh0


@jax.custom_vjp
def peephole_scan_pallas_train(proj, wh, peep_i, peep_f, peep_o, c0, h0):
    """Differentiable weight-resident Peephole-LSTM scan.

    Forward math is ``peephole_scan_pallas``'s; the custom backward is
    a reverse-time Pallas kernel with W_h^T, the peephole transposes
    and all four f32 dW accumulators VMEM-resident (see
    ``lstm_scan_pallas_train`` for the bandwidth argument).  Completes
    the zoo's training coverage (chainer_networks.py:103-121)."""
    out, _ = _peep_train_vjp_fwd(proj, wh, peep_i, peep_f, peep_o, c0, h0)
    return out


def _peep_train_vjp_fwd(proj, wh, pi, pf, po, c0, h0):
    hs, res, c_t, h_t = _peep_train_fwd_impl(proj, wh, pi, pf, po, c0, h0)
    carry_dtype = c0.dtype
    out = ((c_t.astype(carry_dtype), h_t.astype(carry_dtype)), hs)
    saved = (res, wh, pi, pf, po, jnp.zeros((0,), proj.dtype))
    return out, saved


def _peep_train_vjp_bwd(saved, cot):
    res, wh, pi, pf, po, proj_witness = saved
    (dct, dht), dhs = cot
    t = dhs.shape[0]
    dproj, dwh, dpi, dpf, dpo, dc0, dh0 = _peep_train_bwd_impl(
        res, wh.astype(jnp.bfloat16).T, pi.astype(jnp.bfloat16).T,
        pf.astype(jnp.bfloat16).T, po.astype(jnp.bfloat16).T,
        dhs, dct, dht, t, proj_witness.dtype, wh.dtype)
    return (dproj, dwh, dpi, dpf, dpo,
            dc0.astype(dct.dtype), dh0.astype(dht.dtype))


peephole_scan_pallas_train.defvjp(_peep_train_vjp_fwd, _peep_train_vjp_bwd)


def peephole_scan_pallas(proj, wh, peep_i, peep_f, peep_o, c0, h0, *,
                         time_block: int = 8,
                         vmem_limit_bytes: int = 64 * 1024 * 1024,
                         interpret: bool | None = None):
    """Weight-resident Peephole-LSTM sequence scan (inference).

    Chainer StatefulPeepholeLSTM twin (cells.peephole_lstm_step):
    full-matrix peephole connections — i/f peep on c_{t-1}, o peep on
    c_t. W_h and the three (H, H) peep matrices stay VMEM-resident
    across all timesteps (bf16: ~14.7 MB at H=1024); per step only the
    proj row streams in and h streams out. Same mixed-precision
    contract as ``lstm_scan_pallas``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t, b, g = proj.shape
    carry_dtype = c0.dtype
    h_dim = wh.shape[0]
    H = h_dim
    if g != 4 * h_dim:
        raise ValueError(f"proj gate dim {g} != 4*{h_dim}")
    out_dtype = proj.dtype
    tb = max(1, min(time_block, t))
    tp = _cdiv(t, tb) * tb
    if tp != t:
        proj = jnp.pad(proj, ((0, tp - t), (0, 0), (0, 0)))
    projb = proj.astype(jnp.bfloat16)
    whb = wh.astype(jnp.bfloat16)
    pib = peep_i.astype(jnp.bfloat16)
    pfb = peep_f.astype(jnp.bfloat16)
    pob = peep_o.astype(jnp.bfloat16)
    c0f = c0.astype(jnp.float32)
    h0f = h0.astype(jnp.float32)

    def kernel(proj_ref, wh_ref, pi_ref, pf_ref, po_ref, c0_ref, h0_ref,
               hs_ref, ct_ref, ht_ref, c_scr, h_scr):
        @pl.when(pl.program_id(0) == 0)
        def _():
            c_scr[:] = c0_ref[:]
            h_scr[:] = h0_ref[:]

        base = pl.program_id(0) * tb

        def mm(x, w_ref):
            return jnp.dot(x.astype(jnp.bfloat16), w_ref[:],
                           preferred_element_type=jnp.float32)

        def step(i, _):
            c = c_scr[:]
            z = proj_ref[i].astype(jnp.float32) + mm(h_scr[:], wh_ref)
            a = jnp.tanh(z[:, :H])
            ig = jax.nn.sigmoid(z[:, H:2 * H] + mm(c, pi_ref))
            f = jax.nn.sigmoid(z[:, 2 * H:3 * H] + mm(c, pf_ref))
            c_new = f * c + ig * a
            o = jax.nn.sigmoid(z[:, 3 * H:] + mm(c_new, po_ref))
            h = o * jnp.tanh(c_new)
            live = base + i < t
            c_scr[:] = jnp.where(live, c_new, c)
            h_scr[:] = jnp.where(live, h, h_scr[:])
            hs_ref[i] = h.astype(hs_ref.dtype)
            return 0

        jax.lax.fori_loop(0, tb, step, 0)
        ct_ref[:] = c_scr[:]
        ht_ref[:] = h_scr[:]

    const = lambda i: (0, 0)
    hs, c_t, h_t = pl.pallas_call(
        kernel,
        grid=(tp // tb,),
        in_specs=[
            pl.BlockSpec((tb, b, g), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, g), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, h_dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, h_dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, h_dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h_dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h_dim), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, b, h_dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h_dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h_dim), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, b, h_dim), out_dtype),
            jax.ShapeDtypeStruct((b, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((b, h_dim), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h_dim), jnp.float32),
            pltpu.VMEM((b, h_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        interpret=interpret,
    )(projb, whb, pib, pfb, pob, c0f, h0f)
    return (c_t.astype(carry_dtype), h_t.astype(carry_dtype)), hs[:t]


def peephole_scan_mixed_reference(proj, wh, peep_i, peep_f, peep_o, c0, h0):
    """lax.scan twin with the kernel's exact precision contract."""
    projb = proj.astype(jnp.bfloat16)
    whb = wh.astype(jnp.bfloat16)
    pib = peep_i.astype(jnp.bfloat16)
    pfb = peep_f.astype(jnp.bfloat16)
    pob = peep_o.astype(jnp.bfloat16)
    H = wh.shape[0]

    def mm(x, w):
        return jnp.dot(x.astype(jnp.bfloat16), w,
                       preferred_element_type=jnp.float32)

    def step(carry, x_proj):
        c, h = carry
        z = x_proj.astype(jnp.float32) + mm(h, whb)
        a = jnp.tanh(z[:, :H])
        ig = jax.nn.sigmoid(z[:, H:2 * H] + mm(c, pib))
        f = jax.nn.sigmoid(z[:, 2 * H:3 * H] + mm(c, pfb))
        c_new = f * c + ig * a
        o = jax.nn.sigmoid(z[:, 3 * H:] + mm(c_new, pob))
        h_new = o * jnp.tanh(c_new)
        return (c_new, h_new), h_new.astype(projb.dtype)

    (c_t, h_t), hs = jax.lax.scan(
        step, (c0.astype(jnp.float32), h0.astype(jnp.float32)), projb)
    return (c_t, h_t), hs
