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

Used by the inference runners (networks.py `scan_impl="pallas"`) and
bench.py; training keeps the XLA scan (autodiff through the kernel is
not needed — the reference's hot eval path is inference,
evaluateModelForTest.py:52-93).
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
