"""Pipeline parallelism for deep feed-forward stacks.

The reference has no pipeline parallelism (SURVEY §2.4 marks it
optional — its deepest configs are the TSD grids' 9x2048 MLPs,
scripts/papers/tsd2018/run.sh:7-53, which fit one chip). This module
provides the TPU-native minimal version for stacks that DON'T fit or
that want to scale depth across chips: the hidden layers split into
``S = mesh stage-axis size`` contiguous groups, microbatches stream
through the stages GPipe-style, and activations hop stage -> stage+1
over ICI via ``lax.ppermute`` inside ``shard_map``.

Design notes (TPU-first):
* one ``lax.scan`` over ``num_micro + S - 1`` ticks — every stage
  computes each tick (no data-dependent control flow), idle head/tail
  bubbles hold zeros;
* each stage's hidden weights live ONLY on that stage's devices
  (``P(stage_axis)`` sharding of the stacked (S, Lm, U, U) tensor) —
  the point of PP is that no device holds the whole stack;
* stages are padded to a uniform ``Lm = ceil(hidden/S)`` layers with
  masked no-op layers (select, not branch), keeping the per-tick
  program identical across stages for SPMD;
* the last stage's logits are psum-broadcast so every device returns
  the full (N, C) output — differentiable end to end (jax AD through
  ``shard_map``/``ppermute``), so ``jax.grad`` of a loss on the output
  gives exactly the single-device gradients.

Restrictions (asserted): MLP with uniform hidden width, ``layers >= S``,
batch divisible by ``num_micro``. Inference and loss/grad paths; for
dropout-free nets the outputs are bit-identical to ``net.apply``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.networks import ACTIVATIONS, MLP


def _stage_bounds(n_layers: int, n_stages: int):
    """Near-even contiguous split of ``n_layers`` over ``n_stages``."""
    base, extra = divmod(n_layers, n_stages)
    sizes = [base + (1 if s < extra else 0) for s in range(n_stages)]
    bounds = np.cumsum([0] + sizes)
    return bounds, max(sizes)


@dataclass(frozen=True)
class PipelinedMLP:
    """GPipe-style pipelined twin of an ``MLP`` over a mesh stage axis.

    ``apply(params, x)`` consumes the ORIGINAL MLP params (so trained
    checkpoints work unchanged) and matches ``net.apply(params, x)``
    exactly for dropout-free forward passes.
    """

    net: MLP
    mesh: Mesh
    num_micro: int = 4
    stage_axis: str = "stage"

    @property
    def num_stages(self) -> int:
        return dict(zip(self.mesh.axis_names,
                        self.mesh.devices.shape))[self.stage_axis]

    def _stacked(self, params):
        """(first layer, stacked+padded later layers, out) with the
        stack constrained onto the stage axis."""
        net, S = self.net, self.num_stages
        if net.layers < S:
            raise ValueError(f"{net.layers} layers < {S} stages")
        U = net.units
        # stage 0 owns the input layer; layers 1.. split over stages
        bounds, Lm = _stage_bounds(net.layers - 1, S)
        W = jnp.zeros((S, Lm, U, U), dtype=jnp.float32)
        bvec = jnp.zeros((S, Lm, U), dtype=jnp.float32)
        valid = np.zeros((S, Lm), dtype=np.float32)
        for s in range(S):
            for i, l in enumerate(range(bounds[s], bounds[s + 1])):
                layer = params["hidden"][l + 1]
                W = W.at[s, i].set(layer["w"])
                bvec = bvec.at[s, i].set(layer["b"])
                valid[s, i] = 1.0
        sh = NamedSharding(self.mesh, P(self.stage_axis))
        W = jax.lax.with_sharding_constraint(W, sh)
        bvec = jax.lax.with_sharding_constraint(bvec, sh)
        first = params["hidden"][0]
        out = params["out"]
        return ((first["w"], first["b"]), W, bvec, jnp.asarray(valid),
                (out["w"], out["b"]))

    def apply(self, params, x, rng=None, train=False):
        """(N, D) -> (N, C) logits, equal to ``self.net.apply``.

        Dropout is intentionally unsupported here (rng/train must stay
        off): per-layer mask draws would need a per-stage rng protocol.
        """
        if train and self.net.dropout:
            raise NotImplementedError("pipelined dropout not supported")
        net, S, M = self.net, self.num_stages, self.num_micro
        act = ACTIVATIONS[net.activation]
        N = x.shape[0]
        if N % M:
            raise ValueError(f"batch {N} not divisible by {M} microbatches")
        mb = N // M
        (w0, b0), W, bvec, valid, (wo, bo) = self._stacked(params)
        C = wo.shape[1]
        Lm = W.shape[1]
        axis = self.stage_axis

        import functools
        try:
            from jax import shard_map            # jax >= 0.6
            shard_map = functools.partial(shard_map, check_vma=False)
        except ImportError:                      # pragma: no cover
            from jax.experimental.shard_map import shard_map
            shard_map = functools.partial(shard_map, check_rep=False)

        def staged(w0, b0, Wl, bl, vl, wo, bo, xs):
            # Wl/bl/vl carry a leading per-device stage dim of size 1
            Wl, bl, vl = Wl[0], bl[0], vl[0]
            s = jax.lax.axis_index(axis)
            last = S - 1

            def hidden_block(h):
                for l in range(Lm):
                    y = act(h @ Wl[l] + bl[l])
                    h = jnp.where(vl[l] > 0, y, h)
                return h

            def tick(carry, t):
                buf = carry                       # (mb, U) from stage s-1
                # stage 0 injects microbatch t (clamped; bubbles masked)
                inject = act(xs[jnp.clip(t, 0, M - 1)] @ w0 + b0)
                h = jnp.where(s == 0, inject, buf)
                h = hidden_block(h)
                # pass to the next stage (no wraparound)
                nxt = jax.lax.ppermute(
                    h, axis, [(i, i + 1) for i in range(S - 1)])
                out_idx = t - last
                logits = jnp.where(
                    jnp.logical_and(s == last,
                                    jnp.logical_and(out_idx >= 0,
                                                    out_idx < M)),
                    h @ wo + bo, jnp.zeros((mb, C), h.dtype))
                return nxt, (out_idx, logits)

            _, (idxs, outs) = jax.lax.scan(
                tick, jnp.zeros((mb, w0.shape[1]), xs.dtype),
                jnp.arange(M + S - 1))
            # scatter the last stage's M valid ticks into order and
            # broadcast to every stage
            ys = jnp.zeros((M, mb, C), outs.dtype)
            ys = ys.at[jnp.clip(idxs, 0, M - 1)].add(
                jnp.where((idxs >= 0)[:, None, None]
                          & (idxs < M)[:, None, None], outs, 0.0))
            return jax.lax.psum(ys, axis)

        xs = x.reshape(M, mb, -1)
        spec_stage = P(axis)
        ys = shard_map(
            staged, mesh=self.mesh,
            in_specs=(P(), P(), spec_stage, spec_stage, spec_stage,
                      P(), P(), P()),
            out_specs=P(),
        )(w0, b0, W, bvec, valid.reshape(S, Lm), wo, bo, xs)
        return ys.reshape(N, C)
