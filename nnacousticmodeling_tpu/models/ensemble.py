"""Master + k-fold + RPL ensemble combination.

Behavioral twin of ``NNWithRPL`` (scripts/common/evaluate.py:19-51) with
the exact weighting rule:

* master only:            h = master(x)
* master + K folds:       h = (master(x)*K + sum_k fold_k(x)) / (2K)
* folds only:             h = mean_k fold_k(x)
* then optionally         h = rpl(h)

TPU-native design: fold networks share one architecture, so their
params are stacked along a leading ``fold`` axis and evaluated with a
single ``vmap`` (one batched MXU matmul per layer instead of K separate
ones); the fold axis can be sharded over the device mesh for
fold-parallel evaluation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp


def stack_fold_params(fold_params_list):
    """Stack K per-fold pytrees into one pytree with a leading fold axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *fold_params_list)


@dataclass(frozen=True)
class Ensemble:
    """Combines a master net, stacked fold nets, and an RPL head."""

    network: Any                  # shared architecture (models.networks.*)
    rpl: Optional[Any] = None     # models.rpl.* head or None
    num_folds: int = 0

    def combine(self, master_logits, fold_logits):
        """Apply the reference weighting to precomputed logits.

        master_logits: (..., C) or None; fold_logits: (K, ..., C) or None.
        """
        if master_logits is not None and fold_logits is None:
            return master_logits
        if master_logits is not None:
            k = fold_logits.shape[0]
            return (master_logits * k + fold_logits.sum(axis=0)) / (2 * k)
        return fold_logits.mean(axis=0)

    # ---- feed-forward path ------------------------------------------
    def apply(self, params, x):
        """params = {"master": ..|None, "folds": stacked..|None, "rpl": ..|None}"""
        master_logits = (self.network.apply(params["master"], x)
                         if params.get("master") is not None else None)
        fold_logits = None
        if params.get("folds") is not None:
            fold_logits = jax.vmap(lambda p: self.network.apply(p, x))(params["folds"])
        h = self.combine(master_logits, fold_logits)
        if self.rpl is not None and params.get("rpl") is not None:
            h = self.rpl.apply(params["rpl"], h)
        return h

    # ---- recurrent path ---------------------------------------------
    def apply_sequence(self, params, xs, state=None):
        """xs (B, T, D) -> (B, T, C). State is {"master":.., "folds":..}."""
        if state is None:
            state = {"master": None, "folds": None}
        master_logits = None
        new_state = {"master": None, "folds": None}
        if params.get("master") is not None:
            master_logits, new_state["master"] = self.network.apply_sequence(
                params["master"], xs, state["master"])
        fold_logits = None
        if params.get("folds") is not None:
            def one_fold(p, st):
                return self.network.apply_sequence(p, xs, st)
            if state["folds"] is None:
                fold_logits, new_state["folds"] = jax.vmap(
                    lambda p: self.network.apply_sequence(p, xs, None)
                )(params["folds"])
            else:
                fold_logits, new_state["folds"] = jax.vmap(one_fold)(
                    params["folds"], state["folds"])
        h = self.combine(master_logits, fold_logits)
        if self.rpl is not None and params.get("rpl") is not None:
            h = self.rpl.apply(params["rpl"], h)
        return h, new_state
