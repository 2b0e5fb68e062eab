"""Kaldi artifact parsers: nnet1 feature transform and pdf priors.

The feature transform file is Kaldi nnet1 text with three components
(cf. ``/root/reference/kaldi/final.feature_transform:1-7``)::

    <Nnet>
    <Splice> <out_dim> <in_dim>
    [ s_0 s_1 ... s_k ]
    <AddShift> <dim> <dim>
    <LearnRateCoef> 0 [ v_0 ... v_{dim-1} ]
    <Rescale> <dim> <dim>
    <LearnRateCoef> 0 [ ... ]

Parsing matches the reference reader (``scripts/util/kw_nn_utils.py:4-11``,
fixed line positions) and application is ``(x + add_shift) * rescale``
(kw_nn_utils.py:13-17).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import List

import numpy as np


@dataclass
class FeatureTransform:
    """Splice shifts + global shift/scale normalization."""

    dim_out: int          # spliced dimension the shift/scale apply to
    dim_in: int           # raw feature dimension
    shifts: List[int]     # splice context offsets, e.g. [-5..5]
    add_shift: np.ndarray  # (dim_out,) float32
    rescale: np.ndarray    # (dim_out,) float32


def load_feature_transform(filename: str) -> FeatureTransform:
    lines = open(filename).readlines()
    dims = [int(v) for v in lines[1].split()[1:]]
    shifts = [int(v) for v in lines[2].split()[1:-1]]
    add_shift = np.asarray([float(v) for v in lines[4].split()[3:-1]], dtype=np.float32)
    rescale = np.asarray([float(v) for v in lines[6].split()[3:-1]], dtype=np.float32)
    if add_shift.shape[0] != dims[0] or rescale.shape[0] != dims[0]:
        raise ValueError(
            f"feature transform dim mismatch: header {dims[0]}, "
            f"addShift {add_shift.shape[0]}, rescale {rescale.shape[0]}"
        )
    return FeatureTransform(
        dim_out=dims[0], dim_in=dims[1], shifts=shifts,
        add_shift=add_shift, rescale=rescale,
    )


def apply_feature_transform(x, ft: FeatureTransform):
    """``(x + add_shift) * rescale`` — works on numpy or jax arrays."""
    return (x + ft.add_shift) * ft.rescale


def specialize_transform_center(ft: FeatureTransform) -> FeatureTransform:
    """Keep only the center (shift 0) frame of the transform.

    Used for recurrent networks, which consume unspliced frames
    (reference: train.py:235-241).
    """
    zi = ft.shifts.index(0)
    dim = ft.dim_in
    return replace(
        ft,
        dim_out=dim,
        shifts=[0],
        add_shift=ft.add_shift[zi * dim:(zi + 1) * dim],
        rescale=ft.rescale[zi * dim:(zi + 1) * dim],
    )


def specialize_transform_tiled(ft: FeatureTransform, splice: int) -> FeatureTransform:
    """Tile the center-frame normalization over a ±splice window.

    Used for TDNN inputs, which are spliced to the TDNN's receptive field
    but normalized with the center-frame statistics repeated
    (reference: train.py:242-249).
    """
    zi = ft.shifts.index(0)
    dim = ft.dim_in
    winlen = 2 * splice + 1
    return replace(
        ft,
        dim_out=dim * winlen,
        shifts=list(range(-splice, splice + 1)),
        add_shift=np.tile(ft.add_shift[zi * dim:(zi + 1) * dim], winlen),
        rescale=np.tile(ft.rescale[zi * dim:(zi + 1) * dim], winlen),
    )


def load_priors_from_counts(
    filename: str, smoothing: float = 0.5, floor: float = 1e-10
) -> np.ndarray:
    """Log-priors from Kaldi alignment pdf counts.

    ``ali_train_pdf.counts`` is a single bracketed vector of per-pdf
    occupation counts with +0.5 smoothing baked in; the reference ships
    the derived ``recog/log_ap_Kaldi1909.npy`` (shape (1, num_pdfs)
    float32, subtracted from NN log-posteriors before decoding —
    evaluateModelForTest.py:75-77) computed from the *unsmoothed* counts.
    ``log((count_i - smoothing) / sum(count - smoothing))`` reproduces the
    shipped file to ~5e-7 (verified in tests/test_io.py).
    """
    text = open(filename).read().replace("[", " ").replace("]", " ")
    counts = np.asarray([float(v) for v in text.split()], dtype=np.float64)
    counts = counts - smoothing
    probs = np.maximum(counts / counts.sum(), floor)
    return np.log(probs).astype(np.float32)[None, :]
