"""Frame splicing as vectorized gathers (jit-friendly, no Python loops).

The reference splices with per-frame Python loops and edge clamping
(``scripts/util/kw_utils.py:24-36``); notably it splices the whole
concatenated corpus matrix, so windows cross utterance boundaries and
clamping only happens at the corpus ends (train.py:229, evaluate.py:165).
``splice_flat`` reproduces exactly that; ``splice_utts`` is the
boundary-aware variant (clamps at each utterance edge), available as a
conscious improvement behind an explicit call.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def _gather_windows(x: np.ndarray, shifts: Sequence[int]) -> np.ndarray:
    n = x.shape[0]
    idx = np.arange(n)[:, None] + np.asarray(shifts)[None, :]   # (N, W)
    np.clip(idx, 0, n - 1, out=idx)
    return x[idx].reshape(n, -1)                                # (N, W*D)


def splice_flat(x: np.ndarray, shifts: Sequence[int]) -> np.ndarray:
    """Reference-compatible corpus-wide splice: windows cross utterance
    boundaries, clamped only at matrix ends (kw_utils.py:24-36)."""
    return np.ascontiguousarray(_gather_windows(x, shifts), dtype=np.float32)


def splice_utts(x: np.ndarray, offsets: np.ndarray, shifts: Sequence[int]) -> np.ndarray:
    """Boundary-aware splice: windows clamp at every utterance edge."""
    n = x.shape[0]
    shifts = np.asarray(shifts)
    idx = np.arange(n)[:, None] + shifts[None, :]
    # clamp each row's window to its utterance's [beg, end) range
    utt_of_frame = np.searchsorted(offsets, np.arange(n), side="right") - 1
    beg = offsets[utt_of_frame][:, None]
    end = offsets[utt_of_frame + 1][:, None] - 1
    idx = np.clip(idx, beg, end)
    return np.ascontiguousarray(x[idx].reshape(n, -1), dtype=np.float32)


def window_batch(x: np.ndarray, start: int, stop: int, winlen: int) -> np.ndarray:
    """Spliced rows [start, stop) with a symmetric window of ``winlen``
    frames, clamped at corpus ends — the FF inference batcher
    (``scripts/util/kw_nn_utils.py:19-43`` with sorted contiguous idxs).
    """
    half = winlen // 2
    n = x.shape[0]
    idx = np.arange(start, stop)[:, None] + np.arange(-half, half + 1)[None, :]
    np.clip(idx, 0, n - 1, out=idx)
    return np.ascontiguousarray(x[idx].reshape(stop - start, -1), dtype=np.float32)
