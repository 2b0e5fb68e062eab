"""Corpus-level decoding: ragged posteriors -> per-utterance results,
with length bucketing so each padded shape compiles once."""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..infer.posteriors import _buckets, default_buckets
from .viterbi import DecodeResult, ViterbiDecoder


def decode_corpus(
    dec: ViterbiDecoder,
    lp: np.ndarray,
    offsets: np.ndarray,
    batch: int = 64,
    bucket_sizes: Optional[Sequence[int]] = None,
) -> List[DecodeResult]:
    """Decode concatenated (N, S) log posteriors with utterance offsets."""
    lengths = np.diff(offsets)
    num_utts = len(lengths)
    if bucket_sizes is None:
        bucket_sizes = default_buckets(int(lengths.max()))
    assignment = _buckets(lengths, bucket_sizes)
    s = lp.shape[1]
    results: List[Optional[DecodeResult]] = [None] * num_utts
    for b in sorted(set(assignment.tolist())):
        utt_ids = np.nonzero(assignment == b)[0]
        for beg in range(0, len(utt_ids), batch):
            ids = utt_ids[beg:beg + batch]
            xb = np.zeros((len(ids), b, s), dtype=np.float32)
            for row, u in enumerate(ids):
                xb[row, :lengths[u]] = lp[offsets[u]:offsets[u + 1]]
            out = dec.decode_batch(xb, [int(lengths[u]) for u in ids])
            for row, u in enumerate(ids):
                results[u] = out[row]
    return results
