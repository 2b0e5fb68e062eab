"""Scorer tests.

Strongest oracle available: the reference implementation itself
(scripts/util/levenshtein.py is pure numpy and importable), compared on
randomized phone sequences. Plus the self-score-zero gate on the
checked-in reference MLFs.
"""

import sys

import numpy as np
import pytest

from nnacousticmodeling_tpu.decoder import (
    levenshtein_distance, phone_errors, nist_phone_errors, compute_per,
)
from nnacousticmodeling_tpu.io import load_mlf

sys.path.insert(0, "/root/reference/scripts/util")
import levenshtein as ref_lev  # noqa: E402

PHONES = ["aa", "ae", "b", "iy", "sil", "k", "t", "s"]


def _rand_seq(rng, lo=0, hi=12):
    n = rng.integers(lo, hi)
    return [PHONES[i] for i in rng.integers(0, len(PHONES), n)]


def test_levenshtein_distance_vs_reference(rng):
    for _ in range(200):
        a, b = _rand_seq(rng), _rand_seq(rng)
        assert levenshtein_distance(a, b) == ref_lev.levenshtein(a, b)


def test_phone_errors_vs_reference(rng):
    for _ in range(300):
        a, b = _rand_seq(rng, 1, 12), _rand_seq(rng, 1, 12)
        assert phone_errors(a, b) == tuple(ref_lev.levenshtein2(a, b))


def test_nist_phone_errors_vs_reference(rng):
    for _ in range(500):
        a, b = _rand_seq(rng, 1, 14), _rand_seq(rng, 1, 14)
        assert nist_phone_errors(a, b) == tuple(ref_lev.levenshtein_nist(a, b))


def test_nist_sil_is_optional():
    # deleting a reference sil is free (counts as hit)
    N, H, D, I, S = nist_phone_errors(["aa", "b"], ["aa", "sil", "b"])
    assert (D, I, S) == (0, 0, 0)
    assert H == 3 and N == 3


def test_self_score_is_zero(reference_dir):
    ref = load_mlf(f"{reference_dir}/recog/test_ref.mlf")
    assert compute_per(ref, ref, nist=True) == 0.0
    assert compute_per(ref, ref, nist=False) == 0.0


def test_compute_per_vs_reference_on_perturbed_mlf(reference_dir, rng):
    """Perturb the reference transcripts and check corpus PER equality
    with the reference computeWER."""
    ref = load_mlf(f"{reference_dir}/recog/test_ref.mlf")
    test = {}
    for utt, entry in ref.items():
        words = list(entry.words)
        for _ in range(rng.integers(0, 4)):
            op = rng.integers(0, 3)
            pos = int(rng.integers(0, len(words))) if words else 0
            if op == 0 and words:
                words[pos] = PHONES[rng.integers(0, len(PHONES))]
            elif op == 1 and len(words) > 1:
                del words[pos]
            else:
                words.insert(pos, PHONES[rng.integers(0, len(PHONES))])
        e = type(entry)(words=words, begins=[], ends=[], orig_id=entry.orig_id)
        test[utt] = e

    ref_style_test = {u: [e.words, e.begins, e.ends, e.orig_id] for u, e in test.items()}
    ref_style_ref = {u: [e.words, e.begins, e.ends, e.orig_id] for u, e in ref.items()}
    ours = compute_per(test, ref, nist=True)
    theirs = ref_lev.computeWER(ref_style_test, ref_style_ref, True)
    assert ours == pytest.approx(theirs, abs=1e-9)
    assert ours > 0
