"""Phone error rate scoring.

``nist_phone_errors`` is a behavioral twin of the reference's
TIMIT/NIST-compatible alignment (``scripts/util/levenshtein.py:84-160``)
in which ``sil`` in the reference transcript is optional (free to skip).
Its quirks are preserved deliberately, because PER parity requires them:

* the DP runs with the longer string as the row axis, swapping arguments
  (and afterwards the I/D counts) when the test string is shorter;
* the backtrack path matrix stores ``argmin([sub, ins, del])`` — a
  *different* preference order than the cost minimum — plus an extra
  tie-break preferring the optional-sil move when ins == del;
* the backtrack stops as soon as either index underflows, silently
  dropping any remaining prefix;
* skipped optional sils count toward H (hits), not D/I.

``compute_per`` mirrors ``computeWER`` (levenshtein.py:166-205):
``100 * (D + I + S) / N`` with N = reference phone count, iterating
utterances in the test MLF's original file order.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from ..io.mlf import MlfEntry, load_mlf

OPTIONAL_PHONE = "sil"


def levenshtein_distance(s1: Sequence[str], s2: Sequence[str]) -> int:
    """Plain edit distance (reference levenshtein.py:6-24)."""
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    if not s2:
        return len(s1)
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1):
        cur = [i + 1]
        for j, c2 in enumerate(s2):
            cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (c1 != c2)))
        prev = cur
    return prev[-1]


def phone_errors(test: Sequence[str], ref: Sequence[str]) -> Tuple[int, int, int, int, int]:
    """Plain alignment error counts (twin of levenshtein2,
    levenshtein.py:26-81). Returns (N, H, D, I, S) with N = len(ref)."""
    s1, s2, flip = test, ref, False
    if len(s1) < len(s2):
        s1, s2, flip = s2, s1, True
    if not s2:
        # reference quirk: returns a bare int; callers never hit this.
        return len(ref), 0, len(ref), 0, 0

    n1, n2 = len(s1), len(s2)
    prev = list(range(n2 + 1))
    path = [[0] * n2 for _ in range(n1)]
    for i in range(n1):
        c1 = s1[i]
        cur = [i + 1]
        for j in range(n2):
            ins = prev[j + 1] + 1
            dele = cur[j] + 1
            sub = prev[j] + (c1 != s2[j])
            cur.append(min(ins, dele, sub))
            # reference argmin order: [ins, del, sub] -> codes 0/1/2
            if ins <= dele and ins <= sub:
                path[i][j] = 0
            elif dele <= sub:
                path[i][j] = 1
            else:
                path[i][j] = 2
        prev = cur

    i, j = n1 - 1, n2 - 1
    H = D = I = S = 0
    while i >= 0 and j >= 0:
        code = path[i][j]
        if code == 0:
            I += 1
            i -= 1
        elif code == 1:
            D += 1
            j -= 1
        else:
            if s1[i] == s2[j]:
                H += 1
            else:
                S += 1
            i -= 1
            j -= 1
    if flip:
        I, D = D, I
    return len(ref), H, D, I, S


def nist_phone_errors(test: Sequence[str], ref: Sequence[str]) -> Tuple[int, int, int, int, int]:
    """NIST/TIMIT alignment with optional ``sil`` in the reference.

    Behavioral twin of levenshtein_nist (levenshtein.py:84-160).
    Returns (N, H, D, I, S); N = len(ref); optional-sil skips count as H.
    """
    s1, s2, flip = list(test), list(ref), False
    if len(s1) < len(s2):
        s1, s2, flip = s2, s1, True
    if not s2:
        return len(ref), 0, len(ref), 0, 0

    n1, n2 = len(s1), len(s2)
    prev = list(range(n2 + 1))
    path = [[0] * n2 for _ in range(n1)]
    for i in range(n1):
        c1 = s1[i]
        s1_is_sil = flip and c1 == OPTIONAL_PHONE
        for_row = path[i]
        cur = [i + 1]
        for j in range(n2):
            ins = prev[j + 1] + 1
            dele = cur[j] + 1
            sub = prev[j] + (c1 != s2[j])
            if s1_is_sil:           # s1 holds the reference when flipped
                ins -= 1
            if not flip and s2[j] == OPTIONAL_PHONE:
                dele -= 1
            cur.append(min(ins, dele, sub))
            # reference argmin order: [sub, ins, del] -> codes 0/1/2
            if sub <= ins and sub <= dele:
                code = 0
            elif ins <= dele:
                code = 1
            else:
                code = 2
            # tie-break: prefer the optional-sil consuming move
            if code > 0 and ins == dele:
                code = 1 if flip else 2
            for_row[j] = code
        prev = cur

    i, j = n1 - 1, n2 - 1
    H = D = I = S = 0
    skips = 0
    while i >= 0 and j >= 0:
        code = path[i][j]
        if code == 0:
            if s1[i] == s2[j]:
                H += 1
            else:
                S += 1
            i -= 1
            j -= 1
        elif code == 1:
            if flip and s1[i] == OPTIONAL_PHONE:
                skips += 1
            else:
                I += 1
            i -= 1
        else:
            if not flip and s2[j] == OPTIONAL_PHONE:
                skips += 1
            else:
                D += 1
            j -= 1
    if flip:
        I, D = D, I
    return len(ref), H + skips, D, I, S


def compute_per(
    test_mlf: "str | Dict[str, MlfEntry]",
    ref_mlf: "str | Dict[str, MlfEntry]",
    nist: bool = True,
) -> float:
    """Corpus PER % = 100*(D+I+S)/N (twin of computeWER,
    levenshtein.py:166-205)."""
    test = load_mlf(test_mlf) if isinstance(test_mlf, str) else test_mlf
    ref = load_mlf(ref_mlf) if isinstance(ref_mlf, str) else ref_mlf

    utts: List[str] = sorted(test.keys(), key=lambda u: test[u].orig_id)
    TN = TH = TD = TI = TS = 0
    for utt in utts:
        if utt not in ref:
            raise KeyError(f"utterance {utt} not in the reference mlf")
        fn = nist_phone_errors if nist else phone_errors
        N, H, D, I, S = fn(test[utt].words, ref[utt].words)
        TN += N
        TH += H
        TD += D
        TI += I
        TS += S
    TN += TN == 0
    return (100.0 * (TD + TI + TS)) / TN
