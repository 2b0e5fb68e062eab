"""HTK Master Label File (MLF) read/write.

Read side mirrors the reference parser (``scripts/util/kw_utils.py:45-78``):
utterance id is the header path's basename up to the first ``.``, with a
leading ``*/`` stripped; label lines are either ``begin end phone`` (HTK
100 ns units) or a bare phone; the original file order is preserved so
scoring can iterate utterances deterministically.

Write side mirrors the native decoder's writer
(``recog_src/source/mlf_io.cpp:15-35``): ``#!MLF!#`` header, per utterance
``"*/<utt>.rec"``, segment lines ``<begin*1e5> <end*1e5> <phone>`` (frame
index scaled to HTK units by appending five zeros), terminated by ``.``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Sequence, Tuple

#: HTK time units (100 ns) per 10 ms frame: frame -> HTK = frame * 100000.
HTK_UNITS_PER_FRAME = 100000


@dataclass
class MlfEntry:
    """Labels of one utterance: phone strings plus optional begin/end times."""

    words: List[str] = field(default_factory=list)
    begins: List[int] = field(default_factory=list)
    ends: List[int] = field(default_factory=list)
    orig_id: int = 0


def load_mlf(filename: str) -> Dict[str, MlfEntry]:
    mlf: Dict[str, MlfEntry] = {}
    orig_id = 0
    current: MlfEntry | None = None
    utt = None
    consume_end = False
    with open(filename) as fid:
        for line in fid:
            if not line or line[0] == "#":
                continue
            if line[0] == '"':
                utt = line[1:].split(".")[0]
                if utt.startswith("*"):
                    utt = utt[2:]
                current = MlfEntry()
                consume_end = False
                continue
            if line[0] == ".":
                if current is not None and utt is not None:
                    current.orig_id = orig_id
                    mlf[utt] = current
                    orig_id += 1
                consume_end = True
                continue
            if consume_end or current is None:
                continue
            parts = line.split()
            if len(parts) == 3:
                current.words.append(parts[2])
                current.begins.append(int(parts[0]))
                current.ends.append(int(parts[1]))
            else:
                current.words.append(line.strip())
    return mlf


def write_mlf(
    filename: str,
    results: Sequence[Tuple[str, Sequence[Tuple[int, int, str]]]],
    ext: str = "rec",
) -> None:
    """Write segments as an MLF.

    ``results`` is a sequence of ``(utt_name, [(begin_frame, end_frame,
    phone), ...])``. Frame indices are scaled to HTK units exactly like the
    native writer (appending "00000").
    """
    with open(filename, "w") as fid:
        fid.write("#!MLF!#\n")
        for utt, segments in results:
            fid.write(f'"*/{utt}.{ext}"\n')
            for begin, end, phone in segments:
                fid.write(f"{begin}00000 {end}00000 {phone}\n")
            fid.write(".\n")


def utt_base_name(path: str) -> str:
    """Basename up to the last dot, as the native decoder derives utterance
    names from .scp entries (``recog_src/source/main.cpp:87-97``)."""
    b = 0
    e = len(path)
    for i, c in enumerate(path):
        if c in "/\\":
            b = i + 1
        if c == ".":
            e = i
    if e <= b:  # dot only in a directory component
        e = len(path)
    return path[b:e]
