"""TIMIT 60->48->39 phone mapping.

``recog/phones.60-48-39.map`` has three columns; decoding emits column-2
(48-set) phones and scoring maps them to the 39-set via column-2 ->
column-3 (reference: evaluateModelForTest.py:13-34). Lines with fewer
than three columns (unmapped 60-set phones like ``q``) are skipped.
"""

from __future__ import annotations

from typing import Dict, Iterable, List


def load_phone_map(filename: str, col_from: int = 1, col_to: int = 2) -> Dict[str, str]:
    mapping: Dict[str, str] = {}
    for line in open(filename):
        parts = line.split()
        if len(parts) == 3:
            mapping[parts[col_from]] = parts[col_to]
    return mapping


def map_phones(phones: Iterable[str], mapping: Dict[str, str]) -> List[str]:
    return [mapping[p] for p in phones]
