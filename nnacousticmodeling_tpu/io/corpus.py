"""Offset-indexed ragged corpus views over the .npy artifact layout.

The reference stores each split as flat frame matrices plus utterance
boundary offsets (``data_{train,dev,test}.npy`` (N, D) float32,
``offsets_{}.npy`` int with ``offsets[0]==0`` and ``offsets[-1]==N``,
``targets_{}.npy`` (N,) int, optional ``ivectors_{}.npy`` (N, Div); see
/root/reference/README.md:19-44). This module keeps that contract and
adds a typed ragged view plus helpers the reference lacks.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional

import numpy as np


@dataclass
class RaggedCorpus:
    """One split: concatenated frames with utterance offsets."""

    data: np.ndarray                 # (N, D) float32
    offsets: np.ndarray              # (U+1,) int64/int32, offsets[0]=0, offsets[-1]=N
    targets: Optional[np.ndarray] = None    # (N,) int32
    ivectors: Optional[np.ndarray] = None   # (N, Div) float32
    utt_names: Optional[List[str]] = None   # (U,)

    def __post_init__(self):
        if self.offsets[0] != 0 or self.offsets[-1] != self.data.shape[0]:
            raise ValueError(
                f"offsets must span the data: got [{self.offsets[0]}, "
                f"{self.offsets[-1]}] for {self.data.shape[0]} frames"
            )

    @property
    def num_utts(self) -> int:
        return len(self.offsets) - 1

    @property
    def num_frames(self) -> int:
        return int(self.data.shape[0])

    @property
    def dim(self) -> int:
        return int(self.data.shape[1])

    @property
    def utt_lengths(self) -> np.ndarray:
        return np.diff(self.offsets)

    def utt(self, i: int) -> np.ndarray:
        return self.data[self.offsets[i]:self.offsets[i + 1]]

    def utt_targets(self, i: int) -> np.ndarray:
        if self.targets is None:
            raise ValueError("corpus has no targets")
        return self.targets[self.offsets[i]:self.offsets[i + 1]]

    def with_data(self, data: np.ndarray, offsets: Optional[np.ndarray] = None,
                  targets: Optional[np.ndarray] = "unset") -> "RaggedCorpus":
        return RaggedCorpus(
            data=data,
            offsets=self.offsets if offsets is None else offsets,
            targets=self.targets if isinstance(targets, str) else targets,
            ivectors=self.ivectors,
            utt_names=self.utt_names,
        )


def load_utt_list(filename: str) -> List[str]:
    return [line.strip() for line in open(filename) if line.strip()]


def load_corpus(
    data_dir: str,
    split: str,
    offset_dir: Optional[str] = None,
    target_dir: Optional[str] = None,
    ivector_dir: Optional[str] = None,
    utt_list_dir: Optional[str] = None,
    data_pattern: str = "data_{}.npy",
    offsets_pattern: str = "offsets_{}.npy",
    targets_pattern: str = "targets_{}.npy",
    ivectors_pattern: str = "ivectors_{}.npy",
) -> RaggedCorpus:
    """Load one split following the reference's directory layout
    (train.py:208-221): data from ``data_dir``, offsets from
    ``offset_dir``, targets from ``target_dir``, i-vectors optional.
    """
    data = np.load(str(Path(data_dir, data_pattern.format(split))))
    offsets = np.load(str(Path(offset_dir or data_dir, offsets_pattern.format(split))))
    targets = None
    if target_dir is not None:
        tpath = Path(target_dir, targets_pattern.format(split))
        if tpath.is_file():
            targets = np.load(str(tpath))
    ivectors = None
    if ivector_dir is not None:
        ivectors = np.load(str(Path(ivector_dir, ivectors_pattern.format(split))))
    utt_names = None
    if utt_list_dir is not None:
        lpath = Path(utt_list_dir, f"{split}.list")
        if lpath.is_file():
            utt_names = load_utt_list(str(lpath))
    return RaggedCorpus(data=data, offsets=offsets, targets=targets,
                        ivectors=ivectors, utt_names=utt_names)
