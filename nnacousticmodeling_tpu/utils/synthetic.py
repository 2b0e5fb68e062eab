"""Synthetic TIMIT-like corpus generation.

The reference's dataset bundle is an external download absent from this
environment (data/README.txt), so tests, the end-to-end pipeline, and
the benchmark need a generated stand-in with the same artifact layout:
ragged frame matrices + offsets + framewise pdf targets + utterance
lists + reference MLFs.

Generation samples from the actual decoding graph: random phone
sequences (sil-delimited, like TIMIT), state durations from the image's
trained self-loop probabilities, and observations from per-pdf Gaussian
clusters — so framewise classification is learnable and better acoustic
models genuinely produce lower PER through the full decode.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..decoder.image import HmmImage
from ..io.corpus import RaggedCorpus
from ..io.mlf import write_mlf


@dataclass
class SyntheticCorpus:
    train: RaggedCorpus
    dev: RaggedCorpus
    test: RaggedCorpus
    ref_mlf: Dict[str, List[Tuple[str, List[Tuple[int, int, str]]]]]  # split -> entries
    pdf_means: np.ndarray       # (num_pdfs, dim)
    log_priors: np.ndarray      # (1, num_pdfs)
    spk_means: np.ndarray = None  # (num_speakers, ivector_dim)


def _sample_utterance(img: HmmImage, rng, dim, pdf_means, noise,
                      min_phones, max_phones):
    P = img.num_phones
    # phone id sequence (1-based), sil at both ends like TIMIT
    num = rng.integers(min_phones, max_phones + 1)
    interior = rng.integers(2, P + 1, size=num).tolist() if P > 1 else [1] * num
    phones = [1] + interior + [1]

    frames = []
    targets = []
    segments = []
    # per (phone) pick a triphone with that center to get pdfs/durations;
    # left/right context from the actual neighbors
    t = 0
    for i, ph in enumerate(phones):
        left = phones[i - 1] if i > 0 else 1
        right = phones[i + 1] if i + 1 < len(phones) else 1
        tri = _find_triphone(img, left, ph, right)
        begin = t
        for s in range(3):
            stay = np.exp(img.tp_selfloop[tri, s])
            # geometric duration with the image's own self-loop prob
            dur = 1 + rng.geometric(max(1.0 - stay, 0.05)) - 1
            dur = int(min(dur, 20)) + (1 if s == 0 else 0)
            pdf = img.state_idxs[tri, s]
            for _ in range(max(dur, 1)):
                frames.append(pdf_means[pdf] + noise * rng.standard_normal(dim))
                targets.append(pdf)
            t = len(frames)
        segments.append((begin, t, img.phone_names[tri]))
    x = np.asarray(frames, dtype=np.float32)
    y = np.asarray(targets, dtype=np.int32)
    return x, y, segments


def _find_triphone(img: HmmImage, left: int, center: int, right: int) -> int:
    """Triphone index for context (left-center+right).

    Dense cubes come in two enumerations — the graph builder is
    center-major (idx = b*P^2 + a*P + c) while the synthetic builder is
    left-major (idx = a*P^2 + b*P + c) — so the candidate index is
    validated against the stored biphones; mismatches (or partial
    images) fall back to a search.
    """
    P = img.num_phones
    a, b, c = left - 1, center - 1, right - 1
    bi_in = a * P + b
    bi_out = b * P + c
    if img.num_triphones == P ** 3:
        for idx in (b * P * P + a * P + c,     # builder 'bac' order
                    a * P * P + b * P + c):    # synthetic 'abc' order
            if (img.biphone_in[idx] == bi_in
                    and img.biphone_out[idx] == bi_out):
                return idx
    cand = np.nonzero((img.biphone_in == bi_in) & (img.biphone_out == bi_out))[0]
    if len(cand) == 0:
        cand = np.nonzero(img.biphone_in == bi_in)[0]
    return int(cand[0])


def make_synthetic_corpus(
    img: HmmImage,
    dim: int = 40,
    num_train: int = 64,
    num_dev: int = 16,
    num_test: int = 16,
    noise: float = 1.0,
    seed: int = 0,
    min_phones: int = 3,
    max_phones: int = 10,
    ivector_dim: int = 0,
    num_speakers: int = 8,
) -> SyntheticCorpus:
    """With ``ivector_dim`` > 0 each of the ``num_speakers`` synthetic
    speakers gets a bias added to every frame plus a per-frame i-vector
    (the speaker embedding + small noise), reproducing the reference's
    speaker-adaptation data contract (README.md:39-42): adapted models
    can undo the speaker bias from the appended i-vectors."""
    rng = np.random.default_rng(seed)
    pdf_means = rng.standard_normal((img.num_states, dim)).astype(np.float32)
    spk_means = None
    spk_bias = None
    if ivector_dim > 0:
        spk_means = rng.standard_normal(
            (num_speakers, ivector_dim)).astype(np.float32)
        proj = rng.standard_normal((ivector_dim, dim)).astype(np.float32)
        spk_bias = (spk_means @ proj) * 0.6        # per-speaker feature shift

    splits = {}
    mlfs = {}
    counts = np.zeros(img.num_states, dtype=np.int64)
    for split, count in [("train", num_train), ("dev", num_dev),
                         ("test", num_test)]:
        datas, targets, offsets, names, entries, ivecs = \
            [], [], [0], [], [], []
        for u in range(count):
            x, y, segs = _sample_utterance(img, rng, dim, pdf_means, noise,
                                           min_phones, max_phones)
            # first 5 chars are the "speaker" (generate_folds groups by
            # them): rotate utterances over the synthetic speakers
            spk = u % num_speakers
            if spk_bias is not None:
                x = x + spk_bias[spk]
                iv = np.tile(spk_means[spk], (x.shape[0], 1))
                iv = iv + 0.05 * rng.standard_normal(iv.shape)
                ivecs.append(iv.astype(np.float32))
            datas.append(x)
            targets.append(y)
            offsets.append(offsets[-1] + x.shape[0])
            name = f"{split[0].upper()}{spk:04d}_SX{u:04d}"
            names.append(name)
            entries.append((name, segs))
            if split == "train":
                np.add.at(counts, y, 1)
        splits[split] = RaggedCorpus(
            data=np.concatenate(datas, axis=0),
            offsets=np.asarray(offsets, dtype=np.int64),
            targets=np.concatenate(targets, axis=0),
            ivectors=(np.concatenate(ivecs, axis=0) if ivecs else None),
            utt_names=names,
        )
        mlfs[split] = entries

    probs = np.maximum(counts / max(counts.sum(), 1), 1e-10)
    log_priors = np.log(probs).astype(np.float32)[None, :]
    return SyntheticCorpus(train=splits["train"], dev=splits["dev"],
                           test=splits["test"], ref_mlf=mlfs,
                           pdf_means=pdf_means, log_priors=log_priors,
                           spk_means=spk_means)


def write_corpus_tree(corpus: SyntheticCorpus, root: str) -> None:
    """Materialize the reference's on-disk artifact layout
    (README.md:19-44): data/{data,offsets,targets}_{split}.npy,
    data/{split}.list, recog/{split}_ref.mlf."""
    root_p = Path(root)
    (root_p / "data").mkdir(parents=True, exist_ok=True)
    (root_p / "recog").mkdir(parents=True, exist_ok=True)
    for split in ["train", "dev", "test"]:
        c: RaggedCorpus = getattr(corpus, split)
        np.save(root_p / "data" / f"data_{split}.npy", c.data)
        np.save(root_p / "data" / f"offsets_{split}.npy", c.offsets)
        np.save(root_p / "data" / f"targets_{split}.npy", c.targets)
        (root_p / "data" / f"{split}.list").write_text(
            "\n".join(c.utt_names) + "\n")
        if c.ivectors is not None:
            (root_p / "ivectors").mkdir(exist_ok=True)
            np.save(root_p / "ivectors" / f"ivectors_{split}.npy", c.ivectors)
        write_mlf(str(root_p / "recog" / f"{split}_ref.mlf"),
                  corpus.ref_mlf[split], ext="rec")
    np.save(root_p / "recog" / "log_priors.npy", corpus.log_priors)
