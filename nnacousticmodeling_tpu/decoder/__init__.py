from .score import levenshtein_distance, phone_errors, nist_phone_errors, compute_per
from .image import HmmImage, load_image, save_image, make_synthetic_image
from .viterbi import ViterbiDecoder
from .corpus_decode import decode_corpus

__all__ = [
    "levenshtein_distance",
    "phone_errors",
    "nist_phone_errors",
    "compute_per",
    "HmmImage",
    "load_image",
    "save_image",
    "make_synthetic_image",
    "ViterbiDecoder",
    "decode_corpus",
]
