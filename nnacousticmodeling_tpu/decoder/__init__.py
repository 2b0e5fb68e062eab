from .score import levenshtein_distance, phone_errors, nist_phone_errors, compute_per
from .image import HmmImage, load_image, save_image, make_synthetic_image
from .viterbi import ViterbiDecoder

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
]
