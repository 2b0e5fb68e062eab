from .splice import splice_flat, splice_utts, window_batch
from .timedelay import apply_time_delay
from .numerics import log_softmax, ref_logsum

__all__ = [
    "splice_flat",
    "splice_utts",
    "window_batch",
    "apply_time_delay",
    "log_softmax",
    "ref_logsum",
]
