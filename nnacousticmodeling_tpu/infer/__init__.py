from .posteriors import (
    ff_log_posteriors,
    rnn_log_posteriors,
    ensemble_log_posteriors,
)

__all__ = [
    "ff_log_posteriors",
    "rnn_log_posteriors",
    "ensemble_log_posteriors",
]
