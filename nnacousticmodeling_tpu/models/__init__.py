from .networks import (
    MLP, TDNN, LSTM, ZoneoutLSTM, ZoneoutDropoutLSTM, PeepholeLSTM,
    GRU, MGRUNet, get_network, is_recurrent,
)
from .rpl import RPL0, RPL1, RPL2, RPL3, RPL4, get_rpl
from .ensemble import Ensemble, stack_fold_params

__all__ = [
    "MLP", "TDNN", "LSTM", "ZoneoutLSTM", "ZoneoutDropoutLSTM",
    "PeepholeLSTM", "GRU", "MGRUNet", "get_network", "is_recurrent",
    "RPL0", "RPL1", "RPL2", "RPL3", "RPL4", "get_rpl",
    "Ensemble", "stack_fold_params",
]
