"""Solver cores: the stable public entry points for library users."""

from . import dadmm_core, seq_hyperparam
from .classic import DADMMLASSOClassic, DADMMLRClassic
from .gnn_hypernet import (DLASSOGNNHyp, DLASSOGNNHypOneShot,
                           DLASSOGNNHypOneShotCorrected)
from .unfolded import UnfoldedDLASSO
from .unfolded_dlr import (DLRGNNHyp, DLRGNNHypOneShot,
                           DLRGNNHypOneShotCorrected, UnfoldedDLR)

__all__ = [
    "dadmm_core", "seq_hyperparam", "DADMMLASSOClassic", "DADMMLRClassic",
    "DLASSOGNNHyp", "DLASSOGNNHypOneShot", "DLASSOGNNHypOneShotCorrected",
    "UnfoldedDLASSO", "DLRGNNHyp", "DLRGNNHypOneShot",
    "DLRGNNHypOneShotCorrected", "UnfoldedDLR",
]
