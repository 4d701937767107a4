"""Model layers (flax.nnx modules) built on the shared core DP kernels."""

from .common import Buffer, TrainMode
from .hmm_layer import GaussianHMMLayer, HMMLayer
from .hsmm import DurationConstrainedHMM, HSMMLayer
from .mixture_gaussian import MixtureGaussianHMMLayer
from .neural import (
    ContextualNeuralHMM,
    NeuralHMM,
    NeuralObservationModel,
    NeuralTransitionModel,
)
from .semi_markov import AdaptiveDurationHSMM, DurationModel, SemiMarkovHMM

__all__ = [
    "Buffer",
    "TrainMode",
    "HMMLayer",
    "GaussianHMMLayer",
    "MixtureGaussianHMMLayer",
    "HSMMLayer",
    "DurationConstrainedHMM",
    "DurationModel",
    "SemiMarkovHMM",
    "AdaptiveDurationHSMM",
    "NeuralTransitionModel",
    "NeuralObservationModel",
    "NeuralHMM",
    "ContextualNeuralHMM",
]
