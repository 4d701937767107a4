"""Model layers (flax.nnx modules) built on the shared core DP kernels."""

from .common import Buffer, TrainMode
from .hmm_layer import GaussianHMMLayer, HMMLayer
from .mixture_gaussian import MixtureGaussianHMMLayer

__all__ = [
    "Buffer",
    "TrainMode",
    "HMMLayer",
    "GaussianHMMLayer",
    "MixtureGaussianHMMLayer",
]
