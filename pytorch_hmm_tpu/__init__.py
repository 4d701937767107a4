"""pytorch_hmm_tpu — TPU-native HMM speech-processing framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``crlotwhite/pytorch_hmm``: log-domain HMM inference, GMM/neural emission
models, explicit-duration HSMMs, streaming decoding, DTW/CTC alignment and
speech metrics — designed TPU-first (scan/associative-scan kernels, SPMD
sharding over device meshes, static shapes throughout).

The public API mirrors the reference package's surface
(``pytorch_hmm/__init__.py:101-175``) so reference users can migrate
without relearning names.
"""

from __future__ import annotations

__version__ = "0.1.0"

from .hmm import HMM, HMMJax, HMMPyTorch
from . import core
from . import durations
from . import alignment
from .alignment import (
    CTCAligner,
    CTCSegmentationAligner,
    ConstrainedDTWAligner,
    DTWAligner,
    ctc_alignment_path,
    dtw_alignment,
)
from .models import (
    AdaptiveDurationHSMM,
    ContextualNeuralHMM,
    DurationConstrainedHMM,
    DurationModel,
    GaussianHMMLayer,
    HMMLayer,
    HSMMLayer,
    MixtureGaussianHMMLayer,
    NeuralHMM,
    NeuralObservationModel,
    NeuralTransitionModel,
    SemiMarkovHMM,
)
from .utils import (
    AdaptiveTransitionMatrix,
    AttentionTransition,
    align_sequences,
    analyze_transition_patterns,
    benchmark_transition_operations,
    compute_state_durations,
    create_attention_based_transitions,
    create_duration_constrained_matrix,
    create_gaussian_observation_model,
    create_hierarchical_transitions,
    create_left_to_right_matrix,
    create_phoneme_aware_transitions,
    create_prosody_aware_transitions,
    create_skip_state_matrix,
    create_transition_matrix,
    gaussian_log_likelihood,
    interpolate_features,
    optimize_transition_matrix,
    validate_transition_matrix,
)

__all__ = [
    "__version__",
    "HMM",
    "HMMJax",
    "HMMPyTorch",
    "core",
    "durations",
    # model layers
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
    # alignment
    "alignment",
    "DTWAligner",
    "ConstrainedDTWAligner",
    "CTCAligner",
    "CTCSegmentationAligner",
    "dtw_alignment",
    "ctc_alignment_path",
    # utils
    "AdaptiveTransitionMatrix",
    "AttentionTransition",
    "align_sequences",
    "analyze_transition_patterns",
    "benchmark_transition_operations",
    "compute_state_durations",
    "create_attention_based_transitions",
    "create_duration_constrained_matrix",
    "create_gaussian_observation_model",
    "create_hierarchical_transitions",
    "create_left_to_right_matrix",
    "create_phoneme_aware_transitions",
    "create_prosody_aware_transitions",
    "create_skip_state_matrix",
    "create_transition_matrix",
    "gaussian_log_likelihood",
    "interpolate_features",
    "optimize_transition_matrix",
    "validate_transition_matrix",
]
