"""Shared plumbing for model layers (flax.nnx based).

The reference layers are ``torch.nn.Module``s; here they are ``nnx.Module``s
— PyTorch-like construction and call syntax, but with explicit, pytree-able
state that drops straight into ``jax.jit`` / ``pjit`` / optax.
"""

from __future__ import annotations

from flax import nnx

__all__ = ["Buffer", "TrainMode"]


class Buffer(nnx.Variable):
    """Non-trainable module state (torch ``register_buffer`` analog).

    Tracked by nnx state so it shards/checkpoints with the model, but
    excluded from ``nnx.Param`` filters so optimizers never touch it.
    """


class TrainMode(nnx.Module):
    """Mixin giving layers a torch-style train/eval switch.

    The flag is plain Python state: reading it at trace time specializes the
    compiled graph (train → forward-backward, eval → Viterbi), exactly like
    the reference's ``self.training`` branch (``hmm_layer.py:119-131``).
    """

    _training: bool = True

    def train(self):
        self._training = True
        return self

    def eval(self):
        self._training = False
        return self

    @property
    def training(self) -> bool:
        return self._training
