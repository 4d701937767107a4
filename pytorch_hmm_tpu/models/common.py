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

    def _set_mode(self, training: bool):
        for _, node in nnx.iter_graph(self):
            if isinstance(node, TrainMode):
                node._training = training

    def train(self):
        """Enter training mode, recursively (torch ``Module.train``)."""
        self._set_mode(True)
        return self

    def eval(self):
        """Enter eval mode, recursively (torch ``Module.eval``)."""
        self._set_mode(False)
        return self

    @property
    def training(self) -> bool:
        return self._training
