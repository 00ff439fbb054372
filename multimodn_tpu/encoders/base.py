"""Encoder contract for MultiModN-TPU.

Mirrors the reference contract (reference
``multimodn/encoders/multimod_encoder.py:8-17``): an encoder maps
``(state, modality_input) -> new_state``. Here encoders are *static config*
objects whose parameters live in a separate pytree, so the fusion core can jit,
grad, shard, and (for homogeneous chains) stack them for ``lax.scan``.
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Optional

import jax.numpy as jnp


class MultiModEncoder(ABC):
    """Abstract encoder: ``apply(params, state, x) -> state``."""

    def __init__(self, state_size: int, n_features: Optional[int] = None):
        self.state_size = state_size
        self.n_features = n_features

    @abstractmethod
    def init(self, key) -> dict:
        """Create this encoder's parameter pytree."""

    @abstractmethod
    def apply(self, params: dict, state: jnp.ndarray, x: jnp.ndarray, *,
              train: bool = False, rng=None) -> jnp.ndarray:
        """Advance the fusion state with one modality's features.

        Args:
            params: pytree produced by ``init``.
            state: (B, state_size) current fusion state.
            x: (B, n_features) modality features (NaNs already zero-filled by
               the fusion core; validity is handled by masks outside).
            train: enables stochastic layers (dropout).
            rng: PRNG key for stochastic layers, required when train=True and
                 the encoder has any.
        Returns:
            (B, state_size) updated state.
        """

    @property
    def stochastic(self) -> bool:
        """Whether apply() consumes rng during training (e.g. dropout)."""
        return False
