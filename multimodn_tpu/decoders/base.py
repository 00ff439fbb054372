"""Decoder contract (reference ``multimodn/decoders/multimod_decoder.py:7-16``):
a decoder maps ``state -> class scores``. Decoders expose ``n_classes``, which
the fusion core reads to decide binary-confusion-metric eligibility
(reference ``multimodn.py:153``)."""
from __future__ import annotations

from abc import ABC, abstractmethod

import jax.numpy as jnp


class MultiModDecoder(ABC):
    """Abstract decoder: ``apply(params, state) -> scores``."""

    n_classes: int

    def __init__(self, state_size: int):
        self.state_size = state_size

    @abstractmethod
    def init(self, key) -> dict:
        """Create this decoder's parameter pytree."""

    @abstractmethod
    def apply(self, params: dict, state: jnp.ndarray) -> jnp.ndarray:
        """Map states to class scores.

        ``state`` may carry arbitrary leading dims — the fusion core evaluates
        the full (E+1, B, S) state stack in one call so all (E+1)*D grid cells
        come from a single batched matmul per decoder.
        """
