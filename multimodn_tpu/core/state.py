"""Initial-state providers for the shared fusion state vector.

Mirrors the reference hierarchy (reference ``multimodn/state.py:8-47``):

- ``TrainableInitState``: a learnable ``(1, state_size)`` parameter broadcast
  to ``(batch, state_size)`` (reference ``state.py:25-30``). In this framework
  the parameter lives in the model's pytree under ``params["init_state"]`` and
  broadcasting happens inside the jitted step.
- ``StaticInitState``: a fixed bank of state vectors handed out round-robin.
  The reference uses a stateful ``itertools.cycle`` (``state.py:41``) shared
  for the model's lifetime; here the cycling is a deterministic modular gather
  driven by a sample-index counter so it stays a pure function of
  (params, counter) and jit-compiles. The model threads its cumulative
  sample count (``MultiModN._cycle_offset``) into every program as the base
  offset, so the phase continues across batches, epochs, and
  train/test/predict calls exactly like the reference's shared iterator.
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


class InitState(ABC):
    """Provides the state vector each sample starts the encoder chain with."""

    def __init__(self, state_size: int):
        self.state_size = state_size

    @abstractmethod
    def init(self, key) -> dict:
        """Create the (possibly empty) parameter pytree."""

    @abstractmethod
    def apply(self, params: dict, batch_size: int, offset) -> jnp.ndarray:
        """Return the (batch_size, state_size) initial state.

        ``offset`` is the number of samples already served (traced scalar) —
        only ``StaticInitState`` consumes it, for cycle parity.
        """

    @property
    def trainable(self) -> bool:
        return False


class TrainableInitState(InitState):
    """Learnable (1, state_size) parameter tiled across the batch."""

    def init(self, key) -> dict:
        return {"value": jax.random.normal(key, (1, self.state_size), jnp.float32)}

    def apply(self, params, batch_size, offset) -> jnp.ndarray:
        return jnp.broadcast_to(params["value"], (batch_size, self.state_size))

    @property
    def trainable(self) -> bool:
        return True


class StaticInitState(InitState):
    """Cycles a fixed list of states, detached from the gradient path.

    The reference's ``itertools.cycle`` (``state.py:41``) advances one state per
    *sample*; we reproduce that with ``(offset + arange(B)) % n_states``.
    """

    def __init__(self, states: Sequence):
        bank = np.stack([np.asarray(s, dtype=np.float32).reshape(-1) for s in states])
        super().__init__(bank.shape[1])
        self._bank = jnp.asarray(bank)

    def init(self, key) -> dict:
        return {}

    def apply(self, params, batch_size, offset) -> jnp.ndarray:
        offset = jnp.asarray(offset).astype(jnp.int32)
        idx = (offset + jnp.arange(batch_size)) % self._bank.shape[0]
        return jax.lax.stop_gradient(jnp.take(self._bank, idx, axis=0))
