"""MLP-family encoders.

Two distinct concat topologies exist in the reference and both are preserved:

- ``MLPEncoder`` (reference ``multimodn/encoders/mlp_encoder.py:49-80``):
  features flow through the hidden stack; the *state is concatenated only at
  the input of the last layer*, and the last layer has NO activation. With an
  empty hidden tuple this degenerates to a single no-activation layer over
  ``[x, state]`` — which means the activation argument of the SLP
  specializations is never applied (reference behavior, kept).
- ``MIMICMLPEncoder`` (reference ``mlp_encoder.py:9-47``): state concatenated
  at the *first* layer input, dropout before the first Linear, and the
  activation applied to EVERY layer including the last.
"""
from __future__ import annotations

from typing import Callable, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from multimodn_tpu.core.nn import (
    dense_apply,
    dense_init,
    dropout,
    mlp_init,
    resolve_activation,
)
from multimodn_tpu.encoders.base import MultiModEncoder


class MLPEncoder(MultiModEncoder):
    """MLP encoder with state concatenated at the last layer's input."""

    def __init__(
        self,
        state_size: int,
        n_features: int,
        hidden_layers: Union[Tuple[int, ...], Sequence[int]] = (),
        activation: Union[str, Callable] = "relu",
    ):
        super().__init__(state_size, n_features)
        self.hidden_layers = tuple(hidden_layers)
        self.activation = resolve_activation(activation)
        dims = [n_features] + list(self.hidden_layers) + [state_size]
        # State joins the input of the final layer only
        # (reference mlp_encoder.py:67-70).
        self._layer_dims = [
            (d_in + (state_size if i == len(dims) - 2 else 0), d_out)
            for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:]))
        ]

    def init(self, key) -> dict:
        keys = jax.random.split(key, len(self._layer_dims))
        return {"layers": [dense_init(k, i, o)
                           for k, (i, o) in zip(keys, self._layer_dims)]}

    def apply(self, params, state, x, *, train=False, rng=None):
        layers = params["layers"]
        for layer in layers[:-1]:
            x = self.activation(dense_apply(layer, x))
        # No activation on the output layer (reference mlp_encoder.py:74-79).
        return dense_apply(layers[-1], jnp.concatenate([x, state], axis=-1))


class MLPFeatureEncoder(MLPEncoder):
    """Single-feature MLP encoder for featurewise fusion
    (reference ``mlp_encoder.py:81-94``)."""

    def __init__(self, state_size: int, hidden_size: int,
                 activation: Union[str, Callable] = "relu"):
        super().__init__(state_size, 1, (hidden_size,), activation)


class MIMICMLPEncoder(MultiModEncoder):
    """MIMIC variant: first-layer state concat, dropout, activation everywhere
    (reference ``mlp_encoder.py:9-47``)."""

    def __init__(
        self,
        state_size: int,
        n_features: int,
        hidden_layers: Union[Tuple[int, ...], Sequence[int]] = (),
        dropout: float = 0.2,
        activation: Union[str, Callable] = "relu",
    ):
        super().__init__(state_size, n_features)
        self.hidden_layers = tuple(hidden_layers)
        self.dropout_rate = float(dropout)
        self.activation = resolve_activation(activation)
        n_concat = n_features + state_size
        self._dims = [n_concat] + list(self.hidden_layers) + [state_size]

    def init(self, key) -> dict:
        return {"layers": mlp_init(key, self._dims)}

    def apply(self, params, state, x, *, train=False, rng=None):
        x = jnp.concatenate([x, state], axis=-1)
        x = dropout(x, self.dropout_rate, rng, train)
        for layer in params["layers"]:
            # Activation applied to every layer incl. the last (mlp_encoder.py:40-47).
            x = self.activation(dense_apply(layer, x))
        return x

    @property
    def stochastic(self) -> bool:
        return self.dropout_rate > 0.0


# Backwards-friendly alias matching the reference class name spelling.
MIMIC_MLPEncoder = MIMICMLPEncoder
