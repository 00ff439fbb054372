"""LSTM / RNN encoders as ``lax.scan`` recurrences.

Reference: ``multimodn/encoders/lstm_encoder.py`` and ``rnn_encoder.py`` — a
stack of recurrent layers where hidden layers transform the features and the
fusion state is concatenated into the last layer's input.

**Reference quirk, replicated behind a flag** (SURVEY quirk #8): the shipped
pipelines feed 2-D ``(batch, features)`` tensors to ``nn.LSTM/nn.RNN
(batch_first=True)``, which torch >= 1.11 treats as *unbatched* ``(seq,
feature)`` — the recurrence runs ACROSS batch elements, so each sample's output
depends on the samples before it in the batch. ``unbatched_compat=True``
(default, for behavioral parity) reproduces that with a ``lax.scan`` over the
batch dimension. ``unbatched_compat=False`` gives the sane batched semantics:
``(B, F)`` is a length-1 sequence per sample (or pass ``(B, L, F)`` for real
sequences) and the last time step's output is returned.

Cell equations and parameter shapes match torch (``nn.LSTM``/``nn.RNN``):
gates ordered i, f, g, o; weights ``w_ih (in, 4H)``, ``w_hh (H, 4H)`` (stored
transposed for ``x @ w``), biases ``b_ih``, ``b_hh``; init U(±1/sqrt(H)).
"""
from __future__ import annotations

from typing import Callable, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from multimodn_tpu.core.nn import resolve_activation, _uniform
from multimodn_tpu.encoders.base import MultiModEncoder


def _rnn_layer_init(key, in_dim: int, hidden: int, gates: int) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / (hidden ** 0.5)
    g = gates * hidden
    return {
        "w_ih": _uniform(k1, (in_dim, g), bound, jnp.float32),
        "w_hh": _uniform(k2, (hidden, g), bound, jnp.float32),
        "b_ih": _uniform(k3, (g,), bound, jnp.float32),
        "b_hh": _uniform(k4, (g,), bound, jnp.float32),
    }


def _lstm_cell(params, x_t, h, c):
    gates = x_t @ params["w_ih"] + params["b_ih"] + h @ params["w_hh"] + params["b_hh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    c = f * c + i * jnp.tanh(g)
    h = o * jnp.tanh(c)
    return h, c


def _rnn_cell(params, x_t, h):
    return jnp.tanh(
        x_t @ params["w_ih"] + params["b_ih"] + h @ params["w_hh"] + params["b_hh"]
    )


def _lstm_seq(params, xs, hidden: int):
    """Run an LSTM over ``xs`` with time on axis 0. xs: (T, ..., in) ->
    outputs (T, ..., hidden)."""
    batch_shape = xs.shape[1:-1]
    h0 = jnp.zeros(batch_shape + (hidden,), xs.dtype)

    def step(carry, x_t):
        h, c = carry
        h, c = _lstm_cell(params, x_t, h, c)
        return (h, c), h

    _, out = jax.lax.scan(step, (h0, h0), xs)
    return out


def _rnn_seq(params, xs, hidden: int):
    batch_shape = xs.shape[1:-1]
    h0 = jnp.zeros(batch_shape + (hidden,), xs.dtype)

    def step(h, x_t):
        h = _rnn_cell(params, x_t, h)
        return h, h

    _, out = jax.lax.scan(step, h0, xs)
    return out


class _RecurrentEncoder(MultiModEncoder):
    """Shared implementation for LSTM/RNN encoder stacks."""

    _GATES: int = 1  # overridden

    def __init__(
        self,
        state_size: int,
        n_features: int,
        hidden_layers: Union[Tuple[int, ...], Sequence[int]],
        activation: Union[str, Callable] = "relu",
        unbatched_compat: bool = True,
    ):
        super().__init__(state_size, n_features)
        self.hidden_layers = tuple(hidden_layers)
        self.activation = resolve_activation(activation)
        self.unbatched_compat = unbatched_compat
        dims = [n_features] + list(self.hidden_layers) + [state_size]
        # State joins the input of the final recurrent layer
        # (reference lstm_encoder.py:28, rnn_encoder.py:28).
        self._layer_dims = [
            (d_in + (state_size if i == len(dims) - 2 else 0), d_out)
            for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:]))
        ]

    def init(self, key) -> dict:
        keys = jax.random.split(key, len(self._layer_dims))
        return {
            "layers": [
                _rnn_layer_init(k, d_in, d_out, self._GATES)
                for k, (d_in, d_out) in zip(keys, self._layer_dims)
            ]
        }

    def _run_layer(self, params, xs, hidden):
        raise NotImplementedError

    def apply(self, params, state, x, *, train=False, rng=None):
        layers = params["layers"]
        if self.unbatched_compat and x.ndim == 2:
            # Parity mode: (B, F) is ONE sequence of length B — recurrence runs
            # across the batch, matching torch's unbatched interpretation.
            for p, (_, hid) in zip(layers[:-1], self._layer_dims[:-1]):
                x = self.activation(self._run_layer(p, x, hid))
            xs = jnp.concatenate([x, state], axis=-1)
            return self._run_layer(layers[-1], xs, self._layer_dims[-1][1])
        # Batched mode: x is (B, F) -> length-1 sequence, or (B, T, F).
        seq = x if x.ndim == 3 else x[:, None, :]
        seq = jnp.swapaxes(seq, 0, 1)  # (T, B, F): scan over time
        for p, (_, hid) in zip(layers[:-1], self._layer_dims[:-1]):
            seq = self.activation(self._run_layer(p, seq, hid))
        state_seq = jnp.broadcast_to(state[None], (seq.shape[0],) + state.shape)
        seq = jnp.concatenate([seq, state_seq], axis=-1)
        out = self._run_layer(layers[-1], seq, self._layer_dims[-1][1])
        return out[-1]  # last time step


class LSTMEncoder(_RecurrentEncoder):
    """LSTM encoder (reference ``lstm_encoder.py:8-39``)."""

    _GATES = 4

    def _run_layer(self, params, xs, hidden):
        return _lstm_seq(params, xs, hidden)


class RNNEncoder(_RecurrentEncoder):
    """Vanilla (tanh) RNN encoder (reference ``rnn_encoder.py:8-39``)."""

    _GATES = 1

    def _run_layer(self, params, xs, hidden):
        return _rnn_seq(params, xs, hidden)


class LSTMFeatureEncoder(LSTMEncoder):
    """Single-feature LSTM encoder (reference ``lstm_encoder.py:41-53``)."""

    def __init__(self, state_size: int, hidden_size: int,
                 activation: Union[str, Callable] = "relu",
                 unbatched_compat: bool = True):
        super().__init__(state_size, 1, (hidden_size,), activation, unbatched_compat)


class RNNFeatureEncoder(RNNEncoder):
    """Single-feature RNN encoder (reference ``rnn_encoder.py:41-53``)."""

    def __init__(self, state_size: int, hidden_size: int,
                 activation: Union[str, Callable] = "relu",
                 unbatched_compat: bool = True):
        super().__init__(state_size, 1, (hidden_size,), activation, unbatched_compat)
