"""Single-layer perceptron encoder specializations.

Reference ``multimodn/encoders/slp_encoders.py:5-34``. Note: with an empty
hidden tuple, ``MLPEncoder`` never applies its activation (the only layer is
the unactivated output layer) — so ``SLPEncoder``'s sigmoid and
``LogisticEncoder``'s sigmoid are accepted but inert, exactly as in the
reference. Kept for API parity; documented here so nobody "fixes" it silently.
"""
from __future__ import annotations

from typing import Callable, Union

from multimodn_tpu.encoders.mlp import MLPEncoder


class SLPEncoder(MLPEncoder):
    """Single Layer Perceptron encoder (reference slp_encoders.py:5-14)."""

    def __init__(self, state_size: int, n_features: int,
                 activation: Union[str, Callable] = "sigmoid"):
        super().__init__(state_size, n_features, (), activation)


class LinearEncoder(SLPEncoder):
    """Linear encoder (reference slp_encoders.py:16-24)."""

    def __init__(self, state_size: int, n_features: int):
        super().__init__(state_size, n_features, "identity")


class LogisticEncoder(SLPEncoder):
    """Logistic encoder (reference slp_encoders.py:26-34)."""

    def __init__(self, state_size: int, n_features: int):
        super().__init__(state_size, n_features, "sigmoid")
