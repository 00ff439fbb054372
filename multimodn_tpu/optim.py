"""Optimizers: thin optax wrappers with torch-default hyperparameters.

The reference pipelines construct ``torch.optim.Adam(model.parameters(), lr)``
(e.g. ``titanic_mlp_pipeline.py:74``); ``Adam`` here matches torch's update
rule (optax.adam with eps outside the sqrt) and default betas/eps.
"""
from __future__ import annotations

from typing import Tuple

import optax


class Optimizer:
    """Holds the optax GradientTransformation; the model owns the opt state."""

    def __init__(self, tx: optax.GradientTransformation):
        self.tx = tx

    def init(self, params):
        return self.tx.init(params)

    def update(self, grads, opt_state, params):
        return self.tx.update(grads, opt_state, params)


class Adam(Optimizer):
    def __init__(self, learning_rate: float, betas: Tuple[float, float] = (0.9, 0.999),
                 eps: float = 1e-8):
        super().__init__(optax.adam(learning_rate, b1=betas[0], b2=betas[1], eps=eps))


class AdamW(Optimizer):
    def __init__(self, learning_rate: float, betas: Tuple[float, float] = (0.9, 0.999),
                 eps: float = 1e-8, weight_decay: float = 0.01):
        super().__init__(optax.adamw(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                                     weight_decay=weight_decay))


class SGD(Optimizer):
    def __init__(self, learning_rate: float, momentum: float = 0.0):
        super().__init__(optax.sgd(learning_rate, momentum=momentum or None))
