"""Optimizers: optax-compatible transformations with torch-default
hyperparameters AND torch's structural-skip semantics.

The reference pipelines construct ``torch.optim.Adam(model.parameters(), lr)``
(e.g. ``titanic_mlp_pipeline.py:74``) and call ``optimizer.zero_grad()``
(set_to_none in torch >= 2.0) before each backward. When an encoder is
NaN-skipped for a batch (``multimodn.py:167-169``) its parameters never enter
that batch's graph, their ``.grad`` stays ``None``, and **torch Adam skips
them entirely** — no moment decay, no per-parameter step-count increment.
A plain optax.adam instead applies a zero-gradient step (moments decay,
momentum keeps pushing the params), which drifts from the reference whenever
NaN-skipped batches interleave with real updates (caught by the randomized
reference-oracle soak, tests/test_reference_oracle.py).

``Adam`` therefore uses a torch-exact implementation with PER-ENCODER-GROUP
gating driven by the chain's OWN execution flags (aux row_ok, threaded by
the training programs): a NaN-skipped encoder's moments and per-group step
count stay frozen, exactly like torch's None-grad skip. Ungated groups
follow torch's update rule (m/v with bias correction, eps outside the
sqrt). With no skipped encoders the math equals optax.adam.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax


def _gate_tree(params, flags, is_stacked):
    """Pytree of per-leaf gates (broadcastable to each leaf): encoder-group
    leaves get their encoder's flag; everything else gets 1."""
    ones = jax.tree_util.tree_map(lambda p: jnp.ones(()), params)
    if flags is None:
        return ones
    if is_stacked:
        gates_enc = jax.tree_util.tree_map(
            lambda p: flags.reshape((-1,) + (1,) * (p.ndim - 1)),
            params["encoders"])
    else:
        gates_enc = [jax.tree_util.tree_map(lambda p, f=f: f, sub)
                     for f, sub in zip(flags, params["encoders"])]
    out = dict(ones)
    out["encoders"] = gates_enc
    return out


def _torch_adam(lr: float, b1: float, b2: float, eps: float):
    """torch.optim.Adam with structural-skip gating (see module docstring).

    State: m/v like Adam plus a per-leaf step count with the GATE's shape
    (scalar, or (E,) for stacked encoder leaves) so bias correction follows
    each group's own number of real updates — torch keeps 'step' per param.
    """

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        enc = params.get("encoders") if isinstance(params, dict) else None
        stacked = isinstance(params, dict) and "encoders" in params and \
            not isinstance(enc, (list, tuple))

        def t_init(p):
            return jnp.zeros(())

        if stacked:
            t = jax.tree_util.tree_map(t_init, params)
            t = dict(t)
            t["encoders"] = jax.tree_util.tree_map(
                lambda p: jnp.zeros((p.shape[0],) + (1,) * (p.ndim - 1)),
                params["encoders"])
        else:
            t = jax.tree_util.tree_map(t_init, params)
        return {"m": jax.tree_util.tree_map(jnp.zeros_like, params),
                "v": z, "t": t}

    def update(grads, state, params=None, enc_gates=None):
        # enc_gates: (E,) per-encoder executed flags from the chain (the
        # training programs thread aux row_ok through gated_update). None ->
        # no gating (plain torch-Adam math). Inferring gates from zero grads
        # would misfire on attached-but-dead-ReLU encoders, which torch DOES
        # step — the chain's own execution signal is the ground truth.
        if enc_gates is None or not isinstance(grads, dict) or \
                "encoders" not in grads:
            flags, is_stacked = None, False
        else:
            enc = grads["encoders"]
            if isinstance(enc, (list, tuple)):
                flags = [enc_gates[e] for e in range(len(enc))]
                is_stacked = False
            else:
                flags = enc_gates
                is_stacked = True
        gates = _gate_tree(grads, flags, is_stacked)

        def leaf(g, m, v, t, gate):
            t_new = t + gate
            m_new = gate * (b1 * m + (1 - b1) * g) + (1 - gate) * m
            v_new = gate * (b2 * v + (1 - b2) * g * g) + (1 - gate) * v
            tc = jnp.maximum(t_new, 1.0)
            m_hat = m_new / (1 - b1 ** tc)
            v_hat = v_new / (1 - b2 ** tc)
            upd = -lr * m_hat / (jnp.sqrt(v_hat) + eps) * gate
            return upd, m_new, v_new, t_new

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_m = treedef.flatten_up_to(state["m"])
        flat_v = treedef.flatten_up_to(state["v"])
        flat_t = treedef.flatten_up_to(state["t"])
        flat_gate = treedef.flatten_up_to(gates)
        outs = [leaf(g, m, v, t, gate) for g, m, v, t, gate
                in zip(flat_g, flat_m, flat_v, flat_t, flat_gate)]
        updates = treedef.unflatten([o[0] for o in outs])
        new_state = {"m": treedef.unflatten([o[1] for o in outs]),
                     "v": treedef.unflatten([o[2] for o in outs]),
                     "t": treedef.unflatten([o[3] for o in outs])}
        return updates, new_state

    return optax.GradientTransformation(init, update)


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
        super().__init__(_torch_adam(learning_rate, betas[0], betas[1], eps))


class AdamW(Optimizer):
    def __init__(self, learning_rate: float, betas: Tuple[float, float] = (0.9, 0.999),
                 eps: float = 1e-8, weight_decay: float = 0.01):
        super().__init__(optax.adamw(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                                     weight_decay=weight_decay))


class SGD(Optimizer):
    def __init__(self, learning_rate: float, momentum: float = 0.0):
        super().__init__(optax.sgd(learning_rate, momentum=momentum or None))
