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


def _torch_adam(lr: float, b1: float, b2: float, eps: float,
                state_dtype=None):
    """torch.optim.Adam with structural-skip gating (see module docstring).

    State: m/v like Adam plus GROUP step counts — one scalar for all
    non-encoder params and one count per encoder (list of scalars, or an
    (E,) vector for scan-stacked storage) — torch keeps 'step' per param,
    and within a group every param steps together.

    ``update(..., enc_gates=None)`` is the plain torch-Adam fast path with
    zero gating overhead (identical math to optax.adam); passing the
    chain's (E,) executed flags engages the skip semantics. The training
    programs pass gates only for nan_skip='batch' — the one mode where the
    reference's torch optimizer can actually skip params.

    ``state_dtype``: storage dtype for the m/v moments (e.g.
    ``jnp.bfloat16``). Every Adam update streams the full optimizer state
    through HBM (read p,g,m,v + write p,m,v — the measured bottleneck of
    Adam training at scale, RESULTS.md roofline); bf16 moments cut that
    traffic by ~2/7 at a small, NON-torch-exact numerical difference.
    Default None keeps fp32 moments (reference-parity math).
    """

    def _enc_info(tree):
        enc = tree.get("encoders") if isinstance(tree, dict) else None
        if enc is None:
            return None, False
        return enc, not isinstance(enc, (list, tuple))

    def init(params):
        enc, stacked = _enc_info(params)
        if enc is None:
            t_enc = None
        elif stacked:
            E = jax.tree_util.tree_leaves(enc)[0].shape[0]
            t_enc = jnp.zeros((E,))
        else:
            t_enc = [jnp.zeros(()) for _ in enc]
        zeros = (jnp.zeros_like if state_dtype is None else
                 (lambda p: jnp.zeros(p.shape, state_dtype)))
        return {"m": jax.tree_util.tree_map(zeros, params),
                "v": jax.tree_util.tree_map(zeros, params),
                "t": jnp.zeros(()), "t_enc": t_enc}

    def _store(x, like):
        return x if state_dtype is None else x.astype(like.dtype)

    def _plain_leaf(g, m, v, c1, c2):
        mf, vf = m.astype(g.dtype), v.astype(g.dtype)
        m_new = b1 * mf + (1 - b1) * g
        v_new = b2 * vf + (1 - b2) * g * g
        upd = -lr * (m_new / c1) / (jnp.sqrt(v_new / c2) + eps)
        return upd, _store(m_new, m), _store(v_new, v)

    def _gated_leaf(g, m, v, c1, c2, gate):
        # m + gate*(1-b1)*(g-m) == gate ? b1*m+(1-b1)*g : m
        mf, vf = m.astype(g.dtype), v.astype(g.dtype)
        m_new = mf + gate * (1 - b1) * (g - mf)
        v_new = vf + gate * (1 - b2) * (g * g - vf)
        upd = -lr * gate * (m_new / c1) / (jnp.sqrt(v_new / c2) + eps)
        return upd, _store(m_new, m), _store(v_new, v)

    def update(grads, state, params=None, enc_gates=None):
        enc, stacked = _enc_info(grads)
        t_new = state["t"] + 1.0
        c1 = 1 - b1 ** t_new
        c2 = 1 - b2 ** t_new

        def sub_update(tree, m, v, fn, *args):
            flat, treedef = jax.tree_util.tree_flatten(tree)
            fm = treedef.flatten_up_to(m)
            fv = treedef.flatten_up_to(v)
            outs = [fn(g, mm, vv, *args) for g, mm, vv in zip(flat, fm, fv)]
            return (treedef.unflatten([o[0] for o in outs]),
                    treedef.unflatten([o[1] for o in outs]),
                    treedef.unflatten([o[2] for o in outs]))

        if enc_gates is None or enc is None:
            upd, m, v = sub_update(grads, state["m"], state["v"],
                                   _plain_leaf, c1, c2)
            t_enc = state["t_enc"]
            if t_enc is not None:
                one = jnp.ones(())
                t_enc = t_enc + 1.0 if not isinstance(t_enc, list) \
                    else [t + one for t in t_enc]
            return upd, {"m": m, "v": v, "t": t_new, "t_enc": t_enc}

        # Gated path: encoder groups follow their own executed-step counts.
        rest_g = dict(grads); rest_g.pop("encoders")
        rest_m = dict(state["m"]); rest_m.pop("encoders")
        rest_v = dict(state["v"]); rest_v.pop("encoders")
        upd_rest, m_rest, v_rest = sub_update(rest_g, rest_m, rest_v,
                                              _plain_leaf, c1, c2)
        if stacked:
            te_new = state["t_enc"] + enc_gates
            tc = jnp.maximum(te_new, 1.0)
            ec1 = 1 - b1 ** tc
            ec2 = 1 - b2 ** tc

            def bcast(x, leaf):
                return x.reshape((-1,) + (1,) * (leaf.ndim - 1))

            flat, treedef = jax.tree_util.tree_flatten(enc)
            fm = treedef.flatten_up_to(state["m"]["encoders"])
            fv = treedef.flatten_up_to(state["v"]["encoders"])
            outs = [_gated_leaf(g, mm, vv, bcast(ec1, g), bcast(ec2, g),
                                bcast(enc_gates, g))
                    for g, mm, vv in zip(flat, fm, fv)]
            upd_enc = treedef.unflatten([o[0] for o in outs])
            m_enc = treedef.unflatten([o[1] for o in outs])
            v_enc = treedef.unflatten([o[2] for o in outs])
        else:
            te_new, upd_enc, m_enc, v_enc = [], [], [], []
            for e, sub in enumerate(enc):
                gate = enc_gates[e]
                te = state["t_enc"][e] + gate
                tc = jnp.maximum(te, 1.0)
                u, m, v = sub_update(sub, state["m"]["encoders"][e],
                                     state["v"]["encoders"][e],
                                     _gated_leaf, 1 - b1 ** tc,
                                     1 - b2 ** tc, gate)
                te_new.append(te)
                upd_enc.append(u); m_enc.append(m); v_enc.append(v)
        updates = dict(upd_rest); updates["encoders"] = upd_enc
        m_out = dict(m_rest); m_out["encoders"] = m_enc
        v_out = dict(v_rest); v_out["encoders"] = v_enc
        return updates, {"m": m_out, "v": v_out, "t": t_new, "t_enc": te_new}

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
                 eps: float = 1e-8, state_dtype=None):
        super().__init__(_torch_adam(learning_rate, betas[0], betas[1], eps,
                                     state_dtype=state_dtype))
        # Structural signature: two Adam(0.01) instances build IDENTICAL
        # update programs, so experiment-level program caches
        # (experiments._cached_select_fit) may share traces across
        # same-hyperparameter optimizer objects.
        self.signature = ("adam", learning_rate, tuple(betas), eps,
                          str(state_dtype))


class AdamW(Optimizer):
    def __init__(self, learning_rate: float, betas: Tuple[float, float] = (0.9, 0.999),
                 eps: float = 1e-8, weight_decay: float = 0.01):
        super().__init__(optax.adamw(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                                     weight_decay=weight_decay))
        self.signature = ("adamw", learning_rate, tuple(betas), eps,
                          weight_decay)


class SGD(Optimizer):
    def __init__(self, learning_rate: float, momentum: float = 0.0):
        super().__init__(optax.sgd(learning_rate, momentum=momentum or None))
        self.signature = ("sgd", learning_rate, momentum)
