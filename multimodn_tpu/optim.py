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

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax


class FusedGradientTransformation(NamedTuple):
    """An optax-style transformation with a fused update+apply entry point.

    ``fused_apply(grads, state, params, enc_gates=None) -> (new_params,
    new_state)`` replaces the usual ``update`` + ``apply_updates`` pair so a
    kernel can write the new parameters directly (one HBM pass instead of
    two). ``core.step.gated_update`` dispatches on the presence of this
    field; ``init``/``update`` keep the plain optax protocol for callers
    that need it (HAIM baseline, shard_map engine, user code).
    """
    init: Callable
    update: Callable
    fused_apply: Callable


def _enc_info(tree):
    """(encoders subtree, is_scan_stacked) — None when params have no
    encoder group (e.g. the HAIM baseline's flat param dict)."""
    enc = tree.get("encoders") if isinstance(tree, dict) else None
    if enc is None:
        return None, False
    return enc, not isinstance(enc, (list, tuple))


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


def _adam8bit(lr: float, b1: float, b2: float, eps: float, mode: str,
              fmt: str = "fp8"):
    """8-bit blockwise-quantized torch-Adam (see ops/fused_adam.py).

    State: 8-bit moment codes + per-row fp32 scales per leaf ({"mq","ms",
    "vq","vs"}) plus the same global/per-encoder-group step counts as
    ``_torch_adam`` ("t"/"t_enc") so the structural-skip gating semantics
    are identical (enforced by the identity-quantization equivalence test
    in tests/test_adam8bit.py — keep the two gated drivers in sync).
    ``fused_apply`` dispatches per ``mode`` (default: the XLA path, the
    measured optimum on v5e; mode='pallas' forces the one-HBM-pass
    kernel); the gated path and ``update`` use the bit-identical jnp math.
    """
    from multimodn_tpu.ops import fused_adam as fa

    def init(params):
        enc, stacked = _enc_info(params)
        if enc is None:
            t_enc = None
        elif stacked:
            E = jax.tree_util.tree_leaves(enc)[0].shape[0]
            t_enc = jnp.zeros((E,))
        else:
            t_enc = [jnp.zeros(()) for _ in enc]
        tm = jax.tree_util.tree_map
        qdt = fa.code_dtype(fmt)
        return {
            "mq": tm(lambda p: jnp.zeros(p.shape, qdt), params),
            "ms": tm(lambda p: jnp.zeros(fa.scale_shape(p.shape),
                                         jnp.float32), params),
            "vq": tm(lambda p: jnp.zeros(p.shape, qdt), params),
            "vs": tm(lambda p: jnp.zeros(fa.scale_shape(p.shape),
                                         jnp.float32), params),
            "t": jnp.zeros(()), "t_enc": t_enc,
        }

    def _bcast(x, leaf):
        return x.reshape((-1,) + (1,) * (leaf.ndim - 1))

    def _walk(op, tree, grads, smq, sms, svq, svs, *extra):
        """Apply op over aligned leaves; returns (out, mq, ms, vq, vs) trees.
        ``tree`` supplies the structure (params for fused, grads for
        protocol updates)."""
        flat, td = jax.tree_util.tree_flatten(tree)
        fg = td.flatten_up_to(grads)
        fmq = td.flatten_up_to(smq)
        fms = td.flatten_up_to(sms)
        fvq = td.flatten_up_to(svq)
        fvs = td.flatten_up_to(svs)
        outs = [op(a, g, mq, ms, vq, vs, *extra)
                for a, g, mq, ms, vq, vs in zip(flat, fg, fmq, fms, fvq, fvs)]
        return tuple(td.unflatten([o[i] for o in outs]) for i in range(5))

    def _run(grads, state, params, enc_gates, fused: bool):
        """Shared driver: returns (new_params | updates, new_state)."""
        t_new = state["t"] + 1.0
        c1 = 1 - b1 ** t_new
        c2 = 1 - b2 ** t_new
        enc, stacked = _enc_info(grads)

        def plain_op(a, g, mq, ms, vq, vs):
            if fused:
                c12 = jnp.stack([c1, c2]).reshape(1, 2).astype(jnp.float32)
                return fa.leaf_update(a, g, mq, ms, vq, vs, c12, lr=lr,
                                      b1=b1, b2=b2, eps=eps, mode=mode,
                                      fmt=fmt)
            return fa.moment_update(g, mq, ms, vq, vs, c1, c2,
                                    lr, b1, b2, eps, fmt=fmt)

        if enc_gates is None or enc is None:
            out, mq, ms, vq, vs = _walk(
                plain_op, params if fused else grads, grads,
                state["mq"], state["ms"], state["vq"], state["vs"])
            t_enc = state["t_enc"]
            if t_enc is not None:
                one = jnp.ones(())
                t_enc = t_enc + 1.0 if not isinstance(t_enc, list) \
                    else [t + one for t in t_enc]
            return out, {"mq": mq, "ms": ms, "vq": vq, "vs": vs,
                         "t": t_new, "t_enc": t_enc}

        # Gated path: encoder groups follow their own executed-step counts.
        def sub(tree):
            rest = dict(tree)
            rest.pop("encoders")
            return rest

        rest_tree = sub(params) if fused else sub(grads)
        out_r, mq_r, ms_r, vq_r, vs_r = _walk(
            plain_op, rest_tree, sub(grads), sub(state["mq"]),
            sub(state["ms"]), sub(state["vq"]), sub(state["vs"]))

        def gated_op(ec1, ec2, gate):
            def op(a, g, mq, ms, vq, vs):
                gc1, gc2, gg = ((_bcast(ec1, g), _bcast(ec2, g),
                                 _bcast(gate, g)) if ec1.ndim else
                                (ec1, ec2, gate))
                if fused:
                    return fa._leaf_update_xla(a, g, mq, ms, vq, vs, gc1,
                                               gc2, lr, b1, b2, eps,
                                               gate=gg, fmt=fmt)
                return fa.moment_update(g, mq, ms, vq, vs, gc1, gc2,
                                        lr, b1, b2, eps, gate=gg, fmt=fmt)
            return op

        if stacked:
            te_new = state["t_enc"] + enc_gates
            tc = jnp.maximum(te_new, 1.0)
            op = gated_op(1 - b1 ** tc, 1 - b2 ** tc, enc_gates)
            enc_tree = params["encoders"] if fused else grads["encoders"]
            out_e, mq_e, ms_e, vq_e, vs_e = _walk(
                op, enc_tree, grads["encoders"], state["mq"]["encoders"],
                state["ms"]["encoders"], state["vq"]["encoders"],
                state["vs"]["encoders"])
        else:
            te_new, out_e, mq_e, ms_e, vq_e, vs_e = [], [], [], [], [], []
            for e in range(len(enc)):
                gate = enc_gates[e]
                te = state["t_enc"][e] + gate
                tc = jnp.maximum(te, 1.0)
                op = gated_op(1 - b1 ** tc, 1 - b2 ** tc, gate)
                enc_tree = (params["encoders"][e] if fused
                            else grads["encoders"][e])
                o, mqe, mse, vqe, vse = _walk(
                    op, enc_tree, grads["encoders"][e],
                    state["mq"]["encoders"][e], state["ms"]["encoders"][e],
                    state["vq"]["encoders"][e], state["vs"]["encoders"][e])
                te_new.append(te)
                out_e.append(o); mq_e.append(mqe); ms_e.append(mse)
                vq_e.append(vqe); vs_e.append(vse)

        def merge(rest, encs):
            out = dict(rest)
            out["encoders"] = encs
            return out

        return (merge(out_r, out_e),
                {"mq": merge(mq_r, mq_e), "ms": merge(ms_r, ms_e),
                 "vq": merge(vq_r, vq_e), "vs": merge(vs_r, vs_e),
                 "t": t_new, "t_enc": te_new})

    def update(grads, state, params=None, enc_gates=None):
        return _run(grads, state, params, enc_gates, fused=False)

    def fused_apply(grads, state, params, enc_gates=None):
        return _run(grads, state, params, enc_gates, fused=True)

    return FusedGradientTransformation(init, update, fused_apply)


class Adam8bit(Optimizer):
    """Adam with 8-bit blockwise-quantized moments (``ops/fused_adam.py``)
    — optimizer state at ~2.06 B/param vs fp32 Adam's 8 (4.5x smaller)
    and ``Adam(state_dtype=bfloat16)``'s 4 (2x), at fp32-Adam-level
    throughput (measured 72.7 vs 72.3 TFLOP/s at the update-bound point,
    bench_adam8bit*.json). Use it when optimizer state pressures HBM
    CAPACITY; for pure update-bound THROUGHPUT, bf16 state remains the
    measured optimum on v5e (91.6 TFLOP/s — see RESULTS.md). NOT
    torch-exact numerics (quantization error enters through the moment
    history; the first step is exact). Structural-skip gating semantics
    match ``Adam``.

    ``fmt``: 'fp8' (default — float8_e4m3fn codes; tracked fp32 Adam's
    loss trajectory to 4 decimals on the titanic drive) or 'int8' (linear
    codes; measurably stalls training when rows mix gradient magnitudes —
    see ops/fused_adam.quantize_rows — but ~9% faster where gradients are
    row-homogeneous).
    ``mode``: 'auto' (= the XLA path, measured >= the hand kernel),
    'pallas'/'interpret' (the fused Pallas kernel — explicit opt-in, kept
    for chips where fp8 casts are native), 'xla'.

    PERMANENT scope limit: 'pallas'/'interpret' modes are rejected by the
    vmapped experiment programs (kfold/sweep_fit_best) — the kernel uses
    input/output aliasing, whose vmap batching is neither exercised nor
    worth building: the XLA path is numerically identical (bit-exact
    identity-quantization equivalence, tests/test_adam8bit.py) and
    measured FASTER on v5e (bench_adam8bit*.json), so a vmap-safe kernel
    would be slower code serving no configuration. Construct
    ``Adam8bit(lr)`` (auto == xla) for experiment programs.
    """

    def __init__(self, learning_rate: float,
                 betas: Tuple[float, float] = (0.9, 0.999),
                 eps: float = 1e-8, mode: str = "auto", fmt: str = "fp8"):
        if fmt not in ("fp8", "int8"):
            raise ValueError(f"fmt must be 'fp8' or 'int8', got {fmt!r}")
        if mode not in ("auto", "xla", "pallas", "interpret"):
            raise ValueError(
                f"mode must be 'auto', 'xla', 'pallas' or 'interpret', "
                f"got {mode!r}")
        super().__init__(_adam8bit(learning_rate, betas[0], betas[1], eps,
                                   mode, fmt))
        self.signature = ("adam8bit", learning_rate, tuple(betas), eps,
                          mode, fmt)
        # Pallas kernels with input/output aliasing are not exercised under
        # jax.vmap here; the vmapped experiment programs check this flag.
        # auto == xla (pure jnp), so the default IS vmap-safe.
        self.vmap_safe = mode in ("auto", "xla")


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
