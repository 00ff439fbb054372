"""Pallas TPU kernel: the entire MultiModN forward chain in ONE kernel.

Rationale (BASELINE.json's named kernel candidate): a MultiModN model is a
chain of small matmuls threading a (B, S) state — encoder e: (B, F_e) @
(F_e, H) @ ... -> state update; then D decoder heads on every intermediate
state. All weights together are KILOBYTES, far below the ~16 MB of VMEM, so
the whole model stays resident on-chip while batch tiles stream from HBM via
the pallas pipeline — zero HBM weight re-reads between steps, no per-op
dispatch, one kernel for the full (E+1) x D output grid.

Supported module set (covers every shipped pipeline): MLP-family encoders
(``MLPEncoder`` last-layer state concat / ``MIMICMLPEncoder`` first-layer
concat, inference mode) and dense decoders (``ClassDecoder`` /
``LogisticDecoder`` / ``MLPDecoder``). State concatenation is algebraically
split — ``[x, s] @ W = x @ W_x + s @ W_s`` — so the kernel never materializes
concatenated activations.

Per-sample NaN-skip masking is honored via per-modality validity columns.
"""
from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodn_tpu.core.nn import ACTIVATIONS
from multimodn_tpu.decoders.decoders import ClassDecoder, MLPDecoder
from multimodn_tpu.encoders.mlp import MIMICMLPEncoder, MLPEncoder


def _act_name(fn) -> str:
    for name, f in ACTIVATIONS.items():
        if f is fn:
            return name
    raise ValueError(f"activation {fn} not in the kernel-supported registry")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class ChainSpec:
    """Static plan: per-encoder layer topology + split weights + decoders.

    Weight layout per encoder layer: (w, b) with the state contribution of
    the concat layer split out as ``w_state``.
    """

    def __init__(self, encoders: Sequence, decoders: Sequence, state_size: int):
        self.state_size = state_size
        self.enc_plans = []
        for enc in encoders:
            if isinstance(enc, MIMICMLPEncoder):
                self.enc_plans.append(
                    ("first_concat", _act_name(enc.activation),
                     len(enc._dims) - 1))
            elif isinstance(enc, MLPEncoder):
                self.enc_plans.append(
                    ("last_concat", _act_name(enc.activation),
                     len(enc._layer_dims)))
            else:
                raise TypeError(
                    f"fused chain kernel supports MLP-family encoders only, "
                    f"got {type(enc).__name__}")
        self.dec_plans = []
        for dec in decoders:
            if isinstance(dec, MLPDecoder):
                self.dec_plans.append(
                    ("mlp", _act_name(dec.hidden_activation),
                     _act_name(dec.output_activation), len(dec._dims) - 1,
                     dec.n_classes))
            elif isinstance(dec, ClassDecoder):
                self.dec_plans.append(
                    ("class", "identity", _act_name(dec.activation), 1,
                     dec.n_classes))
            else:
                raise TypeError(
                    f"fused chain kernel supports dense decoders only, got "
                    f"{type(dec).__name__}")

    def flatten_params(self, params: dict) -> List[jnp.ndarray]:
        """Order: per encoder, per layer (w [, w_state], b); then decoders."""
        flat = []
        S = self.state_size
        for e, (kind, _act, n_layers) in enumerate(self.enc_plans):
            layers = params["encoders"][e]["layers"]
            assert len(layers) == n_layers
            for i, layer in enumerate(layers):
                w, b = layer["w"], layer["b"]
                is_concat = (kind == "first_concat" and i == 0) or \
                            (kind == "last_concat" and i == n_layers - 1)
                if is_concat:
                    flat += [w[:-S], w[-S:], b]
                else:
                    flat += [w, b]
        for d, plan in enumerate(self.dec_plans):
            for layer in params["decoders"][d]["layers"]:
                flat += [layer["w"], layer["b"]]
        return flat


def _apply_act(name: str, x):
    if name == "identity" or name == "none":
        return x
    if name == "relu":
        return jnp.maximum(x, 0.0)
    if name == "sigmoid":
        return jax.nn.sigmoid(x)
    if name == "tanh":
        return jnp.tanh(x)
    if name == "gelu":
        return jax.nn.gelu(x)
    if name == "softmax":
        return jax.nn.softmax(x, axis=-1)
    raise ValueError(name)


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _zeros_index(ndim, i):
    return (0,) * ndim


def make_fused_chain_forward(encoders, decoders, state_size: int,
                             batch_tile: int = 128, interpret: bool = False):
    """Build ``fn(params, data_tuple, valid (B, E), init_state_row) ->
    (states (E+1, B, S), outputs list of (E+1, B, C_d))``.

    ``valid[b, e]`` gates encoder e for sample b (per-sample NaN skip);
    data must be NaN-sanitized by the caller (the fusion core already is).
    """
    spec = ChainSpec(encoders, decoders, state_size)
    n_enc = len(encoders)
    n_rows = n_enc + 1
    # Weight-ref bookkeeping (static): each concat layer splits into 3 refs
    # (w_x, w_state, b), plain layers into 2 (w, b).
    n_enc_w = sum(nl * 2 + 1 for _k, _a, nl in spec.enc_plans)
    n_dec_w = sum(p[3] * 2 for p in spec.dec_plans)
    n_w = n_enc_w + n_dec_w

    def make_kernel(tile):
      def kernel(*refs):
        # refs: data_0..data_{E-1}, valid, init_state, *weights,
        #       out_states, out_dec_0..out_dec_{D-1}
        data_refs = refs[:n_enc]
        valid_ref = refs[n_enc]
        init_ref = refs[n_enc + 1]
        w_refs = refs[n_enc + 2: n_enc + 2 + n_w]
        out_states = refs[n_enc + 2 + n_w]
        out_decs = refs[n_enc + 3 + n_w:]

        state = jnp.broadcast_to(init_ref[0, :], (tile, state_size))
        wi = 0

        def read(i):
            return w_refs[i][:]

        def run_decoders(row, state):
            dwi = n_enc_w
            for d, (kind, hact, oact, n_layers, n_classes) in \
                    enumerate(spec.dec_plans):
                h = state
                for li in range(n_layers):
                    w = w_refs[dwi][:]
                    b = w_refs[dwi + 1][:]
                    dwi += 2
                    h = _dot(h, w) + b
                    h = _apply_act(oact if li == n_layers - 1 else hact, h)
                out_decs[d][row, :, :] = h

        out_states[0, :, :] = state
        run_decoders(0, state)

        for e, (kind, act, n_layers) in enumerate(spec.enc_plans):
            x = data_refs[e][:]
            if kind == "first_concat":
                # layer 0: relu((x @ Wx + s @ Ws) + b); act on EVERY layer.
                w_x, w_s, b = read(wi), read(wi + 1), read(wi + 2)
                wi += 3
                h = _apply_act(act, _dot(x, w_x) + _dot(state, w_s) + b)
                for li in range(1, n_layers):
                    w, b = read(wi), read(wi + 1)
                    wi += 2
                    h = _apply_act(act, _dot(h, w) + b)
                new_state = h
            else:  # last_concat: act on hiddens, none on output layer.
                h = x
                for li in range(n_layers - 1):
                    w, b = read(wi), read(wi + 1)
                    wi += 2
                    h = _apply_act(act, _dot(h, w) + b)
                w_x, w_s, b = read(wi), read(wi + 1), read(wi + 2)
                wi += 3
                new_state = _dot(h, w_x) + _dot(state, w_s) + b
            v = valid_ref[:, e:e + 1]
            state = jnp.where(v > 0, new_state, state)
            out_states[e + 1, :, :] = state
            run_decoders(e + 1, state)

      return kernel

    # ---- Build the pallas_call wrapper -----------------------------------
    def forward(params, data, valid, init_state_row):
        B = data[0].shape[0]
        Bp = _round_up(max(B, 8), batch_tile) if B > batch_tile \
            else _round_up(max(B, 8), 8)
        tile = min(batch_tile, Bp)
        grid = (Bp // tile,)

        def pad_b(a):
            if a.shape[0] == Bp:
                return a
            pad = [(0, Bp - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, pad)

        data_p = [pad_b(d) for d in data]
        valid_p = pad_b(valid.astype(jnp.float32))
        flat_w = spec.flatten_params(params)
        assert len(flat_w) == n_w, (len(flat_w), n_w)

        in_specs = (
            [pl.BlockSpec((tile, d.shape[1]), lambda i: (i, 0),
                          memory_space=pltpu.VMEM) for d in data_p]
            + [pl.BlockSpec((tile, n_enc), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)]
            + [pl.BlockSpec((1, state_size), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(w.shape, functools.partial(_zeros_index, w.ndim),
                            memory_space=pltpu.VMEM) for w in flat_w]
        )
        out_shapes = (
            [jax.ShapeDtypeStruct((n_rows, Bp, state_size), jnp.float32)]
            + [jax.ShapeDtypeStruct((n_rows, Bp, p[-1]), jnp.float32)
               for p in spec.dec_plans]
        )
        out_specs = (
            [pl.BlockSpec((n_rows, tile, state_size), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)]
            + [pl.BlockSpec((n_rows, tile, p[-1]), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM) for p in spec.dec_plans]
        )

        outs = pl.pallas_call(
            make_kernel(tile),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
        )(*data_p, valid_p, init_state_row.reshape(1, state_size), *flat_w)

        states = outs[0][:, :B, :]
        dec_outs = [o[:, :B, :] for o in outs[1:]]
        return states, dec_outs

    return forward


def make_xla_chain_forward(encoders, decoders, state_size: int):
    """The kernel's exact math in plain XLA ops (same masking contract):
    used as the rematerialized backward of the custom-VJP path and as the
    comparison baseline in bench_pallas.py."""

    def forward(params, data, valid, init_state_row):
        B = data[0].shape[0]
        state = jnp.broadcast_to(init_state_row.reshape(1, state_size),
                                 (B, state_size))
        states = [state]
        for e, enc in enumerate(encoders):
            new_state = enc.apply(params["encoders"][e], state, data[e])
            v = valid[:, e:e + 1].astype(new_state.dtype)
            state = jnp.where(v > 0, new_state, state)
            states.append(state)
        states = jnp.stack(states)                      # (E+1, B, S)
        outs = [dec.apply(params["decoders"][d], states)
                for d, dec in enumerate(decoders)]
        return states, outs

    return forward


def make_fused_chain_vjp(encoders, decoders, state_size: int,
                         batch_tile: int = 128, interpret: bool = False):
    """Trainable fused chain: Pallas forward + rematerialized XLA backward.

    The custom VJP (VERDICT r1 next #3) makes the kernel usable inside
    value_and_grad / the training programs: the forward pass is the one-kernel
    VMEM-resident chain; the backward recomputes the chain with plain XLA ops
    (``jax.vjp`` of ``make_xla_chain_forward`` — the two are bit-exact, see
    tests/test_pallas.py) and differentiates that. Residuals are just the
    kernel INPUTS, so no extra activation traffic crosses the kernel boundary
    (a remat-style tradeoff: backward re-does the forward FLOPs).

    Measured verdict (bench_pallas.json, RESULTS.md): XLA's own fusion
    already runs this chain at the matmul roofline at both shipped and
    scaled widths, so the kernel path does not win for training — it is
    kept as the explicit-kernel option (``MultiModN.fused_forward``) and as
    reference material for chains XLA ever schedules badly.
    """
    pallas_fwd = make_fused_chain_forward(encoders, decoders, state_size,
                                          batch_tile=batch_tile,
                                          interpret=interpret)
    xla_fwd = make_xla_chain_forward(encoders, decoders, state_size)

    @jax.custom_vjp
    def fused(params, data, valid, init_state_row):
        return pallas_fwd(params, data, valid, init_state_row)

    def fwd(params, data, valid, init_state_row):
        out = pallas_fwd(params, data, valid, init_state_row)
        return out, (params, data, valid, init_state_row)

    def bwd(residuals, cotangents):
        params, data, valid, init_state_row = residuals
        _, vjp_fn = jax.vjp(xla_fwd, params, data, valid, init_state_row)
        return vjp_fn(cotangents)

    fused.defvjp(fwd, bwd)
    return fused
