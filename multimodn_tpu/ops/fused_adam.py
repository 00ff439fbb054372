"""8-bit blockwise-quantized Adam: one-HBM-pass Pallas update kernel.

Why this exists (measured motivation, RESULTS.md roofline +
bench_adam_state.json): large-encoder Adam training on TPU is bound by
optimizer-state HBM traffic, not FLOPs — every fp32 Adam update streams
~28 B/param (read p,g,m,v; write p,m,v) while SGD training runs at the
matmul ceiling. ``Adam(state_dtype=bfloat16)`` cuts that to ~20 B/param
(+27% measured at batch 512). Storing the moments as **8-bit codes with a
per-row fp32 scale** (blockwise absmax quantization in the spirit of
Dettmers et al.'s 8-bit optimizers, arXiv:2110.02861) cuts it to
~16 B/param — below bf16 state.

Code format matters (measured on the shipped titanic-MLP drive): LINEAR
int8 codes visibly stall training — the concat-topology rows mix
gradient magnitudes orders apart, and elements far below the row absmax
quantize to zero every step, so their moments never accumulate. The
default codes are therefore **float8_e4m3fn** (per-element 4-bit
exponent + shared per-row scale; Dettmers' dynamic-map role played by
hardware fp8), which tracked the fp32-Adam loss trajectory to 4 decimal
places on the same drive. ``fmt='int8'`` remains available for
homogeneous-gradient workloads.

Measured verdict on TPU v5e (bench_adam8bit.json /
bench_adam8bit_variants.json, scaled config at batch 512, same-process
A/B): the (de)quantization COMPUTE dominates the traffic savings on this
chip — fp32 Adam 72.3 TFLOP/s, bf16-state 91.6, 8-bit via XLA 72.7 (fp8
codes) / 79.2 (int8), 8-bit via this Pallas kernel 54.5 (fp8) / 78.9
(int8). Two findings: (a) fp8 casts are VPU-emulated on v5e and cost
more than the ~4 B/param they save; (b) XLA's own fusion of the
dequant-update-requant chain matches or beats the hand kernel (same
story as ops/fused_chain.py). The kernel is therefore an EXPLICIT OPT-IN
(``mode='pallas'``); ``mode='auto'`` resolves to the XLA path. The
feature's real win is optimizer-state MEMORY: ~2.06 B/param vs fp32
Adam's 8 (4.5x memory) and bf16-state's 4 (2x), at fp32-Adam-level
throughput — for models whose optimizer state pressures HBM capacity.

Numerics: the first step after init is EXACT fp32 Adam (zero moments
quantize losslessly; quantization error only enters through the moment
*history*). The jnp fallback path (`_leaf_update_xla`) implements
bit-identical math and is used on CPU, for small leaves, and for the
gated (structural-skip) path.

Reference behavior being accelerated: ``torch.optim.Adam`` as constructed
by the reference pipelines (``titanic_mlp_pipeline.py:74``); the skip
semantics mirror ``optim._torch_adam`` (see that module's docstring).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q_MAX = 127.0          # int8 linear code range
FP8_MAX = 448.0        # float8_e4m3fn max finite

# VMEM working set per grid step is ~16 B/elem across the 9 live tiles;
# keep it well under the ~16 MB budget so Pallas can double-buffer.
_VMEM_TILE_BUDGET = 4 * 1024 * 1024


def _rows_cols(shape):
    """Collapse a leaf to 2-D (rows, cols) keeping the minor (lane) dim."""
    if len(shape) == 0:
        return 1, 1
    if len(shape) == 1:
        return 1, shape[0]
    rows = 1
    for d in shape[:-1]:
        rows *= d
    return rows, shape[-1]


def scale_shape(shape):
    """Per-row scale storage shape for a leaf: shape[:-1] + (1,); a 0-d
    leaf keeps a 0-d scale (one element IS its own row)."""
    return tuple(shape[:-1]) + (1,) if len(shape) >= 1 else ()


def code_dtype(fmt: str):
    return jnp.int8 if fmt == "int8" else jnp.float8_e4m3fn


def quantize_rows(x, fmt: str = "fp8"):
    """Blockwise absmax 8-bit quantization along the last axis.

    ``fmt='fp8'`` (default): float8_e4m3fn codes + per-row absmax scale.
    Each element keeps its own 4-bit exponent, so intra-row dynamic range
    (the concat-topology reality: state columns and feature columns carry
    gradients orders of magnitude apart, and Adam's ``v`` spans the square
    of that) survives at ~6% relative error. ``fmt='int8'``: linear codes
    — half the relative error (absmax/254 absolute) but small-magnitude
    elements in a row quantize to ZERO, which measurably stalls training
    on the shipped models (momentum never accumulates for small-gradient
    coordinates); kept for homogeneous-gradient workloads.

    Returns (codes like x, scales f32 ``scale_shape(x.shape)``);
    dequantize with ``codes * scales``. Zero rows get scale 0 / codes 0.

    Divergence behavior (NaN/Inf gradients): a non-finite absmax fails the
    ``absmax > 0`` test, so finite elements code to 0 while the row SCALE
    becomes NaN/Inf — the whole row dequantizes to NaN on the next step.
    Diverged runs therefore still fail loudly like fp32 Adam, at row
    rather than element granularity (ADVICE r3; the row is the coarsest
    unit this layout can poison).
    """
    x = x.astype(jnp.float32)
    if x.ndim == 0:
        q, s = quantize_rows(x.reshape(1), fmt)
        return q.reshape(()), s.reshape(())
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    if fmt == "int8":
        inv = jnp.where(absmax > 0, Q_MAX / absmax, 0.0)
        q = jnp.clip(jnp.round(x * inv), -Q_MAX, Q_MAX).astype(jnp.int8)
        return q, absmax / Q_MAX
    inv = jnp.where(absmax > 0, FP8_MAX / absmax, 0.0)
    q = jnp.clip(x * inv, -FP8_MAX, FP8_MAX).astype(jnp.float8_e4m3fn)
    return q, absmax / FP8_MAX


def dequantize(q, s):
    return q.astype(jnp.float32) * s


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_tile_rows(rows: int, cols: int) -> int:
    """Rows per grid step: multiple of 32 (int8 sublane tile), sized so the
    ~16 B/elem working set (9 live tiles, lane-padded) fits the budget.
    The kernel tiles rows only, so a leaf whose MINOR dim alone overflows
    the budget (cols_padded > ~8k: e.g. a 1-D leaf of 40k+ elements, which
    _rows_cols places entirely in cols) cannot be scheduled — raise with
    the remedy instead of letting Mosaic fail VMEM allocation."""
    cols_padded = _round_up(cols, 128)
    if 16 * cols_padded * 32 > _VMEM_TILE_BUDGET:
        raise ValueError(
            f"fused_adam Pallas kernel: minor dim {cols} (padded "
            f"{cols_padded}) needs >{_VMEM_TILE_BUDGET // (1024*1024)} MB "
            "of VMEM per 32-row tile; use mode='auto'/'xla' for this leaf "
            "shape (the kernel tiles rows, not columns).")
    limit = max(32, _VMEM_TILE_BUDGET // (16 * cols_padded))
    tile = min(_round_up(rows, 32), (limit // 32) * 32)
    return max(32, tile)


@functools.lru_cache(maxsize=None)
def _make_leaf_pallas(rows: int, cols: int, p_dtype: str, lr: float,
                      b1: float, b2: float, eps: float, interpret: bool,
                      fmt: str = "fp8"):
    """Compile-cached pallas_call for one leaf geometry.

    Inputs:  c (1,2) SMEM = (c1, c2) bias corrections,
             p (rows, cols), g (rows, cols),
             mq/vq 8-bit codes (rows, cols), ms/vs f32 (rows, 1).
    Outputs: p', mq', ms', vq', vs' — aliased in-place onto their inputs.
    """
    tile_r = _pick_tile_rows(rows, cols)
    grid = (pl.cdiv(rows, tile_r),)
    out_dtype = jnp.dtype(p_dtype)
    q_dtype = code_dtype(fmt)
    q_top = Q_MAX if fmt == "int8" else FP8_MAX

    def _requant(x):
        x_abs = jnp.max(jnp.abs(x), axis=1, keepdims=True)
        inv = jnp.where(x_abs > 0, q_top / x_abs, 0.0)
        scaled = x * inv
        if fmt == "int8":
            scaled = jnp.round(scaled)
        q = jnp.clip(scaled, -q_top, q_top).astype(q_dtype)
        return q, x_abs / q_top

    def kernel(c_ref, p_ref, g_ref, mq_ref, ms_ref, vq_ref, vs_ref,
               po_ref, mqo_ref, mso_ref, vqo_ref, vso_ref):
        c1 = c_ref[0, 0]
        c2 = c_ref[0, 1]
        g = g_ref[:].astype(jnp.float32)
        m = mq_ref[:].astype(jnp.float32) * ms_ref[:]
        v = vq_ref[:].astype(jnp.float32) * vs_ref[:]
        m_new = b1 * m + (1.0 - b1) * g
        v_new = b2 * v + (1.0 - b2) * g * g
        denom = jnp.sqrt(v_new / c2) + eps
        p = p_ref[:].astype(jnp.float32)
        po_ref[:] = (p - lr * (m_new / c1) / denom).astype(out_dtype)
        mqo_ref[:], mso_ref[:] = _requant(m_new)
        vqo_ref[:], vso_ref[:] = _requant(v_new)

    def row_spec(c):
        return pl.BlockSpec((tile_r, c), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),          # c
            row_spec(cols),                                  # p
            row_spec(cols),                                  # g
            row_spec(cols),                                  # mq
            row_spec(1),                                     # ms
            row_spec(cols),                                  # vq
            row_spec(1),                                     # vs
        ],
        out_specs=[row_spec(cols), row_spec(cols), row_spec(1),
                   row_spec(cols), row_spec(1)],
        out_shape=[
            jax.ShapeDtypeStruct((rows, cols), out_dtype),   # p'
            jax.ShapeDtypeStruct((rows, cols), q_dtype),     # mq'
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),    # ms'
            jax.ShapeDtypeStruct((rows, cols), q_dtype),     # vq'
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),    # vs'
        ],
        input_output_aliases={1: 0, 3: 1, 4: 2, 5: 3, 6: 4},
        interpret=interpret,
    )


def moment_update(g, mq, ms, vq, vs, c1, c2, lr, b1, b2, eps, gate=None,
                  fmt: str = "fp8"):
    """The kernel's exact math in plain jnp, protocol-shaped: returns
    (update, mq', ms', vq', vs') without touching the parameter.

    ``gate`` (0/1 scalar or broadcastable array) engages the torch
    structural-skip semantics: frozen moments and zero update where 0.
    ``c1``/``c2`` may be scalars or arrays broadcastable over the leaf
    (per-encoder-group bias corrections for stacked storage).
    """
    g = g.astype(jnp.float32)
    m = dequantize(mq, ms)
    v = dequantize(vq, vs)
    if gate is None:
        m_new = b1 * m + (1.0 - b1) * g
        v_new = b2 * v + (1.0 - b2) * g * g
        upd = -lr * (m_new / c1) / (jnp.sqrt(v_new / c2) + eps)
    else:
        m_new = m + gate * (1.0 - b1) * (g - m)
        v_new = v + gate * (1.0 - b2) * (g * g - v)
        upd = -lr * gate * (m_new / c1) / (jnp.sqrt(v_new / c2) + eps)
    mq_new, ms_new = quantize_rows(m_new, fmt)
    vq_new, vs_new = quantize_rows(v_new, fmt)
    return upd, mq_new, ms_new, vq_new, vs_new


def _leaf_update_xla(p, g, mq, ms, vq, vs, c1, c2, lr, b1, b2, eps,
                     gate=None, fmt: str = "fp8"):
    """moment_update + fused parameter apply (any shape, optional gate)."""
    upd, mq_new, ms_new, vq_new, vs_new = moment_update(
        g, mq, ms, vq, vs, c1, c2, lr, b1, b2, eps, gate=gate, fmt=fmt)
    p_new = (p.astype(jnp.float32) + upd).astype(p.dtype)
    return p_new, mq_new, ms_new, vq_new, vs_new


def leaf_update(p, g, mq, ms, vq, vs, c12, *, lr, b1, b2, eps,
                mode: str = "auto", fmt: str = "fp8"):
    """Fused 8-bit Adam update for one leaf: returns (p', mq', ms', vq', vs').

    ``c12`` is a (1, 2) f32 array of bias corrections (1-b1^t, 1-b2^t).
    ``mode``: 'auto' resolves to 'xla' (measured faster than the hand
    kernel on v5e — module docstring); 'pallas' forces the kernel,
    'interpret' the Pallas interpreter (test path), 'xla' the jnp math.
    """
    if mode not in ("auto", "xla", "pallas", "interpret"):
        raise ValueError(
            f"mode must be 'auto', 'xla', 'pallas' or 'interpret', "
            f"got {mode!r}")
    use = "xla" if mode == "auto" else mode
    if use == "xla":
        return _leaf_update_xla(p, g, mq, ms, vq, vs,
                                c12[0, 0], c12[0, 1], lr, b1, b2, eps,
                                fmt=fmt)
    rows, cols = _rows_cols(p.shape)
    call = _make_leaf_pallas(rows, cols, jnp.dtype(p.dtype).name,
                             float(lr), float(b1), float(b2), float(eps),
                             use == "interpret", fmt)
    p2 = p.reshape(rows, cols)
    g2 = g.reshape(rows, cols)  # kernel casts to f32 in VMEM, not in HBM
    outs = call(c12, p2, g2, mq.reshape(rows, cols), ms.reshape(rows, 1),
                vq.reshape(rows, cols), vs.reshape(rows, 1))
    p_new, mq_new, ms_new, vq_new, vs_new = outs
    return (p_new.reshape(p.shape), mq_new.reshape(p.shape),
            ms_new.reshape(scale_shape(p.shape)),
            vq_new.reshape(p.shape),
            vs_new.reshape(scale_shape(p.shape)))
