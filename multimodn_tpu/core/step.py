"""Jitted step and epoch programs.

The reference runs a Python batch loop with per-cell torch ops
(``multimodn/multimodn.py:117-220``). Here the *entire epoch* is one XLA
program: a ``lax.scan`` over on-device batch stacks whose body is
value_and_grad of the fused forward grid + an optax update. One device
dispatch per epoch; the only host transfer is the final reduced metric grids
(the reference also transfers once per epoch — ``multimodn.py:236-240``).

Epoch batch layout (built by ``multimodn_tpu.data.loader.ArrayLoader``):
    data:        tuple of M arrays, each (n_batches, B, F_m), NaNs intact
    targets:     (n_batches, B, D) int32
    sample_mask: (n_batches, B) float32 — 0 marks padded tail rows
Static shapes mean XLA compiles once per dataset geometry.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from multimodn_tpu.core.fusion import (
    combine_executions,
    decode_grid,
    forward_chain,
    forward_chain_executions,
    has_repeated_encoders,
)
from multimodn_tpu.core.metrics import safe_div


def make_batch_loss_fn(encoders, decoders, init_state, criterion,
                       err_penalty: float, state_change_penalty: float,
                       order: Sequence[Tuple[int, int]], nan_skip: str,
                       chain: str = "unrolled", shuffle: bool = False,
                       compute_dtype=None, per_batch_seq: bool = False,
                       nan_axis=None, presence_dropout: float = 0.0,
                       presence_penalty: float = 0.0):
    """Pure (params, batch...) -> (loss, aux) for one padded batch.

    ``state_change_penalty`` arrives already scaled by the constructor's 0.01
    factor (reference ``multimodn.py:86``, quirk #1).

    ``chain='scan'`` uses the stacked-parameter lax.scan chain (homogeneous
    encoders only — see core/scan_chain.py); with ``shuffle=True`` the
    modality order is drawn per batch INSIDE the program (the reference's
    shuffle_mode, ``multimodn.py:527-529``), which the unrolled chain cannot
    express without retracing.

    ``nan_axis``: shard_map data-axis name threaded to the chains so the
    batch-granular any-NaN decision stays GLOBAL when the batch axis is
    sharded over explicit devices (fusion.global_any); None outside
    shard_map regions.

    ``per_batch_seq=True``: the returned loss_fn takes a traced ``seq``
    argument — this batch's (L,) encoder order (the reference's per-batch
    ``encoding_sequence``, ``multimodn.py:509-523``) — instead of the static
    ``order``; requires a traced-order chain ('scan' or 'switch').

    MNAR-robustness opt-ins for ``nan_skip='sample'`` (RESULTS.md: the
    per-sample skip exposes a presence-of-modality channel that
    class-conditional missingness makes exploitable):

    ``presence_dropout`` (p in [0, 1)): during TRAINING, each (sample,
    modality) is independently re-marked missing with probability p by
    injecting NaNs into the batch BEFORE the chain runs — label-independent
    skip noise that dilutes the presence<->class correlation. Works with
    every chain/order/shuffle combination because the chains' existing NaN
    machinery does the masking.

    ``presence_penalty`` (lambda >= 0): adds
    ``lambda * mean_k [miss_frac_k * mean_present ||state_delta_k||^2]``
    to the training loss — each modality's state updates on PRESENT rows
    are damped in proportion to that modality's observed missingness in
    the batch. At high class-conditional missingness (where the presence
    exploit is catastrophic) this drives the modality's influence toward
    zero — the batch-granular mode's robustness — while leaving complete
    modalities untouched. Requires a STATIC order (no in-program shuffle /
    per-batch sequences / repeated encoders): the penalty reconstructs
    execution-order state deltas from the row-indexed stack.
    """
    n_enc = len(encoders)
    n_dec = len(decoders)
    if per_batch_seq and chain not in ("scan", "switch"):
        raise ValueError("per_batch_seq requires chain='scan' or 'switch'")
    repeats = not per_batch_seq and has_repeated_encoders(order)
    if repeats and chain in ("scan", "switch"):
        raise ValueError(
            "encoding sequences with REPEATED encoders need the unrolled "
            "chain: the traced-order chains keep one metric row per encoder "
            "and cannot express the reference's per-execution accumulation "
            "(multimodn.py:171-192). Use chain_mode='unrolled' (or 'auto').")
    if chain in ("scan", "switch"):
        from multimodn_tpu.core.scan_chain import (forward_chain_scan,
                                                   forward_chain_switch)
        base_data = jnp.asarray([d for d, _e in order], jnp.int32)
        base_enc = jnp.asarray([e for _d, e in order], jnp.int32)
    if presence_dropout or presence_penalty:
        if nan_skip != "sample":
            raise ValueError(
                "presence_dropout/presence_penalty are sample-granularity "
                "mitigations; they require nan_skip='sample' (batch mode is "
                "already presence-robust, 'none' never skips).")
    if presence_penalty and (shuffle or per_batch_seq or repeats):
        raise ValueError(
            "presence_penalty needs a STATIC modality order (no "
            "shuffle_mode, per-batch encoding sequences, or repeated "
            "encoders): the penalty reconstructs execution-order state "
            "deltas from the row-indexed stack.")

    def _sample_missing(x):
        nan_here = jnp.isnan(x)
        return jnp.any(nan_here, axis=tuple(range(1, x.ndim))) \
            if x.ndim > 1 else nan_here

    def _inject_presence_dropout(data, rng):
        """Re-mark (sample, modality) pairs missing with prob p by writing
        NaNs; the chains' skip machinery then treats them as absent. The
        per-modality draw is fold_in(drng, m) in BOTH layouts (modality
        tuple and scan-stacked (B, E, F)), so the injected pattern for a
        given model/seed is identical whichever entry point shaped the
        batch (review finding: a layout-dependent stream made runs
        irreproducible between fused fit and the streaming path)."""
        drng = jax.random.fold_in(rng, 715827883)
        if isinstance(data, tuple):
            out = []
            for m, x in enumerate(data):
                drop = jax.random.bernoulli(
                    jax.random.fold_in(drng, m), presence_dropout,
                    (x.shape[0],))
                shp = (-1,) + (1,) * (x.ndim - 1)
                out.append(jnp.where(drop.reshape(shp), jnp.nan, x))
            return tuple(out)
        drop = jnp.stack([
            jax.random.bernoulli(jax.random.fold_in(drng, m),
                                 presence_dropout, (data.shape[0],))
            for m in range(data.shape[1])], axis=1)          # (B, E)
        shp = drop.shape + (1,) * (data.ndim - 2)
        return jnp.where(drop.reshape(shp), jnp.nan, data)

    def _presence_penalty_term(states, data, sample_mask):
        """Missingness-weighted mean squared state delta over PRESENT rows,
        averaged over execution steps (static ``order``: execution k reads
        row order[k-1].enc+1 -> order[k].enc+1).

        Under the explicit shard_map engine (``nan_axis`` set) the penalty
        must equal the single-device value, not a shard-local one. The
        data-only statistics (valid/missing/present COUNTS) carry no
        gradient path, so they psum into global counts; the
        parameter-dependent numerator (sum of present-row state deltas)
        stays LOCAL so each shard's gradient contribution is its own rows'.
        The engine multiplies every shard's loss by ``scale = n_local /
        n_global`` before the grad psum (``_sm_batch_update``), which is
        the wrong weighting for this term — so the local term is
        pre-divided by that exact scale: ``psum_i(scale_i * pen_i/scale_i)
        = psum_i(pen_i)`` = the global penalty, with unweighted per-shard
        gradients. Outside shard_map (nan_axis=None) every psum is the
        identity and the expression reduces to the original single-device
        one; the auto engine's GSPMD reductions make it global on meshes."""
        psum = (lambda v: jax.lax.psum(v, nan_axis)) if nan_axis \
            else (lambda v: v)
        mask_b = sample_mask > 0
        local_valid = jnp.sum(sample_mask.astype(jnp.float32))
        n_valid = jnp.maximum(psum(local_valid), 1.0)
        prev = states[0]
        pen = jnp.zeros(())
        for k, (d_idx, e_idx) in enumerate(order):
            cur = states[e_idx + 1]
            x = data[d_idx] if isinstance(data, tuple) else data[:, d_idx]
            missing = _sample_missing(x) & mask_b
            present = (~_sample_missing(x)) & mask_b
            miss_frac = psum(jnp.sum(missing.astype(jnp.float32))) / n_valid
            delta = jnp.mean(
                (cur.astype(jnp.float32) - prev.astype(jnp.float32)) ** 2,
                axis=-1)
            pres_f = present.astype(jnp.float32)
            present_delta = jnp.sum(delta * pres_f) / \
                jnp.maximum(psum(jnp.sum(pres_f)), 1.0)
            pen = pen + miss_frac * present_delta
            prev = cur
        pen = pen / max(len(order), 1)
        if nan_axis:
            # Cancel _sm_batch_update's scale exactly (same max-guarded
            # denominator); a zero-valid shard contributes zero (its
            # present-row sums are zero already).
            pen = jnp.where(local_valid > 0,
                            pen * n_valid / jnp.maximum(local_valid, 1.0),
                            0.0)
        return pen

    def loss_fn(params, data, targets, sample_mask, rng, init_offset,
                train: bool, seq=None):
        if compute_dtype is not None:
            # Mixed precision: forward/backward in compute_dtype (bf16 on
            # TPU = MXU-native inputs with fp32 accumulation, see
            # core/nn.dense_apply); losses/metrics/penalties reduce in fp32
            # (decode_grid, masked_mean_sq_diff); master params and the
            # optax update stay fp32 — gradients arrive fp32 through the
            # differentiable casts.
            cast = lambda leaf: leaf.astype(compute_dtype) \
                if jnp.issubdtype(leaf.dtype, jnp.floating) else leaf
            params = jax.tree_util.tree_map(cast, params)
            data = tuple(cast(x) for x in data) \
                if isinstance(data, tuple) else cast(data)
        if presence_dropout and train:
            data = _inject_presence_dropout(data, rng)
        if chain in ("scan", "switch"):
            if per_batch_seq:
                # Reference get_encoder_iterable: data_idx enumerates the
                # sequence positions, enc_idx comes from the sequence
                # (multimodn.py:516-525).
                b_data = jnp.arange(seq.shape[0], dtype=jnp.int32)
                b_enc = seq.astype(jnp.int32)
            else:
                b_data, b_enc = base_data, base_enc
            if shuffle and train:
                # Shuffle the (data_idx, enc_idx) PAIRS, like the reference's
                # random.shuffle of the iterable (multimodn.py:527-529).
                perm_rng = jax.random.fold_in(rng, 982451653)
                perm = jax.random.permutation(perm_rng, b_data.shape[0])
            else:
                perm = jnp.arange(b_data.shape[0])
            if chain == "scan":
                states, state_change, row_ok, n_counted, final_state = \
                    forward_chain_scan(
                        encoders[0], n_enc, init_state, params, data,
                        sample_mask,
                        data_order=b_data[perm], enc_order=b_enc[perm],
                        nan_skip=nan_skip, train=train, rng=rng,
                        init_offset=init_offset, nan_axis=nan_axis)
            else:
                states, state_change, row_ok, n_counted, final_state = \
                    forward_chain_switch(
                        encoders, init_state, params, data, sample_mask,
                        data_order=b_data[perm], enc_order=b_enc[perm],
                        nan_skip=nan_skip, train=train, rng=rng,
                        init_offset=init_offset, nan_axis=nan_axis)
        elif repeats:
            # Repeated-encoder order: decode per EXECUTION, then fold back
            # into the reference's encoder-indexed grid (counts accumulate,
            # err/outputs take the last non-skipped execution —
            # multimodn.py:171-192; see fusion.combine_executions).
            states_x, sc_x, ok_x, cnt_x, final_state = \
                forward_chain_executions(
                    encoders, init_state, params, data, sample_mask,
                    order=order, nan_skip=nan_skip, train=train, rng=rng,
                    init_offset=init_offset, nan_axis=nan_axis)
            exec_grid = decode_grid(decoders, params, states_x, targets,
                                    sample_mask, ok_x, criterion)
            comb = combine_executions(order, n_enc, exec_grid, sc_x, ok_x,
                                      cnt_x, exec_grid["outputs"])
            grid = {k: comb[k] for k in ("err_loss", "n_correct",
                                         "tp", "tn", "fp", "fn")}
            grid["outputs"] = comb["outputs"]
            state_change = comb["state_change"]
            row_ok = comb["row_ok"]
            n_counted = comb["n_counted"]
        else:
            states, state_change, row_ok, n_counted, final_state = \
                forward_chain(
                    encoders, init_state, params, data, sample_mask,
                    order=order, nan_skip=nan_skip, train=train, rng=rng,
                    init_offset=init_offset, nan_axis=nan_axis)
        if not repeats or chain in ("scan", "switch"):
            grid = decode_grid(decoders, params, states, targets,
                               sample_mask, row_ok, criterion)
        # Reference loss (multimodn.py:194-202): grid mean * err_penalty +
        # state-change mean * (0.01 * state_change_penalty).
        global_err = jnp.sum(grid["err_loss"]) / (n_dec * (n_enc + 1))
        global_sc = jnp.sum(state_change) / n_enc
        loss = global_err * err_penalty + global_sc * state_change_penalty
        if presence_penalty and train:
            loss = loss + presence_penalty * _presence_penalty_term(
                states, data, sample_mask)
        if nan_skip == "batch":
            # Per-encoder executed flags for torch-parity optimizer gating
            # (optim._torch_adam): a batch-NaN-skipped (or never-executed)
            # encoder's row_ok is 0, and torch's Adam skips its params.
            # Only the batch-granular mode can skip (sample/none modes keep
            # row_ok at 1), so the other modes take the zero-overhead plain
            # update path (enc_gates=None).
            enc_gates = row_ok[1:]
        else:
            enc_gates = None
        aux = {
            "enc_gates": enc_gates,
            "err_loss": grid["err_loss"],
            "state_change": state_change,
            "n_correct": grid["n_correct"],
            "tp": grid["tp"], "tn": grid["tn"],
            "fp": grid["fp"], "fn": grid["fn"],
            "n_counted": n_counted,
            "loss": loss,
            "global_err": global_err,
            "global_sc": global_sc,
            "final_outputs": [out[-1] for out in grid["outputs"]],
            "final_state": final_state,
            "all_outputs": grid["outputs"],
        }
        return loss, aux

    return loss_fn


def epoch_reduction(sums: dict, n_batches: int, ones_initialized_counts: bool = True):
    """Reduce per-batch grid sums into the epoch metrics the history stores.

    ``ones_initialized_counts`` replicates the reference's accuracy denominator
    starting at np.ones (``multimodn.py:105,270``, quirk #3).
    """
    err_loss = sums["err_loss"] / n_batches
    state_change = sums["state_change"] / n_batches
    n_samples = sums["n_counted"][:, None]
    if ones_initialized_counts:
        n_samples = n_samples + 1.0
    accuracy = sums["n_correct"] / n_samples
    sensitivity = safe_div(sums["tp"], sums["tp"] + sums["fn"])
    specificity = safe_div(sums["tn"], sums["tn"] + sums["fp"])
    balanced_accuracy = (sensitivity + specificity) / 2.0
    return {
        "loss": err_loss,
        "state_change_loss": state_change,
        "accuracy": accuracy,
        "sensitivity": sensitivity,
        "specificity": specificity,
        "balanced_accuracy": balanced_accuracy,
        "n_samples": n_samples,
        "tp": sums["tp"], "tn": sums["tn"], "fp": sums["fp"], "fn": sums["fn"],
    }


_GRID_KEYS = ("err_loss", "state_change", "n_correct", "tp", "tn", "fp", "fn",
              "n_counted")


def _scan_inputs(data, targets, sample_mask, seqs=None):
    """Batch-scan xs tuple; appends the per-batch sequence array if any."""
    xs = (data, targets, sample_mask, jnp.arange(targets.shape[0]))
    return xs + (seqs,) if seqs is not None else xs


def _scan_batch(xs):
    """Unpack one batch-scan step's xs, with seq=None when not threaded."""
    if len(xs) == 5:
        return xs
    batch_data, batch_targets, batch_mask, batch_idx = xs
    return batch_data, batch_targets, batch_mask, batch_idx, None


def resolve_unroll(scan_unroll, n_batches: int) -> int:
    """Batch-scan unroll factor. On TPU, unrolling the tiny per-batch step
    bodies roughly halves epoch time (measured: 3.3 -> 1.6 ms/epoch on the
    MIMIC bench at unroll=8); on CPU it only inflates compile time, so the
    default (None) resolves to 8 on accelerators and 1 on CPU."""
    if scan_unroll is None:
        scan_unroll = 1 if jax.default_backend() == "cpu" else 8
    return max(1, min(scan_unroll, n_batches))


def _accepts_enc_gates(tx) -> bool:
    """Detect the gated-update capability by SIGNATURE, not try/except: a
    TypeError raised INSIDE a gated update must fail loudly, never silently
    fall back to the plain path (that would drop the torch-parity skip
    semantics the gating exists for)."""
    try:
        import inspect
        return "enc_gates" in inspect.signature(tx.update).parameters
    except (ValueError, TypeError):
        return False


def _tx_update(tx, grads, opt_state, params, enc_gates):
    """Call tx.update, threading per-encoder gates when the transformation
    accepts them (optim._torch_adam); plain optax txs get the 3-arg call."""
    if _accepts_enc_gates(tx):
        return tx.update(grads, opt_state, params, enc_gates=enc_gates)
    return tx.update(grads, opt_state, params)


def gated_update(tx, grads, opt_state, params, batch_mask,
                 enabled: bool = False, enc_gates=None):
    """Apply the optimizer update, optionally skipping fully-padded batches.

    Fully-padded batches appear only when datasets of different sizes are
    stacked (vmapped k-fold training pads every fold to the max batch count);
    skipping via lax.cond keeps optimizer state bit-identical to never having
    seen the batch (Adam moments would otherwise decay on zero grads). The
    cond costs ~30% throughput inside the hot scan, so it is OFF unless the
    caller can actually produce empty batches (``enabled`` is static).
    """
    fused = getattr(tx, "fused_apply", None)
    if not enabled:
        if fused is not None:
            # Fused update+apply (optim.FusedGradientTransformation): the
            # transformation writes new params directly — one HBM pass for
            # kernel-backed optimizers (ops/fused_adam.py).
            return fused(grads, opt_state, params, enc_gates=enc_gates)
        updates, opt_state = _tx_update(tx, grads, opt_state, params,
                                        enc_gates)
        return jax.tree_util.tree_map(lambda p, u: p + u, params,
                                      updates), opt_state
    batch_real = jnp.any(batch_mask > 0)

    def do_update(operand):
        grads, opt_state, params = operand
        if fused is not None:
            return fused(grads, opt_state, params, enc_gates=enc_gates)
        updates, new_opt_state = _tx_update(tx, grads, opt_state, params,
                                            enc_gates)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                            updates)
        return new_params, new_opt_state

    def skip(operand):
        _, opt_state, params = operand
        return params, opt_state

    return jax.lax.cond(batch_real, do_update, skip,
                        (grads, opt_state, params))


def _base_offset(offset0):
    """Normalize the StaticInitState cycle base to the int32 scan carry.

    The phase continues across epochs AND calls, mirroring the reference's
    shared itertools.cycle (state.py:41); the model passes its cumulative
    sample count as offset0 (None -> 0 for offset-free init states).
    int32, not float32: a fused multi-epoch run can accumulate past 2^24
    samples, where float32 increments would lose integer exactness and
    silently gather wrong bank rows."""
    return jnp.zeros((), jnp.int32) if offset0 is None else \
        jnp.asarray(offset0, jnp.int32)


def _advance_offset(offset, batch_mask):
    return offset + jnp.sum(batch_mask).astype(jnp.int32)


def _train_scan_body(loss_fn, tx, gate_empty_batches, rng,
                     with_batch_log: bool = False):
    """The ONE training batch-step body shared by every epoch program
    (looped train_epoch, fused fit, fused select-fit): grad + gated update +
    offset accumulation + grid sums. ``with_batch_log`` adds the per-batch
    loss/err/state-change scalars for log_interval parity
    (multimodn.py:214-220)."""

    def body(carry, xs):
        params, opt_state, offset = carry
        batch_data, batch_targets, batch_mask, batch_idx, seq = \
            _scan_batch(xs)
        batch_rng = jax.random.fold_in(rng, batch_idx)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_data, batch_targets, batch_mask, batch_rng,
            offset, True, seq)
        params, opt_state = gated_update(tx, grads, opt_state, params,
                                         batch_mask, gate_empty_batches,
                                         enc_gates=aux["enc_gates"])
        offset = _advance_offset(offset, batch_mask)
        ys = {k: aux[k] for k in _GRID_KEYS}
        if with_batch_log:
            ys["batch_log"] = jnp.stack(
                [aux["loss"], aux["global_err"], aux["global_sc"]])
        return (params, opt_state, offset), ys

    return body


def _eval_scan_body(loss_fn, rng, params, with_final_outputs: bool = False):
    """The ONE evaluation batch-step body shared by every epoch program.
    ``with_final_outputs`` collects the last-encoder-row decoder outputs the
    performance suite consumes (multimodn.py:354-357)."""

    def body(offset, xs):
        batch_data, batch_targets, batch_mask, batch_idx, seq = \
            _scan_batch(xs)
        batch_rng = jax.random.fold_in(rng, batch_idx)
        _, aux = loss_fn(params, batch_data, batch_targets, batch_mask,
                         batch_rng, offset, False, seq)
        ys = {k: aux[k] for k in _GRID_KEYS}
        if with_final_outputs:
            ys["final_outputs"] = aux["final_outputs"]
        return _advance_offset(offset, batch_mask), ys

    return body


def make_train_epoch_fn(loss_fn, tx, *, donate: bool = True,
                        gate_empty_batches: bool = False,
                        scan_unroll=None, with_seq: bool = False):
    """Build the jitted whole-epoch training program.

    Signature: (params, opt_state, data, targets, sample_mask, rng[, seqs])
            -> (params, opt_state, epoch_sums, n_batches_traced)
    ``with_seq``: thread an (n_batches, L) per-batch encoder-order array
    through the batch scan (per-batch ``encoding_sequence`` support).
    """

    def train_epoch(params, opt_state, data, targets, sample_mask, rng,
                    seqs=None, offset0=None):
        n_batches = targets.shape[0]
        body = _train_scan_body(loss_fn, tx, gate_empty_batches, rng,
                                with_batch_log=True)
        xs = _scan_inputs(data, targets, sample_mask,
                          seqs if with_seq else None)
        off = _base_offset(offset0)
        (params, opt_state, _), ys = jax.lax.scan(
            body, (params, opt_state, off), xs,
            unroll=resolve_unroll(scan_unroll, n_batches))
        batch_log = ys.pop("batch_log")
        sums = {k: jnp.sum(v, axis=0) for k, v in ys.items()}
        return params, opt_state, sums, batch_log

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(train_epoch, donate_argnums=donate_argnums)


def make_eval_epoch_fn(loss_fn, scan_unroll=None, with_seq: bool = False):
    """Build the jitted whole-epoch evaluation program.

    Returns per-epoch grid sums plus the concatenated final-row decoder
    outputs + targets + masks that feed ``get_performance_metrics`` (the
    reference collects exactly the last-encoder-row outputs across the epoch —
    ``multimodn.py:354-357``).
    """

    def eval_epoch(params, data, targets, sample_mask, rng, seqs=None,
                   offset0=None):
        n_batches = targets.shape[0]
        body = _eval_scan_body(loss_fn, rng, params, with_final_outputs=True)
        xs = _scan_inputs(data, targets, sample_mask,
                          seqs if with_seq else None)
        off = _base_offset(offset0)
        _, ys = jax.lax.scan(body, off, xs,
                             unroll=resolve_unroll(scan_unroll, n_batches))
        sums = {k: jnp.sum(ys[k], axis=0) for k in _GRID_KEYS}
        # (n_batches, B, C_d) -> (N, C_d)
        final_outputs = [o.reshape(-1, o.shape[-1]) for o in ys["final_outputs"]]
        return sums, final_outputs

    return jax.jit(eval_epoch)


# Fold constant for the per-epoch sample-permutation key. It shares the
# epoch key `erng` with the per-batch keys `fold_in(erng, batch_idx)`, so it
# must sit OUTSIDE the reachable batch_idx range — int32 max would need 2^31
# batches in one epoch to collide. (An earlier 777 collided at realistic
# scale: batch 777 of a >12k-sample, batch-16 epoch reused the permutation
# key for its dropout/shuffle draws.)
_PERM_FOLD = 2**31 - 1


def epoch_permute(data, targets, sample_mask, erng):
    """In-program per-epoch sample reshuffle for the fused multi-epoch
    programs: ONE shared permutation of the flattened (n_batches*B) sample
    axis, applied identically to data/targets/mask so triples stay aligned
    (padded rows travel with their mask=0 and land in arbitrary batches —
    every loss/metric is mask-exact, so only batch composition changes,
    which is exactly what torch's DataLoader(shuffle=True) changes)."""
    n_batches, batch = targets.shape[0], targets.shape[1]
    n = n_batches * batch
    perm = jax.random.permutation(jax.random.fold_in(erng, _PERM_FOLD), n)

    def regroup(a):
        flat = a.reshape((n,) + a.shape[2:])
        return jnp.take(flat, perm, axis=0).reshape(a.shape)

    return (jax.tree_util.tree_map(regroup, data), regroup(targets),
            regroup(sample_mask))


def epoch_permute_masked(data, targets, sample_mask, erng, n_real):
    """``epoch_permute`` for fold-PADDED stacks (the vmapped kfold with
    unequal fold batch counts): permute only the first ``n_real`` flattened
    sample slots — each fold's own nb_f*B slots, the exact domain per-fold
    ``fit_best``'s ``epoch_permute`` acts on — and keep the fold-padding
    tail fixed, so fully-padded batches stay fully padded (``gate_empty``
    keeps firing exactly) and padding never mixes into real batches.

    ``n_real`` is a traced scalar (a (F,) array under the fold vmap — the
    reason the shapes here must not depend on it). Algorithm: stable
    argsort of iid uniforms with +inf on padded slots — a uniformly random
    permutation of the real slots (argsort of distinct iid uniforms is
    uniform over permutations; NOT bit-identical to
    ``jax.random.permutation``'s sort-based shuffle, whose draw shape would
    have to be the traced ``n_real``)."""
    n_batches, batch = targets.shape[0], targets.shape[1]
    n = n_batches * batch
    r = jax.random.uniform(jax.random.fold_in(erng, _PERM_FOLD), (n,))
    r = jnp.where(jnp.arange(n) < n_real, r, jnp.inf)
    perm = jnp.argsort(r, stable=True)

    def regroup(a):
        flat = a.reshape((n,) + a.shape[2:])
        return jnp.take(flat, perm, axis=0).reshape(a.shape)

    return (jax.tree_util.tree_map(regroup, data), regroup(targets),
            regroup(sample_mask))


def _reshuffle_arrays(reshuffle, data, targets, mask, erng, n_real):
    """Shared reshuffle dispatch for the fused programs: False -> as-is,
    True -> ``epoch_permute``, 'masked' -> ``epoch_permute_masked`` (the
    caller must supply ``n_real``)."""
    if reshuffle == "masked":
        return epoch_permute_masked(data, targets, mask, erng, n_real)
    if reshuffle:
        return epoch_permute(data, targets, mask, erng)
    return data, targets, mask


def _emit_epoch_callback(on_epoch, ordered: bool = True, active=None,
                         **scalars):
    """Opt-in per-epoch progress hook: stream tiny scalar payloads to the
    host from INSIDE the fused program via jax.debug.callback. The
    reference can print per batch because its loop lives on the host
    (multimodn.py:214-220); fused multi-epoch dispatches are otherwise
    opaque until they return. Each emission costs one host round-trip per
    epoch (~30 ms on the tunnel link) — that is why it is opt-in.

    ``ordered=True`` (single-device): payloads arrive in epoch order.
    ``ordered=False`` (meshed programs — XLA rejects ordered effects in
    multi-device executables): one callback per epoch with the GLOBAL
    (fully-reduced) scalars, but arrival ORDER is not guaranteed; payloads
    carry their epoch id, and delivery before the fit call returns is
    still guaranteed (jax.effects_barrier).

    ``active``: the early-stop program's liveness flag. A vmapped
    ``lax.while_loop`` keeps executing the body for lanes whose own cond
    is already False (their carry is frozen via select AFTER the body) —
    the callback inside would otherwise fire phantom payloads for
    finished folds, carrying scores from discarded extra epochs. The flag
    is this lane's OWN cond at body entry; dispatchers drop payloads with
    ``_active == 0`` and strip the key before the user callback."""
    if on_epoch is not None:
        payload = dict(scalars)
        if active is not None:
            payload["_active"] = active
        jax.debug.callback(on_epoch, payload, ordered=ordered)


def make_fit_fn(loss_fn, tx, with_val: bool,
                gate_empty_batches: bool = False,
                scan_unroll=None, reshuffle: bool = False,
                on_epoch=None, on_epoch_ordered: bool = True):
    """Build the jitted MULTI-epoch training program: N epochs (optionally
    each followed by a validation sweep) in ONE device dispatch.

    This is capability the reference cannot express (its epoch loop is host
    Python — ``titanic_mlp_pipeline.py:83-86``): a ``lax.scan`` over epochs
    whose body is the batch ``lax.scan``, so a full 300-epoch Titanic training
    run is a single XLA program with exactly one host round-trip.

    Signature:
        (params, opt_state, data, targets, mask,
         [val_data, val_targets, val_mask,] epoch_ids, rng
         [, seqs, val_seqs])
        -> (params, opt_state, train_sums_stacked[, val_sums_stacked])
    where every entry of the sums dicts has a leading (n_epochs,) axis.
    Passing ``seqs``/``val_seqs`` (n_batches, L) threads per-batch encoder
    orders through the corresponding batch scan (requires a loss_fn built
    with ``per_batch_seq=True``; pass identity sequences for a loader
    without its own).
    """

    def run_train_epoch(params, opt_state, data, targets, sample_mask, rng,
                        seqs, offset):
        n_batches = targets.shape[0]
        body = _train_scan_body(loss_fn, tx, gate_empty_batches, rng)
        xs = _scan_inputs(data, targets, sample_mask, seqs)
        (params, opt_state, offset), ys = jax.lax.scan(
            body, (params, opt_state, offset), xs,
            unroll=resolve_unroll(scan_unroll, n_batches))
        return (params, opt_state, offset,
                {k: jnp.sum(v, axis=0) for k, v in ys.items()})

    def run_eval_epoch(params, data, targets, sample_mask, rng, seqs, offset):
        n_batches = targets.shape[0]
        body = _eval_scan_body(loss_fn, rng, params)
        xs = _scan_inputs(data, targets, sample_mask, seqs)
        offset, ys = jax.lax.scan(body, offset, xs,
                                  unroll=resolve_unroll(scan_unroll, n_batches))
        return offset, {k: jnp.sum(v, axis=0) for k, v in ys.items()}

    def train_arrays(data, targets, mask, erng):
        if reshuffle:
            return epoch_permute(data, targets, mask, erng)
        return data, targets, mask

    if with_val:
        def fit(params, opt_state, data, targets, mask,
                val_data, val_targets, val_mask, epoch_ids, rng,
                seqs=None, val_seqs=None, offset0=None):
            def epoch_body(carry, eid):
                params, opt_state, offset = carry
                erng = jax.random.fold_in(rng, eid)
                d, t, m = train_arrays(data, targets, mask, erng)
                params, opt_state, offset, tsums = run_train_epoch(
                    params, opt_state, d, t, m, erng, seqs, offset)
                offset, vsums = run_eval_epoch(
                    params, val_data, val_targets, val_mask, erng, val_seqs,
                    offset)
                _emit_epoch_callback(
                    on_epoch, on_epoch_ordered, epoch=eid,
                    train_loss=jnp.mean(tsums["err_loss"]) / targets.shape[0],
                    val_loss=jnp.mean(vsums["err_loss"])
                    / val_targets.shape[0])
                return (params, opt_state, offset), (tsums, vsums)

            (params, opt_state, _), (tsums, vsums) = jax.lax.scan(
                epoch_body, (params, opt_state, _base_offset(offset0)),
                epoch_ids)
            return params, opt_state, tsums, vsums
    else:
        def fit(params, opt_state, data, targets, mask, epoch_ids, rng,
                seqs=None, offset0=None):
            def epoch_body(carry, eid):
                params, opt_state, offset = carry
                erng = jax.random.fold_in(rng, eid)
                d, t, m = train_arrays(data, targets, mask, erng)
                params, opt_state, offset, tsums = run_train_epoch(
                    params, opt_state, d, t, m, erng, seqs, offset)
                _emit_epoch_callback(
                    on_epoch, on_epoch_ordered, epoch=eid,
                    train_loss=jnp.mean(tsums["err_loss"]) / targets.shape[0])
                return (params, opt_state, offset), tsums

            (params, opt_state, _), tsums = jax.lax.scan(
                epoch_body, (params, opt_state, _base_offset(offset0)),
                epoch_ids)
            return params, opt_state, tsums

    return jax.jit(fit, donate_argnums=(0, 1))


def make_selection_score(binary_decoders, gather=None):
    """Per-epoch checkpoint-selection score: sum over binary decoders of
    (validation AUROC + balanced accuracy) on the final encoder row's
    epoch-concatenated outputs — the reference MIMIC rule
    (``mimic_single_task_pipeline.py:141-158``).

    ``gather``: optional collective that turns shard-LOCAL flattened arrays
    into global ones (the shard_map engine passes an all_gather; the
    single-program engines pass nothing). AUROC (rank-based) and BAC
    (count-based) are sample-order-invariant, so gather order is immaterial.

    Shared by ``make_select_fit_fn`` and the shard_map twin so the
    normalization/NaN guards can never diverge between engines."""
    from multimodn_tpu.core.metrics import masked_binary_auroc

    if gather is None:
        gather = lambda x: x

    def selection_score(outputs, val_targets, val_mask):
        flat_t = gather(val_targets.reshape(-1, val_targets.shape[-1]))
        flat_m = gather(val_mask.reshape(-1))
        score = jnp.zeros(())
        for d, is_binary in enumerate(binary_decoders):
            if not is_binary:
                continue
            out = gather(outputs[d])
            # Row-sum normalization like the reference's test()
            # (multimodn.py:415) before taking the positive-class column.
            # Sign-preserving zero guard: the reference divides by the true
            # sum; clamping a NEGATIVE sum to +1e-12 would flip and explode
            # the normalized ordering for identity-activation decoders.
            s = jnp.sum(out, axis=1, keepdims=True)
            norm = out / jnp.where(jnp.abs(s) < 1e-12, 1e-12, s)
            auc = masked_binary_auroc(norm[:, 1], flat_t[:, d], flat_m)
            # BAC on argmax predictions over the whole epoch — identical to
            # (sens+spec)/2 from the final-row confusion counts.
            pred = jnp.argmax(norm, axis=1)
            tp = jnp.sum(flat_m * ((pred == 1) & (flat_t[:, d] == 1)))
            tn = jnp.sum(flat_m * ((pred == 0) & (flat_t[:, d] == 0)))
            fp = jnp.sum(flat_m * ((pred == 1) & (flat_t[:, d] == 0)))
            fn = jnp.sum(flat_m * ((pred == 0) & (flat_t[:, d] == 1)))
            sens = safe_div(tp, tp + fn)
            spec = safe_div(tn, tn + fp)
            score = score + auc + (sens + spec) / 2.0
        # NaN-diverged epochs must never win the strictly-greater update
        # (the reference's host-side NaN comparison is always False).
        return jnp.where(jnp.isnan(score), -jnp.inf, score)

    return selection_score


def _make_epoch_runners(loss_fn, tx, gate_empty_batches, scan_unroll):
    """The train/eval single-epoch scans shared by the select-fit programs
    (scan-based make_select_fit_fn and while_loop-based
    make_select_fit_early_stop_fn) — ONE definition so selection/epoch
    semantics can never diverge between the two."""

    def run_train_epoch(params, opt_state, data, targets, sample_mask, rng,
                        seqs, offset):
        body = _train_scan_body(loss_fn, tx, gate_empty_batches, rng)
        xs = _scan_inputs(data, targets, sample_mask, seqs)
        (params, opt_state, offset), ys = jax.lax.scan(
            body, (params, opt_state, offset), xs,
            unroll=resolve_unroll(scan_unroll, targets.shape[0]))
        return (params, opt_state, offset,
                {k: jnp.sum(v, axis=0) for k, v in ys.items()})

    def run_eval_epoch(params, data, targets, sample_mask, rng, seqs, offset):
        body = _eval_scan_body(loss_fn, rng, params, with_final_outputs=True)
        xs = _scan_inputs(data, targets, sample_mask, seqs)
        offset, ys = jax.lax.scan(
            body, offset, xs,
            unroll=resolve_unroll(scan_unroll, targets.shape[0]))
        sums = {k: jnp.sum(ys[k], axis=0) for k in _GRID_KEYS}
        outputs = [o.reshape(-1, o.shape[-1]) for o in ys["final_outputs"]]
        return offset, sums, outputs

    return run_train_epoch, run_eval_epoch


def _update_best(best, params, score, epoch_id):
    """Strictly-greater best-checkpoint update (reference's ``>`` at
    mimic_single_task_pipeline.py:149) shared by both select-fit programs."""
    best_params, best_score, best_epoch = best
    improved = score > best_score
    best_params = jax.tree_util.tree_map(
        lambda b, p: jnp.where(improved, p, b), best_params, params)
    return (best_params,
            jnp.where(improved, score, best_score),
            jnp.where(improved, epoch_id.astype(jnp.int32), best_epoch)), \
        improved


def make_select_fit_fn(loss_fn, tx, binary_decoders,
                       gate_empty_batches: bool = False,
                       scan_unroll=None, reshuffle: bool = False,
                       on_epoch=None, on_epoch_ordered: bool = True):
    """Fused multi-epoch training WITH on-device best-checkpoint selection.

    Reproduces the reference MIMIC experiment loop's per-epoch rule
    (``mimic_single_task_pipeline.py:141-158``): after each epoch, score =
    sum over decoders of (validation AUROC + balanced accuracy) on the
    final-encoder-row outputs; keep the parameters of the best epoch
    (strictly-greater update, like the reference's ``>`` comparison).

    Unlike the reference — which round-trips to the host and torch.saves a
    checkpoint file every improvement — the best parameter pytree rides the
    ``lax.scan`` carry on device; the whole (train + val + select) x N-epochs
    run is ONE dispatch.

    ``binary_decoders``: list of bool per decoder (AUROC/BAC need binary).
    """
    selection_score = make_selection_score(binary_decoders)
    run_train_epoch, run_eval_epoch = _make_epoch_runners(
        loss_fn, tx, gate_empty_batches, scan_unroll)

    def fit(params, opt_state, data, targets, mask,
            val_data, val_targets, val_mask, epoch_ids, rng,
            seqs=None, val_seqs=None, offset0=None, n_real=None):
        # best_score starts at -inf so epoch 0 always wins the strictly-
        # greater comparison; a constant-zero score can no longer leave
        # best_epoch at -1 and silently restore untrained parameters.
        best0 = (jax.tree_util.tree_map(lambda x: x, params),
                 jnp.full((), -jnp.inf), jnp.asarray(-1, jnp.int32))
        off0 = _base_offset(offset0)

        def epoch_body(carry, eid):
            params, opt_state, best, offset = carry
            erng = jax.random.fold_in(rng, eid)
            d, t, m = _reshuffle_arrays(reshuffle, data, targets, mask,
                                        erng, n_real)
            params, opt_state, offset, tsums = run_train_epoch(
                params, opt_state, d, t, m, erng, seqs, offset)
            offset, vsums, outputs = run_eval_epoch(
                params, val_data, val_targets, val_mask, erng, val_seqs,
                offset)
            score = selection_score(outputs, val_targets, val_mask)
            best, _improved = _update_best(best, params, score, eid)
            _emit_epoch_callback(
                on_epoch, on_epoch_ordered, epoch=eid,
                train_loss=jnp.mean(tsums["err_loss"]) / targets.shape[0],
                val_loss=jnp.mean(vsums["err_loss"]) / val_targets.shape[0],
                score=score)
            return (params, opt_state, best, offset), (tsums, vsums, score)

        (params, opt_state, best, _), (tsums, vsums, scores) = jax.lax.scan(
            epoch_body, (params, opt_state, best0, off0), epoch_ids)
        best_params, best_score, best_epoch = best
        return (params, opt_state, tsums, vsums,
                best_params, best_score, best_epoch, scores)

    return jax.jit(fit, donate_argnums=(1,))


def make_select_fit_early_stop_fn(loss_fn, tx, binary_decoders,
                                  gate_empty_batches: bool = False,
                                  scan_unroll=None,
                                  reshuffle: bool = False,
                                  on_epoch=None,
                                  on_epoch_ordered: bool = True):
    """``make_select_fit_fn`` with ON-DEVICE early stopping: the epoch loop
    is a ``lax.while_loop`` that exits once the validation AUROC+BAC score
    has not improved for ``patience`` consecutive epochs (data-dependent
    control flow the reference runs on the host — here the whole
    train+val+select+stop decision stays one dispatch, and unexecuted
    epochs cost zero device time).

    ``patience`` is a TRACED scalar argument, so one compiled program
    serves every patience value. Per-epoch outputs are written into
    preallocated (max_epochs, ...) buffers; ``epochs_ran`` tells the host
    how many leading rows are real. Semantics: best-epoch selection is
    identical to ``make_select_fit_fn`` over the epochs actually run.
    """
    selection_score = make_selection_score(binary_decoders)
    run_train_epoch, run_eval_epoch = _make_epoch_runners(
        loss_fn, tx, gate_empty_batches, scan_unroll)

    def fit(params, opt_state, data, targets, mask,
            val_data, val_targets, val_mask, epoch_ids, patience, rng,
            seqs=None, val_seqs=None, offset0=None, n_real=None):
        n_epochs = epoch_ids.shape[0]
        best0 = (jax.tree_util.tree_map(lambda x: x, params),
                 jnp.full((), -jnp.inf), jnp.asarray(-1, jnp.int32))
        off0 = _base_offset(offset0)

        def epoch_step(params, opt_state, offset, i, active):
            # i is the 0-based while counter; epoch_ids supplies the epoch
            # LABEL (rng stream + best_epoch value), same contract as the
            # scan-based fn — callers may pass non-zero-based ids.
            # ``active`` is this lane's own cond at body entry: under vmap
            # the body keeps running for stopped folds, and the payload
            # flag lets the host dispatcher drop those phantom emissions.
            eid = epoch_ids[i]
            erng = jax.random.fold_in(rng, eid)
            d, t, m = _reshuffle_arrays(reshuffle, data, targets, mask,
                                        erng, n_real)
            params, opt_state, offset, tsums = run_train_epoch(
                params, opt_state, d, t, m, erng, seqs, offset)
            offset, vsums, outputs = run_eval_epoch(
                params, val_data, val_targets, val_mask, erng, val_seqs,
                offset)
            score = selection_score(outputs, val_targets, val_mask)
            _emit_epoch_callback(
                on_epoch, on_epoch_ordered, active=active, epoch=eid,
                train_loss=jnp.mean(tsums["err_loss"]) / targets.shape[0],
                val_loss=jnp.mean(vsums["err_loss"]) / val_targets.shape[0],
                score=score)
            return params, opt_state, offset, tsums, vsums, score, eid

        # Preallocate the stacked per-epoch outputs (abstract shapes only —
        # eval_shape runs no FLOPs).
        t_sh, v_sh = jax.eval_shape(
            lambda p, o: jax.tree_util.tree_map(
                lambda x: x,
                epoch_step(p, o, off0, jnp.zeros((), jnp.int32),
                           jnp.ones((), jnp.bool_))[3:5]),
            params, opt_state)
        tbuf0 = jax.tree_util.tree_map(
            lambda s: jnp.zeros((n_epochs,) + s.shape, s.dtype), t_sh)
        vbuf0 = jax.tree_util.tree_map(
            lambda s: jnp.zeros((n_epochs,) + s.shape, s.dtype), v_sh)
        sbuf0 = jnp.zeros((n_epochs,), jnp.float32)
        patience = jnp.asarray(patience, jnp.int32)

        def cond(carry):
            (_p, _o, _b, _off, eid, since, _tb, _vb, _sb) = carry
            # Keras semantics: stop once `patience` consecutive epochs ran
            # without improvement (since counts them).
            return jnp.logical_and(eid < n_epochs, since < patience)

        def body(carry):
            params, opt_state, best, offset, i, since, tbuf, vbuf, sbuf = \
                carry
            active = jnp.logical_and(i < n_epochs, since < patience)
            params, opt_state, offset, tsums, vsums, score, eid = epoch_step(
                params, opt_state, offset, i, active)
            best, improved = _update_best(best, params, score, eid)
            since = jnp.where(improved, 0, since + 1)
            tbuf = jax.tree_util.tree_map(
                lambda buf, v: buf.at[i].set(v), tbuf, tsums)
            vbuf = jax.tree_util.tree_map(
                lambda buf, v: buf.at[i].set(v), vbuf, vsums)
            sbuf = sbuf.at[i].set(score)
            return (params, opt_state, best, offset, i + 1, since,
                    tbuf, vbuf, sbuf)

        carry0 = (params, opt_state, best0, off0,
                  jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                  tbuf0, vbuf0, sbuf0)
        (params, opt_state, best, _off, eid, _since, tbuf, vbuf, sbuf) = \
            jax.lax.while_loop(cond, body, carry0)
        best_params, best_score, best_epoch = best
        return (params, opt_state, tbuf, vbuf,
                best_params, best_score, best_epoch, sbuf, eid)

    return jax.jit(fit, donate_argnums=(1,))


def make_forward_fn(encoders, decoders, init_state,
                    order: Sequence[Tuple[int, int]], nan_skip: str,
                    chain: str = "unrolled"):
    """Jitted inference over one padded batch.

    Returns (predictions (E+1, D, B) argmax classes, outputs list, states).
    Matches ``MultiModN.predict`` (``multimodn.py:422-458``), which does NOT
    NaN-skip — callers choose ``nan_skip='none'`` for that parity.
    """
    if chain == "scan" and has_repeated_encoders(order):
        raise ValueError(
            "encoding sequences with REPEATED encoders need the unrolled "
            "chain (see make_batch_loss_fn); use chain_mode='unrolled' or "
            "'auto'.")

    @functools.partial(jax.jit, static_argnames=("train",))
    def forward(params, data, sample_mask, rng=None, init_offset=0, train=False):
        if chain == "scan":
            from multimodn_tpu.core.scan_chain import forward_chain_scan
            states, _, row_ok, _, final_state = forward_chain_scan(
                encoders[0], len(encoders), init_state, params, data,
                sample_mask,
                data_order=jnp.asarray([d for d, _e in order], jnp.int32),
                enc_order=jnp.asarray([e for _d, e in order], jnp.int32),
                nan_skip=nan_skip, train=train, rng=rng,
                init_offset=init_offset)
        elif has_repeated_encoders(order):
            # Per-execution run folded back to encoder-indexed rows (the
            # reference's predict indexes outputs[enc_idx+1] too).
            states_x, sc_x, ok_x, cnt_x, final_state = \
                forward_chain_executions(
                    encoders, init_state, params, data, sample_mask,
                    order=order, nan_skip=nan_skip, train=train, rng=rng,
                    init_offset=init_offset)
            n_enc = len(encoders)
            rows = n_enc + 1
            # Placeholder rows repeat the INITIAL state, like
            # fusion.forward_chain's `[state] + [state] * n_enc` — zeros
            # would make never-executed / all-executions-skipped rows
            # decode as decoder(0) instead of the skip passthrough.
            states = jnp.stack([states_x[0]] * rows)
            for k, (_d, e) in enumerate(order):
                states = states.at[e + 1].set(
                    jnp.where(ok_x[k + 1] > 0, states_x[k + 1],
                              states[e + 1]))
        else:
            states, _, row_ok, _, final_state = forward_chain(
                encoders, init_state, params, data, sample_mask,
                order=order, nan_skip=nan_skip, train=train, rng=rng,
                init_offset=init_offset,
            )
        outputs = [dec.apply(params["decoders"][d], states)
                   for d, dec in enumerate(decoders)]
        preds = jnp.stack([jnp.argmax(o, axis=-1) for o in outputs], axis=1)
        return preds, outputs, states, final_state

    return forward
