"""The fusion core: the whole MultiModN step as one traced computation.

Reference behavior being rebuilt (``multimodn/multimodn.py:117-204``): thread a
shared state vector through E per-modality encoders; after the initial state
and after every encoder step, evaluate every decoder head, producing an
``(E+1) x D`` grid of losses / correct-counts / binary-confusion counts; loss
is the grid mean plus an L2 state-change penalty.

TPU-first design decisions (vs the reference's per-cell Python loops):

- The encoder chain is unrolled at trace time (E is small and static); every
  intermediate state lands in an ``(E+1, B, S)`` stack.
- Each decoder evaluates the FULL stack in one batched matmul — all
  ``(E+1) * D`` grid cells come from D contractions, not (E+1)*D Python calls.
- NaN-missingness skipping (reference ``multimodn.py:167-169``) is a validity
  mask with ``jnp.where`` state passthrough. ``nan_skip='batch'`` reproduces
  the reference's batch-granular skip exactly; ``nan_skip='sample'`` (default)
  is the strict per-sample generalization that removes the reference's
  batch_size=1 requirement for missingness experiments
  (``titanic_missingness_pipeline.py:35``); ``nan_skip='none'`` matches
  ``predict()``'s no-skip behavior (``multimodn.py:445-449``, quirk #9).
- Variable batch tails are padded to static shapes; a per-sample mask keeps
  every mean/count exact, so XLA compiles the step once.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from multimodn_tpu.core.metrics import binary_confusion_counts



def _chain_dtype(data):
    """Floating dtype of the incoming modality arrays (post mixed-precision
    cast): tuple of per-modality arrays or one stacked array."""
    leaf = data[0] if isinstance(data, (tuple, list)) else data
    return leaf.dtype

def default_order(n_encoders: int) -> Tuple[Tuple[int, int], ...]:
    """Identity (data_idx, enc_idx) pairing (reference ``multimodn.py:516``)."""
    return tuple((i, i) for i in range(n_encoders))


def global_any(flag, nan_axis: Optional[str]):
    """Make the batch-granular any-NaN decision GLOBAL across explicit
    shards. The reference skips an encoder when ANY row of the whole batch
    is NaN (``multimodn.py:167-169``); under the auto engine the batch is
    one logical array, so ``jnp.any`` already reduces globally (GSPMD
    inserts the collective). Inside a ``shard_map`` region the same
    ``jnp.any`` sees only the LOCAL shard — ``nan_axis`` names the data
    mesh axis and a ``psum`` of the local flag restores the whole-batch
    decision, so every shard skips (or runs) the encoder in lockstep."""
    if nan_axis is None:
        return flag
    return jax.lax.psum(flag.astype(jnp.float32), nan_axis) > 0


def masked_mean_sq_diff(new_state, old_state, sample_mask):
    """State-change penalty term: mean over (valid samples x features) of the
    squared state delta (reference ``multimodn.py:174``). Accumulated in
    float32 regardless of the compute dtype."""
    diff = (new_state.astype(jnp.float32) - old_state.astype(jnp.float32))
    per_sample = jnp.mean(diff ** 2, axis=-1)
    m = sample_mask.astype(per_sample.dtype)
    return jnp.sum(per_sample * m) / jnp.maximum(jnp.sum(m), 1.0)


def _split_stacked_data(data):
    """Twin of ``_unstack_view`` for the data side: scan-plan models carry
    ONE (B, E, ...) modality array (``MultiModN._place`` fuses the tuple so
    epoch scans have a single xs leaf); the per-encoder-indexed chains need
    the tuple back. The constant-index slices fold away under jit. Bare
    per-modality tuples/lists pass through untouched."""
    if isinstance(data, (tuple, list)):
        return data
    return tuple(data[:, k] for k in range(data.shape[1]))


def _unstack_view(params: dict, n_enc: int) -> dict:
    """Serve scan-STACKED encoder storage to the per-encoder-indexed chains
    as a traced view (repeated-encoder downgrade on scan-plan models): the
    constant-index slices fold away under jit and gradients flow back into
    the stacked leaves, so the model's canonical storage / optimizer state
    / checkpoints stay stacked."""
    if isinstance(params.get("encoders"), (list, tuple)):
        return params
    from multimodn_tpu.core.scan_chain import unstack_encoder_params
    return dict(params,
                encoders=unstack_encoder_params(params["encoders"], n_enc))


def init_chain_state(init_state, params: dict, batch: int, init_offset,
                     data):
    """Initial state for a chain run, dtype-aligned with the modality data.

    The alignment matters under bf16 mixed precision: a ``StaticInitState``
    bank lives OUTSIDE ``params`` (fp32), so the params/data cast never
    reaches it and without this cast the whole chain would silently promote
    back to fp32."""
    state = init_state.apply(params["init_state"], batch, init_offset)
    return state.astype(_chain_dtype(data))


def chain_step_skip(run: Callable, x, old_state, sample_mask, n_real, *,
                    nan_skip: str, nan_axis: Optional[str],
                    mask_aware: bool = True):
    """One encoder step's NaN-skip semantics — the single implementation
    shared by every chain form (unrolled ``forward_chain``, execution-indexed
    ``forward_chain_executions``, and scan_chain's scan/switch chains), so the
    batch-granular global any-NaN decision and the per-sample passthrough can
    never diverge between chain modes (reference ``multimodn.py:167-169``).

    ``run(x, eff_mask_or_None)`` executes the encoder on the (NaN-zeroed)
    input; ``eff_mask`` is the per-sample validity the encoder may use for
    batch statistics. Mask-aware encoders (ResNet BatchNorm) must exclude
    BOTH padded rows and NaN-missing rows: a missing row's ``nan_to_num``
    zeros would otherwise shift the batch statistics the PRESENT rows are
    normalized with, even though the missing row's own state update is
    discarded below. Callers whose encoder is not mask-aware pass
    ``mask_aware=False`` — ``run`` then receives ``None`` and the effective
    mask is never materialized (keeps the traced program for the common
    non-mask-aware chains identical to the pre-helper form, so warmed
    compile caches stay hot).

    Returns ``(state, ok, counted)`` — the post-step state (with skip
    passthrough applied), the row-liveness scalar, and the row's
    sample-count increment (reference ``multimodn.py:105,121,171``).
    """
    if nan_skip == "none":
        # predict() parity: NaNs flow straight into the encoder (quirk #9);
        # the mask excludes padded rows only.
        return run(x, sample_mask if mask_aware else None), \
            jnp.ones(()), n_real
    nan_here = jnp.isnan(x)
    if x.ndim > 1:
        sample_has_nan = jnp.any(nan_here, axis=tuple(range(1, x.ndim)))
    else:
        sample_has_nan = nan_here
    xz = jnp.nan_to_num(x)
    eff_mask = sample_mask * (~sample_has_nan).astype(sample_mask.dtype) \
        if mask_aware else None
    new_state = run(xz, eff_mask)
    if nan_skip == "batch":
        # Reference semantics: ONE NaN anywhere in the (real) batch skips
        # this encoder for the whole batch (multimodn.py:167-169) — a
        # GLOBAL decision across explicit shards (global_any).
        any_nan = global_any(
            jnp.any(sample_has_nan & (sample_mask > 0)), nan_axis)
        ok = jnp.where(any_nan, 0.0, 1.0)
        state = jnp.where(any_nan, old_state, new_state)
        counted = n_real * ok
    elif nan_skip == "sample":
        # Per-sample generalization: only samples with a valid modality
        # advance their state; everyone stays in the metrics.
        valid = (~sample_has_nan) & (sample_mask > 0)
        state = jnp.where(valid[:, None], new_state, old_state)
        ok = jnp.ones(())
        counted = n_real
    else:
        raise ValueError(f"Unknown nan_skip mode {nan_skip!r}")
    return state, ok, counted


def forward_chain(
    encoders: Sequence,
    init_state,
    params: dict,
    data: Sequence[jnp.ndarray],
    sample_mask: jnp.ndarray,
    *,
    order: Sequence[Tuple[int, int]],
    nan_skip: str = "sample",
    train: bool = False,
    rng: Optional[jax.Array] = None,
    init_offset=0,
    nan_axis: Optional[str] = None,
):
    """Run the encoder chain, collecting per-metric-row states.

    ``nan_axis``: shard_map data-axis name for the batch-granular any-NaN
    decision (see ``global_any``); None under jit/auto-sharding.

    Returns:
        states_by_row: (E+1, B, S) — row 0 is the initial state, row e+1 the
            state right after encoder e ran (execution order may differ from
            row order under permuted ``order``); never-executed rows repeat the
            last available state of row 0 (they are masked out via row_ok).
        state_change: (E,) masked mean squared state deltas per encoder row.
        row_ok: (E+1,) 1.0 where the row's grid cells are live this batch.
        n_counted: (E+1,) per-row sample-count increments for the accuracy
            denominators (reference ``multimodn.py:105,121,171``).
    """
    n_enc = len(encoders)
    batch = sample_mask.shape[0]
    n_real = jnp.sum(sample_mask.astype(jnp.float32))
    params = _unstack_view(params, n_enc)
    data = _split_stacked_data(data)

    state = init_chain_state(init_state, params, batch, init_offset, data)

    states_rows: List = [state] + [state] * n_enc  # placeholder rows
    state_change = [jnp.zeros(()) for _ in range(n_enc)]
    row_ok = [jnp.ones(())] + [jnp.zeros(()) for _ in range(n_enc)]
    n_counted = [n_real] + [jnp.zeros(()) for _ in range(n_enc)]

    for k, (data_idx, enc_idx) in enumerate(order):
        enc = encoders[enc_idx]
        x = data[data_idx]
        old_state = state
        step_rng = None
        if rng is not None:
            step_rng = jax.random.fold_in(rng, k)
        mask_aware = getattr(enc, "_accepts_sample_mask", False)

        def run(xv, m, _p=params["encoders"][enc_idx], _s=state,
                _rng=step_rng, _enc=enc, _aware=mask_aware):
            kw = {"sample_mask": m} if _aware else {}
            return _enc.apply(_p, _s, xv, train=train, rng=_rng, **kw)

        state, ok, counted = chain_step_skip(
            run, x, old_state, sample_mask, n_real,
            nan_skip=nan_skip, nan_axis=nan_axis, mask_aware=mask_aware)

        states_rows[enc_idx + 1] = state
        state_change[enc_idx] = masked_mean_sq_diff(state, old_state, sample_mask)
        row_ok[enc_idx + 1] = ok
        n_counted[enc_idx + 1] = counted

    states_by_row = jnp.stack(states_rows)             # (E+1, B, S)
    state_change = jnp.stack(state_change)             # (E,)
    row_ok = jnp.stack(row_ok)                         # (E+1,)
    n_counted = jnp.stack(n_counted)                   # (E+1,)
    # NOTE: row order is metric-row order (enc_idx + 1), which differs from
    # execution order under permuted `order`; `state` is the final EXECUTED
    # state (what the reference's get_states returns, multimodn.py:490).
    return states_by_row, state_change, row_ok, n_counted, state


def has_repeated_encoders(order) -> bool:
    """True when an encoder id appears more than once in a static order —
    legal in the reference (any encoding_sequence list), but its metric
    accumulation is per-EXECUTION into the encoder-indexed row
    (multimodn.py:171-192: counts '+=' per execution, err_loss/state_change
    assigned by the LAST non-skipped execution), which the one-row-per-
    encoder fast path cannot express."""
    encs = [int(e) for _d, e in order]
    return len(set(encs)) < len(encs)


def forward_chain_executions(
    encoders: Sequence,
    init_state,
    params: dict,
    data: Sequence[jnp.ndarray],
    sample_mask: jnp.ndarray,
    *,
    order: Sequence[Tuple[int, int]],
    nan_skip: str = "sample",
    train: bool = False,
    rng: Optional[jax.Array] = None,
    init_offset=0,
    nan_axis: Optional[str] = None,
):
    """Execution-indexed variant of ``forward_chain`` for orders with
    repeated encoders: row k+1 is the state after the k-th EXECUTION
    (whatever encoder it ran), leaving the encoder-row combination to
    ``combine_executions``. Same skip semantics per execution.

    Returns (states (K+1, B, S), state_change (K,), ok (K+1,),
    counted (K+1,), final_state).
    """
    batch = sample_mask.shape[0]
    n_real = jnp.sum(sample_mask.astype(jnp.float32))
    params = _unstack_view(params, len(encoders))
    data = _split_stacked_data(data)
    state = init_chain_state(init_state, params, batch, init_offset, data)

    states_rows: List = [state]
    sc_exec: List = []
    ok_exec: List = [jnp.ones(())]
    cnt_exec: List = [n_real]

    for k, (data_idx, enc_idx) in enumerate(order):
        enc = encoders[enc_idx]
        x = data[data_idx]
        old_state = state
        step_rng = jax.random.fold_in(rng, k) if rng is not None else None
        mask_aware = getattr(enc, "_accepts_sample_mask", False)

        def run(xv, m, _p=params["encoders"][enc_idx], _s=state,
                _rng=step_rng, _enc=enc, _aware=mask_aware):
            kw = {"sample_mask": m} if _aware else {}
            return _enc.apply(_p, _s, xv, train=train, rng=_rng, **kw)

        state, ok, counted = chain_step_skip(
            run, x, old_state, sample_mask, n_real,
            nan_skip=nan_skip, nan_axis=nan_axis, mask_aware=mask_aware)

        states_rows.append(state)
        sc_exec.append(masked_mean_sq_diff(state, old_state, sample_mask))
        ok_exec.append(ok)
        cnt_exec.append(counted)

    return (jnp.stack(states_rows), jnp.stack(sc_exec), jnp.stack(ok_exec),
            jnp.stack(cnt_exec), state)


def combine_executions(order, n_enc: int, exec_grid: dict, sc_exec,
                       ok_exec, cnt_exec, exec_outputs):
    """Fold an execution-indexed grid back into the reference's
    encoder-indexed (E+1, D) grid for orders with repeated encoders
    (multimodn.py:171-192):

    - n_correct / tp / tn / fp / fn / n_counted ACCUMULATE over the row's
      executions ('+=' per non-skipped execution; skipped executions
      contribute their already-zeroed cells);
    - err_loss, per-row decoder outputs, and state_change take the LAST
      NON-SKIPPED execution's value (reference assigns; a skipped execution
      'continue's past the assignment);
    - a row is live (row_ok) if ANY of its executions ran.
    """
    rows = n_enc + 1
    D = exec_grid["err_loss"].shape[1]

    err = jnp.zeros((rows, D)).at[0].set(exec_grid["err_loss"][0])
    ncorr = jnp.zeros((rows, D)).at[0].set(exec_grid["n_correct"][0])
    conf = {k: jnp.zeros((rows, D)).at[0].set(exec_grid[k][0])
            for k in ("tp", "tn", "fp", "fn")}
    n_counted = jnp.zeros((rows,)).at[0].set(cnt_exec[0])
    row_ok = jnp.zeros((rows,)).at[0].set(1.0)
    state_change = jnp.zeros((n_enc,))
    outputs = [jnp.zeros((rows,) + o.shape[1:], o.dtype).at[0].set(o[0])
               for o in exec_outputs]

    for k, (_d, e) in enumerate(order):
        r, x = e + 1, k + 1
        live = ok_exec[x] > 0
        err = err.at[r].set(jnp.where(live, exec_grid["err_loss"][x], err[r]))
        ncorr = ncorr.at[r].add(exec_grid["n_correct"][x])
        for key in conf:
            # NaN columns (non-binary decoders) stay NaN under addition.
            conf[key] = conf[key].at[r].add(exec_grid[key][x])
        n_counted = n_counted.at[r].add(cnt_exec[x])
        row_ok = row_ok.at[r].max(ok_exec[x])
        state_change = state_change.at[e].set(
            jnp.where(live, sc_exec[k], state_change[e]))
        outputs = [o.at[r].set(jnp.where(live, eo[x], o[r]))
                   for o, eo in zip(outputs, exec_outputs)]

    combined = {"err_loss": err, "n_correct": ncorr, "n_counted": n_counted,
                "row_ok": row_ok, "state_change": state_change,
                "outputs": outputs}
    combined.update(conf)
    return combined


def decode_grid(
    decoders: Sequence,
    params: dict,
    states_by_row: jnp.ndarray,
    targets: jnp.ndarray,
    sample_mask: jnp.ndarray,
    row_ok: jnp.ndarray,
    criterion: Callable,
):
    """Evaluate every decoder on every state row; emit all per-cell stats.

    Args:
        states_by_row: (E+1, B, S).
        targets: (B, D) integer labels.
        sample_mask: (B,).
        row_ok: (E+1,) row liveness (batch-granular skip zeroes dead rows, as
            the reference leaves those grid cells at 0 — multimodn.py:123,167).
    Returns dict with:
        err_loss: (E+1, D); n_correct: (E+1, D);
        tp/tn/fp/fn: (E+1, D) (NaN columns for non-binary decoders, matching
        reference compute_metrics' NaN fill — multimodn.py:59-63);
        outputs: list of D arrays (E+1, B, C_d) raw decoder outputs.
    """
    n_rows = states_by_row.shape[0]
    mask_f = sample_mask.astype(jnp.float32)
    row_mask = row_ok[:, None] * mask_f[None, :]        # (E+1, B)

    err_cols, corr_cols = [], []
    tp_cols, tn_cols, fp_cols, fn_cols = [], [], [], []
    outputs = []
    for d, dec in enumerate(decoders):
        out = dec.apply(params["decoders"][d], states_by_row)   # (E+1, B, C)
        # Losses and metrics always reduce in float32 (mixed-precision safe).
        out = out.astype(jnp.float32)
        outputs.append(out)
        tgt = jnp.broadcast_to(targets[:, d][None, :], (n_rows, targets.shape[0]))
        if criterion_accepts_mask(criterion):
            ce = criterion(out, tgt, row_mask)
        else:
            # Reference-style 2-arg criteria expect ONE (B, C)/(B,) batch per
            # call (multimodn.py:146) — vmap over the metric-row axis so a
            # criterion that reduces to a scalar yields per-row losses
            # instead of broadcasting one global mean into every grid cell.
            ce = jax.vmap(lambda o, t: jnp.asarray(criterion(o, t)))(out, tgt)
        if ce.shape != (n_rows,):
            raise ValueError(
                f"criterion must reduce each (B, C) row to a scalar; got "
                f"shape {ce.shape} for {n_rows} rows. Mask-aware criteria "
                f"take (outputs, targets, mask) and return per-row means.")
        # criterion returns (E+1,) means; dead rows contribute 0 like the
        # reference's never-written grid cells.
        err_cols.append(ce * row_ok)

        pred = jnp.argmax(out, axis=-1)
        corr = jnp.sum((pred == tgt).astype(jnp.float32) * row_mask, axis=-1)
        corr_cols.append(corr)

        if dec.n_classes == 2:
            tp, tn, fp, fn = binary_confusion_counts(pred, tgt, row_mask)
        else:
            nanrow = jnp.full((n_rows,), jnp.nan)
            tp = tn = fp = fn = nanrow
        tp_cols.append(tp); tn_cols.append(tn)
        fp_cols.append(fp); fn_cols.append(fn)

    stack = lambda cols: jnp.stack(cols, axis=1)        # (E+1, D)
    return {
        "err_loss": stack(err_cols),
        "n_correct": stack(corr_cols),
        "tp": stack(tp_cols),
        "tn": stack(tn_cols),
        "fp": stack(fp_cols),
        "fn": stack(fn_cols),
        "outputs": outputs,
    }


def criterion_accepts_mask(criterion) -> bool:
    """Built-in losses take (outputs, targets, mask); user callables may not."""
    return getattr(criterion, "_accepts_mask", True)
