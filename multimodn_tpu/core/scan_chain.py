"""Scanned encoder chain for homogeneous encoder stacks.

The default fusion core unrolls the E-step chain at trace time
(``core/fusion.py``) — ideal for small heterogeneous chains. When every
encoder is structurally identical (same class, same layer dims — true for
every shipped featurewise pipeline and any large-E configuration), the chain
compiles to a single ``lax.scan`` step over STACKED parameters instead:

- trace/compile size is O(1) in E (featurewise MIMIC would be E≈1900 —
  unrollable, trivially scannable);
- the modality order becomes a traced gather, so the reference's
  ``shuffle_mode`` (fresh encoder order per batch,
  ``multimodn.py:527-529``) runs INSIDE the jitted program via
  ``jax.random.permutation`` — no retrace per permutation;
- dataset-supplied ``encoding_sequence`` is the same gather with a fixed
  index array.

SURVEY §5 (long-context note): the "sequence" dimension of this architecture
is the modality chain; this module is its O(E)-compiled-steps scaling path.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from multimodn_tpu.core.fusion import (chain_step_skip, init_chain_state,
                                       masked_mean_sq_diff)


def encoders_homogeneous(encoders: Sequence) -> bool:
    """True when all encoders share class, layer dims, and activation — the
    condition for stacking their parameter pytrees."""
    if len(encoders) < 1:
        return False
    first = encoders[0]
    for enc in encoders[1:]:
        if type(enc) is not type(first):
            return False
        for attr in ("_layer_dims", "_dims", "hidden_layers", "n_features",
                     "state_size", "dropout_rate", "unbatched_compat",
                     # Config attrs whose values do NOT change parameter
                     # SHAPES (so stacking would succeed) but DO change the
                     # computation — they must match or the scan chain would
                     # silently run every step with encoders[0]'s config.
                     "n_heads", "embed_dim", "n_layers", "mlp_ratio",
                     "chunk", "freeze"):
            if getattr(enc, attr, None) != getattr(first, attr, None):
                return False
        if getattr(enc, "activation", None) is not \
                getattr(first, "activation", None):
            return False
    return True


def stack_encoder_params(params_list) -> dict:
    """[per-encoder pytree] -> pytree with a leading (E,) axis per leaf."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_list)


def unstack_encoder_params(stacked, n: int) -> list:
    """Inverse of ``stack_encoder_params`` as a traced VIEW: per-encoder
    pytrees sliced from the stacked storage. Under jit the constant-index
    slices fold away (and gradients flow back into the stacked leaves), so
    the unrolled chain can read scan-stacked models without converting the
    model's canonical storage — the repeated-encoder downgrade path."""
    return [jax.tree_util.tree_map(lambda x: x[e], stacked)
            for e in range(n)]


def forward_chain_scan(
    encoder,                      # the (shared-structure) encoder module
    n_encoders: int,
    init_state,
    params: dict,                 # full model params (per-encoder list)
    data,                         # (B, E, F) array OR tuple of E (B, F)
    sample_mask: jnp.ndarray,
    *,
    data_order: jnp.ndarray,      # (E,) int32: modality index per step
    enc_order: jnp.ndarray,       # (E,) int32: encoder index per step
    nan_skip: str = "sample",
    train: bool = False,
    rng: Optional[jax.Array] = None,
    init_offset=0,
    nan_axis: Optional[str] = None,
):
    """Scan-based equivalent of ``fusion.forward_chain`` for homogeneous
    chains. Same contract: returns (states_by_row (E+1, B, S), state_change
    (E,), row_ok (E+1,), n_counted (E+1,), final_state).

    ``data`` should arrive as ONE (B, E, F) array (the loader/model stack the
    modalities once) — passing E separate arrays makes XLA's scan-operand
    count O(E) and compile time superlinear in E. A tuple is still accepted
    for small E.
    """
    E = n_encoders
    batch = sample_mask.shape[0]
    n_real = jnp.sum(sample_mask.astype(jnp.float32))
    # Scan-mode models store encoder params already stacked (leading E axis
    # per leaf) so the jit signature, gradients, and optimizer update are
    # O(1) in E — a per-encoder list would put O(E) leaves in the program
    # and make XLA compile time superlinear in E.
    enc_params = params["encoders"]
    stacked = stack_encoder_params(enc_params) \
        if isinstance(enc_params, (list, tuple)) else enc_params
    mask_aware = getattr(encoder, "_accepts_sample_mask", False)
    if isinstance(data, (tuple, list)):
        data_stack = jnp.stack(data)                  # (E, B, F)
    else:
        data_stack = jnp.swapaxes(data, 0, 1)         # (B, E, F) -> (E, B, F)

    state0 = init_chain_state(init_state, params, batch, init_offset, data)

    def step(carry, xs):
        state = carry
        k, d_idx, e_idx = xs
        x = data_stack[d_idx]
        p_k = jax.tree_util.tree_map(lambda s: s[e_idx], stacked)
        step_rng = jax.random.fold_in(rng, k) if rng is not None else None
        old_state = state

        def run(xv, m, _p=p_k, _s=state, _rng=step_rng):
            kw = {"sample_mask": m} if mask_aware else {}
            return encoder.apply(_p, _s, xv, train=train, rng=_rng, **kw)

        state, ok, counted = chain_step_skip(
            run, x, old_state, sample_mask, n_real,
            nan_skip=nan_skip, nan_axis=nan_axis, mask_aware=mask_aware)
        sc = masked_mean_sq_diff(state, old_state, sample_mask)
        return state, (state, sc, ok, counted, e_idx)

    n_steps = data_order.shape[0]
    xs = (jnp.arange(n_steps), data_order.astype(jnp.int32),
          enc_order.astype(jnp.int32))
    final_state, (states_exec, sc_exec, ok_exec, counted_exec, e_idx_exec) = \
        jax.lax.scan(step, state0, xs)

    return _scatter_rows(E, state0, states_exec, sc_exec, ok_exec,
                         counted_exec, e_idx_exec, n_real, final_state)


def _scatter_rows(E, state0, states_exec, sc_exec, ok_exec, counted_exec,
                  e_idx_exec, n_real, final_state):
    """Map execution-order results into metric-row order (row enc_idx + 1).

    Deterministic LAST-execution-wins for sequences that repeat an encoder
    index (``.at[dups].set`` has unspecified winner order in XLA): for each
    row, gather from the latest step that wrote it — matching the unrolled
    chain, where later loop iterations overwrite the row."""
    n_steps = e_idx_exec.shape[0]
    last_k = jnp.full((E,), -1, jnp.int32).at[e_idx_exec].max(
        jnp.arange(n_steps, dtype=jnp.int32))
    executed = last_k >= 0                                  # (E,)
    idx = jnp.maximum(last_k, 0)
    # Never-executed rows carry the initial state, like the unrolled chain's
    # placeholders (fusion.forward_chain:81); row_ok masks them either way.
    rows = jnp.where(executed[:, None, None], states_exec[idx],
                     state0[None].astype(states_exec.dtype))
    states_by_row = jnp.concatenate([state0[None], rows], axis=0)
    state_change = jnp.where(executed, sc_exec[idx], 0.0)
    row_ok = jnp.concatenate(
        [jnp.ones((1,)), jnp.where(executed, ok_exec[idx], 0.0)])
    n_counted = jnp.concatenate(
        [n_real[None], jnp.where(executed, counted_exec[idx], 0.0)])
    return states_by_row, state_change, row_ok, n_counted, final_state


def forward_chain_switch(
    encoders,                     # heterogeneous encoder modules
    init_state,
    params: dict,                 # per-encoder parameter LIST
    data,                         # tuple of E (B, F_e) arrays
    sample_mask: jnp.ndarray,
    *,
    data_order: jnp.ndarray,      # (n_steps,) int32 — traced OK
    enc_order: jnp.ndarray,       # (n_steps,) int32 — traced OK
    nan_skip: str = "sample",
    train: bool = False,
    rng=None,
    init_offset=0,
    nan_axis: Optional[str] = None,
):
    """Dynamic (traced) encoder order for HETEROGENEOUS chains.

    The scan step dispatches with ``lax.switch`` over E encoder branches;
    modality inputs are zero-padded to the max width and each branch slices
    its own width statically. This is what makes the reference's per-batch
    ``shuffle_mode`` (``multimodn.py:527-529``) jit-compatible for chains
    that mix encoder classes/widths — the homogeneous fast path is
    ``forward_chain_scan``. Same return contract.
    """
    E = len(encoders)
    batch = sample_mask.shape[0]
    n_real = jnp.sum(sample_mask.astype(jnp.float32))
    fmax = max(d.shape[-1] for d in data)
    data_pad = jnp.stack([
        jnp.pad(d, ((0, 0), (0, fmax - d.shape[-1]))) for d in data
    ])                                                  # (E, B, Fmax)

    state0 = init_chain_state(init_state, params, batch, init_offset, data)

    def make_branch(j):
        enc = encoders[j]
        # Slice to the ENCODER's input width, not modality j's: under a
        # permuted (data_idx, enc_idx) pairing encoder j can receive any
        # modality (they must agree in width for the pairing to be valid,
        # exactly as in the reference where the matmul would fail otherwise;
        # the model validates width compatibility host-side).
        width = getattr(enc, "n_features", None) or data[j].shape[-1]
        aware = getattr(enc, "_accepts_sample_mask", False)

        def branch(operand):
            # eff_mask rides the operand (it varies per STEP, with the
            # modality's NaN rows removed); mask-awareness per BRANCH.
            state, x_pad, step_rng, eff_mask = operand
            kw = {"sample_mask": eff_mask} if aware else {}
            return enc.apply(params["encoders"][j], state, x_pad[:, :width],
                             train=train, rng=step_rng, **kw)
        return branch

    branches = [make_branch(j) for j in range(E)]
    # The switch operand carries eff_mask for ALL branches; materialize it
    # when ANY branch consumes it (branches that don't, ignore it).
    mask_aware = any(getattr(e, "_accepts_sample_mask", False)
                     for e in encoders)

    def step(carry, xs):
        state = carry
        k, d_idx, e_idx = xs
        x = data_pad[d_idx]
        step_rng = jax.random.fold_in(rng, k) if rng is not None else None
        old_state = state

        def run(xv, m, _s=state, _rng=step_rng):
            return jax.lax.switch(e_idx, branches, (_s, xv, _rng, m))

        state, ok, counted = chain_step_skip(
            run, x, old_state, sample_mask, n_real,
            nan_skip=nan_skip, nan_axis=nan_axis, mask_aware=mask_aware)
        sc = masked_mean_sq_diff(state, old_state, sample_mask)
        return state, (state, sc, ok, counted, e_idx)

    n_steps = data_order.shape[0]
    xs = (jnp.arange(n_steps), data_order.astype(jnp.int32),
          enc_order.astype(jnp.int32))
    final_state, (states_exec, sc_exec, ok_exec, counted_exec, e_idx_exec) = \
        jax.lax.scan(step, state0, xs)
    return _scatter_rows(E, state0, states_exec, sc_exec, ok_exec,
                         counted_exec, e_idx_exec, n_real, final_state)
