"""Mask-aware encoders under NaN skip (round-5 review finding).

A mask-aware encoder (``_accepts_sample_mask`` — e.g. ResNet's train-mode
BatchNorm) folds the rows it is shown into batch statistics. Under
``nan_skip='sample'`` a NaN-missing row's state update is discarded via the
``jnp.where`` passthrough, but the encoder still RAN on its ``nan_to_num``
zeros — so those zeros must be excluded from the statistics the PRESENT
rows are normalized with. ``core.fusion.chain_step_skip`` passes every
chain form the effective mask (real & modality-present); these tests pin
that for all four chain implementations.

Also pins ``make_forward_fn``'s repeated-encoder placeholder rows (initial
state, not zeros).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodn_tpu.core.fusion import (default_order, forward_chain,
                                       forward_chain_executions)
from multimodn_tpu.core.scan_chain import (forward_chain_scan,
                                           forward_chain_switch)
from multimodn_tpu.core.state import TrainableInitState


class BatchStatEncoder:
    """Minimal mask-aware encoder: ``state + masked batch-mean(x)`` — the
    smallest computation whose present-row output is contaminated by any
    row wrongly included in the batch statistics (a stand-in for ResNet
    BatchNorm, encoders/resnet.py:206-217)."""

    _accepts_sample_mask = True

    def __init__(self, state_size: int, n_features: int = 2):
        self.state_size = state_size
        self.n_features = n_features

    def apply(self, params, state, x, *, train=False, rng=None,
              sample_mask=None):
        if sample_mask is None:
            w = jnp.ones((x.shape[0],), jnp.float32)
        else:
            w = sample_mask.astype(jnp.float32)
        mean = jnp.sum(x * w[:, None]) / jnp.maximum(jnp.sum(w), 1.0)
        return state + mean


B, S, F = 6, 3, 2
NAN_ROWS = (0, 3)
PAD_ROWS = (5,)


def _setup():
    init_state = TrainableInitState(S)
    ip = init_state.init(jax.random.PRNGKey(0))
    params = {"init_state": ip, "encoders": [{}]}
    rng = np.random.default_rng(7)
    x = rng.normal(size=(B, F)).astype(np.float32)
    x[list(NAN_ROWS), 0] = np.nan
    mask = np.ones((B,), np.float32)
    mask[list(PAD_ROWS)] = 0.0
    state0 = np.asarray(init_state.apply(ip, B, 0))
    # Expected present-row update: batch mean over rows that are BOTH real
    # (mask=1) and modality-present (no NaN).
    present = [i for i in range(B) if i not in NAN_ROWS and i not in PAD_ROWS]
    good_mean = float(np.sum(x[present]) / len(present))
    return init_state, params, jnp.asarray(x), jnp.asarray(mask), \
        state0, good_mean, present


def _check(final_state, state0, good_mean, present):
    final = np.asarray(final_state)
    for i in range(B):
        if i in present:
            np.testing.assert_allclose(final[i], state0[i] + good_mean,
                                       rtol=1e-5,
                                       err_msg=f"present row {i}")
        elif i in NAN_ROWS:
            np.testing.assert_allclose(final[i], state0[i], rtol=1e-6,
                                       err_msg=f"missing row {i} passthrough")


def test_unrolled_chain_excludes_nan_rows_from_batch_stats():
    init_state, params, x, mask, state0, good_mean, present = _setup()
    enc = BatchStatEncoder(S, F)
    *_, final = forward_chain([enc], init_state, params, (x,), mask,
                              order=default_order(1), nan_skip="sample")
    _check(final, state0, good_mean, present)


def test_executions_chain_excludes_nan_rows_from_batch_stats():
    init_state, params, x, mask, state0, good_mean, present = _setup()
    enc = BatchStatEncoder(S, F)
    *_, final = forward_chain_executions(
        [enc], init_state, params, (x,), mask,
        order=default_order(1), nan_skip="sample")
    _check(final, state0, good_mean, present)


def test_scan_chain_excludes_nan_rows_from_batch_stats():
    init_state, params, x, mask, state0, good_mean, present = _setup()
    enc = BatchStatEncoder(S, F)
    *_, final = forward_chain_scan(
        enc, 1, init_state, params, (x,), mask,
        data_order=jnp.zeros((1,), jnp.int32),
        enc_order=jnp.zeros((1,), jnp.int32), nan_skip="sample")
    _check(final, state0, good_mean, present)


def test_switch_chain_excludes_nan_rows_from_batch_stats():
    init_state, params, x, mask, state0, good_mean, present = _setup()
    enc = BatchStatEncoder(S, F)
    *_, final = forward_chain_switch(
        [enc], init_state, params, (x,), mask,
        data_order=jnp.zeros((1,), jnp.int32),
        enc_order=jnp.zeros((1,), jnp.int32), nan_skip="sample")
    _check(final, state0, good_mean, present)


@pytest.mark.parametrize("chain_fn", ["unrolled", "executions"])
def test_batch_mode_discards_whole_step(chain_fn):
    """Batch granularity: one NaN anywhere skips the step wholesale — every
    row (present or not) keeps the initial state."""
    init_state, params, x, mask, state0, *_ = _setup()
    enc = BatchStatEncoder(S, F)
    fn = forward_chain if chain_fn == "unrolled" else forward_chain_executions
    *_, final = fn([enc], init_state, params, (x,), mask,
                   order=default_order(1), nan_skip="batch")
    np.testing.assert_allclose(np.asarray(final), state0, rtol=1e-6)


def test_padded_rows_still_excluded_without_nans():
    """The pre-existing padded-row exclusion is preserved: with no NaNs the
    effective mask is exactly sample_mask."""
    init_state, params, x, mask, state0, *_ = _setup()
    x = jnp.nan_to_num(x)  # drop the NaNs, keep the padding
    enc = BatchStatEncoder(S, F)
    real = [i for i in range(B) if i not in PAD_ROWS]
    mean_real = float(np.sum(np.asarray(x)[real]) / len(real))
    *_, final = forward_chain([enc], init_state, params, (x,), mask,
                              order=default_order(1), nan_skip="sample")
    np.testing.assert_allclose(np.asarray(final)[real[0]],
                               state0[real[0]] + mean_real, rtol=1e-5)


def test_forward_fn_repeated_skipped_rows_hold_initial_state():
    """make_forward_fn's repeated-encoder branch: rows whose executions were
    all skipped must hold the INITIAL state (fusion.forward_chain's
    placeholder), not zeros — zeros made them decode as decoder(0)."""
    from multimodn_tpu import MultiModN
    from multimodn_tpu.core.step import make_forward_fn
    from multimodn_tpu.decoders import LogisticDecoder
    from multimodn_tpu.encoders import MLPFeatureEncoder

    model = MultiModN(S, [MLPFeatureEncoder(S, 4)], [LogisticDecoder(S)],
                      0.7, 0.3)
    order = ((0, 0), (0, 0))  # repeated encoder -> executions branch
    fwd = make_forward_fn(model.encoders, model.decoders, model.init_state,
                          order, nan_skip="batch")
    x = jnp.ones((4, 1), jnp.float32).at[1, 0].set(jnp.nan)
    mask = jnp.ones((4,), jnp.float32)
    _preds, _outputs, states, final = fwd(model.params, (x,), mask)
    state0 = model.init_state.apply(model.params["init_state"], 4, 0)
    # Both executions batch-skipped: every row passthrough == initial state.
    np.testing.assert_allclose(np.asarray(states[1]), np.asarray(state0),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(final), np.asarray(state0),
                               rtol=1e-6)
