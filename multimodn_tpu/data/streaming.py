"""Streaming training path: datasets larger than device memory.

``ArrayLoader`` materializes the WHOLE epoch on device — the right call for
the reference's dataset sizes (MIMIC: ~340 MB ≪ 16 GB HBM) because it makes
every epoch one dispatch. Production corpora can exceed HBM; this module is
the complement: host-resident data, a per-batch jitted train step, and
double-buffered host->device transfer so the copy of batch k+1 overlaps the
compute of batch k (JAX dispatches asynchronously; ``device_put`` ahead of
use is the prefetch).

Semantics are identical to the fused path: the SAME ``make_batch_loss_fn``
program runs per batch, metric grids accumulate on device, and one transfer
at epoch end returns the sums — verified equal to ``train_epoch`` in
tests/test_streaming.py. The reference has no counterpart (its DataLoader
re-copies per batch with no overlap, ``multimodn.py:132-135``).
"""
from __future__ import annotations

import math
from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodn_tpu.data.loader import _materialize


class StreamingLoader:
    """Host-resident batches, yielded as numpy, with stable epoch geometry.

    Mirrors ArrayLoader's contract (batch_size/shuffle/reshuffle,
    padded-tail masks, n_batches) without ever building device-side epoch
    stacks; batches stream through ``iter_batches()``.
    """

    def __init__(self, dataset, batch_size: int = 0, shuffle: bool = False,
                 seed: int = 0):
        xs, y, seq = _materialize(dataset)
        if y.shape[0] == 0:
            raise ValueError("StreamingLoader got an empty dataset")
        if seq is not None:
            raise NotImplementedError(
                "StreamingLoader does not carry encoding sequences; use "
                "ArrayLoader for sequence-carrying datasets.")
        if y.ndim == 1:
            y = y[:, None]
        self._xs = [np.asarray(x, np.float32) for x in xs]
        self._y = np.asarray(y, np.int32)
        self.n_samples = self._y.shape[0]
        self.batch_size = batch_size if batch_size > 0 else self.n_samples
        self.n_batches = max(1, math.ceil(self.n_samples / self.batch_size))
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self._order = np.arange(self.n_samples)

    def __len__(self) -> int:
        return self.n_batches

    def reshuffle(self):
        if self.shuffle:
            self._rng.shuffle(self._order)

    def iter_batches(self) -> Iterator[Tuple[List[np.ndarray], np.ndarray,
                                             np.ndarray]]:
        """Yield (data list, targets, sample_mask), each padded to the
        static batch size so one jitted step serves every batch."""
        B = self.batch_size
        for b in range(self.n_batches):
            idx = self._order[b * B:(b + 1) * B]
            n = idx.shape[0]
            mask = np.zeros((B,), np.float32)
            mask[:n] = 1.0
            data = []
            for x in self._xs:
                buf = np.zeros((B,) + x.shape[1:], np.float32)
                buf[:n] = x[idx]
                data.append(buf)
            targets = np.zeros((B, self._y.shape[1]), np.int32)
            targets[:n] = self._y[idx]
            yield data, targets, mask


def train_epoch_streaming(model, loader: StreamingLoader, optimizer,
                          criterion=None, history=None):
    """One training epoch over a StreamingLoader: per-batch jitted steps,
    device-resident metric accumulation, double-buffered host->device copies.

    Matches ``MultiModN.train_epoch`` on an ArrayLoader of the same data
    bit-for-bit (dropout-free models; tests/test_streaming.py).
    """
    from multimodn_tpu.core.losses import resolve_criterion
    from multimodn_tpu.core.step import _GRID_KEYS, epoch_reduction, \
        gated_update

    criterion = resolve_criterion(criterion)
    if model._opt is not optimizer or model.opt_state is None:
        model._opt = optimizer
        model.opt_state = optimizer.init(model.params)
    loader.reshuffle()
    order = model._resolve_order(None, None, train=True)
    loss_fn = model._loss_fn(criterion, order, model.nan_skip)

    from multimodn_tpu.model import _cache_key
    key = ("stream_step", _cache_key(criterion), order, model.nan_skip,
           _cache_key(optimizer.tx), model._chain_plan(),
           str(model.compute_dtype))
    if key not in model._fn_cache:
        tx = optimizer.tx

        @jax.jit
        def step(params, opt_state, sums, offset, data, targets, mask, rng):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, tuple(data), targets, mask, rng, offset, True)
            params, opt_state = gated_update(tx, grads, opt_state, params,
                                             mask,
                                             enc_gates=aux["enc_gates"])
            sums = {k: sums[k] + aux[k] for k in _GRID_KEYS}
            return (params, opt_state, sums,
                    offset + jnp.sum(mask).astype(jnp.int32))

        model._fn_cache[key] = step
    step = model._fn_cache[key]

    E, D = len(model.encoders), len(model.decoders)
    sums = {
        "err_loss": jnp.zeros((E + 1, D)),
        "state_change": jnp.zeros((E,)),
        "n_correct": jnp.zeros((E + 1, D)),
        "tp": jnp.zeros((E + 1, D)), "tn": jnp.zeros((E + 1, D)),
        "fp": jnp.zeros((E + 1, D)), "fn": jnp.zeros((E + 1, D)),
        "n_counted": jnp.zeros((E + 1,)),
    }
    rng = jax.random.fold_in(jax.random.PRNGKey(model._seed),
                             model._epoch_counter)
    model._epoch_counter += 1
    # Shared-cycle base (StaticInitState phase continues across calls,
    # reference state.py:41); None means offsets are ignored -> start at 0.
    # The counter advances by SAMPLES consumed, after the epoch succeeds.
    offset = model._cycle_base()
    if offset is None:
        offset = jnp.zeros((), jnp.int32)

    # Double buffer: put batch k+1 on device while batch k computes (JAX
    # dispatch is async, so device_put overlaps the in-flight step).
    it = loader.iter_batches()
    pending: Optional[tuple] = None

    def put(batch):
        data, targets, mask = batch
        return (tuple(jax.device_put(d) for d in data),
                jax.device_put(targets), jax.device_put(mask))

    nxt = next(it, None)
    b = 0
    while nxt is not None:
        cur = pending if pending is not None else put(nxt)
        nxt = next(it, None)
        pending = put(nxt) if nxt is not None else None
        data, targets, mask = cur
        batch_rng = jax.random.fold_in(rng, b)
        model.params, model.opt_state, sums, offset = step(
            model.params, model.opt_state, sums, offset,
            data, targets, mask, batch_rng)
        b += 1

    model._advance_cycle(loader.n_samples)
    stats = jax.tree_util.tree_map(
        np.asarray, epoch_reduction(sums, loader.n_batches,
                                    model.ones_initialized_counts))
    if history is not None:
        history.append_epoch("train", stats,
                             state_change=stats["state_change_loss"])
    return stats
