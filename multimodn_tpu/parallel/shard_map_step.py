"""Explicit-collective data-parallel training step via shard_map.

The default DP path lets XLA derive the gradient all-reduce from sharding
annotations (parallel/sharding.py). This module is the explicit variant: the
per-device step runs under ``jax.shard_map`` with hand-placed ``psum``
collectives over the ``data`` mesh axis — useful when you want deterministic
collective placement (e.g. to overlap or fuse them manually) or to extend
toward custom pallas collectives (see ops/ and the ring patterns in the
Pallas guide).

Note: use with ``nan_skip='sample'`` — per-sample masking composes across
shards; the batch-granular parity mode would make per-shard skip decisions
(the auto-sharded epoch programs handle that mode globally).

Semantics: identical to the auto-sharded step — per-device batch shards
compute local grads and local metric grids; ``psum`` averages grads by
GLOBAL valid-sample weighting and sums the count grids, so results match
single-device execution exactly (masked means are weighted by each shard's
valid-sample count, not per-device means of means).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodn_tpu.core.step import _GRID_KEYS


def make_shard_map_train_step(loss_fn, tx, mesh: Mesh, n_modalities: int,
                              data_axis: str = "data"):
    """Build a jitted explicit-DP train step.

    Signature: (params, opt_state, data tuple of (B, F_m), targets (B, D),
    mask (B,), rng) -> (params, opt_state, grid_sums) where B is the GLOBAL
    batch (sharded over ``data_axis``).

    The inner loss is re-weighted so that the psum of shard losses equals the
    global masked mean: each shard contributes mean_local * n_valid_local /
    n_valid_global.
    """

    def device_step(params, opt_state, data, targets, mask, rng):
        # Global valid count via psum of the local count.
        local_valid = jnp.sum(mask)
        global_valid = jax.lax.psum(local_valid, data_axis)

        def scaled_loss(params):
            loss, aux = loss_fn(params, data, targets, mask, rng,
                                jnp.zeros(()), True)
            # loss is a masked MEAN over the local shard; convert to the
            # global mean: sum over shards of (local_mean * local_n) / N.
            scale = jnp.where(global_valid > 0,
                              local_valid / jnp.maximum(global_valid, 1.0),
                              0.0)
            return loss * scale, aux

        (loss, aux), grads = jax.value_and_grad(scaled_loss, has_aux=True)(
            params)
        grads = jax.lax.psum(grads, data_axis)          # global-mean grads
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        # Count grids sum across shards; the loss grid is a masked mean, so
        # weight it like the loss before summing.
        sums = {}
        for k in _GRID_KEYS:
            v = aux[k]
            if k in ("err_loss", "state_change"):
                scale = jnp.where(global_valid > 0,
                                  local_valid / jnp.maximum(global_valid, 1.0),
                                  0.0)
                v = v * scale
            sums[k] = jax.lax.psum(v, data_axis)
        return params, opt_state, sums

    data_specs = tuple(P(data_axis) for _ in range(n_modalities))
    in_specs = (P(), P(), data_specs, P(data_axis), P(data_axis), P())
    out_specs = (P(), P(), P())

    step = jax.shard_map(device_step, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    return jax.jit(step)


def make_shard_map_epoch_fn(loss_fn, tx, mesh: Mesh, n_modalities: int,
                            data_axis: str = "data", scan_unroll=None,
                            donate: bool = True):
    """Whole-EPOCH explicit-DP training: the batch ``lax.scan`` runs INSIDE
    one ``shard_map`` region, so each device scans its local batch shards and
    the only cross-device traffic is one grad ``psum`` + one metric ``psum``
    per batch step — the same collective schedule the auto-sharded epoch
    program reaches via SPMD partitioning, but placed explicitly.

    Signature matches ``core.step.make_train_epoch_fn``:
        (params, opt_state, data, targets, sample_mask, rng)
        -> (params, opt_state, epoch_sums, batch_log)
    with data/targets/mask shaped (n_batches, B_global, ...) and the batch
    axis sharded over ``data_axis``. Equivalence with the auto-sharded path
    is tested on the virtual 8-device mesh (tests/test_shard_map.py) and
    micro-benchmarked in examples/shard_map_epoch_bench.py.

    ``n_modalities=None`` accepts one pre-stacked (n_batches, B, E, F) data
    array (the scan-chain layout) instead of a tuple. Caveats: per-sample
    rng draws (dropout) and StaticInitState cycling see shard-local views,
    so stochastic-encoder runs are deterministic but not bit-equal to
    single-device; use the auto engine when that parity matters.
    """
    from multimodn_tpu.core.step import resolve_unroll

    def device_epoch(params, opt_state, data, targets, sample_mask, rng):
        n_batches = targets.shape[0]

        def body(carry, xs):
            params, opt_state, offset = carry
            batch_data, batch_targets, batch_mask, batch_idx = xs
            batch_rng = jax.random.fold_in(rng, batch_idx)
            local_valid = jnp.sum(batch_mask)
            global_valid = jax.lax.psum(local_valid, data_axis)
            scale = jnp.where(global_valid > 0,
                              local_valid / jnp.maximum(global_valid, 1.0),
                              0.0)

            def scaled_loss(p):
                loss, aux = loss_fn(p, batch_data, batch_targets, batch_mask,
                                    batch_rng, offset, True)
                return loss * scale, aux

            (loss, aux), grads = jax.value_and_grad(
                scaled_loss, has_aux=True)(params)
            grads = jax.lax.psum(grads, data_axis)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                            updates)
            offset = offset + global_valid
            ys = {}
            for k in _GRID_KEYS:
                v = aux[k]
                if k in ("err_loss", "state_change"):
                    v = v * scale
                ys[k] = jax.lax.psum(v, data_axis)
            ys["batch_log"] = jnp.stack([
                jax.lax.psum(loss, data_axis),
                jax.lax.psum(aux["global_err"] * scale, data_axis),
                jax.lax.psum(aux["global_sc"] * scale, data_axis)])
            return (params, opt_state, offset), ys

        xs = (data, targets, sample_mask, jnp.arange(n_batches))
        (params, opt_state, _), ys = jax.lax.scan(
            body, (params, opt_state, jnp.zeros(())), xs,
            unroll=resolve_unroll(scan_unroll, n_batches))
        batch_log = ys.pop("batch_log")
        sums = {k: jnp.sum(v, axis=0) for k, v in ys.items()}
        return params, opt_state, sums, batch_log

    if n_modalities is None:
        data_specs = P(None, data_axis)
    else:
        data_specs = tuple(P(None, data_axis) for _ in range(n_modalities))
    in_specs = (P(), P(), data_specs, P(None, data_axis),
                P(None, data_axis), P())
    out_specs = (P(), P(), P(), P())
    epoch = jax.shard_map(device_epoch, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
    donate_argnums = (0, 1) if donate else ()
    return jax.jit(epoch, donate_argnums=donate_argnums)
