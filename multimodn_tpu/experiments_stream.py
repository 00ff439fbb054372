"""Streamed experiment programs (VERDICT r4 next-#2): ``kfold_fit_best`` /
``sweep_fit_best`` over StreamingLoaders — the north-star MIMIC protocol
(reference ``mimic_single_task_pipeline.py:98-158``) when per-fold epoch
stacks do not fit HBM.

Architecture: the fold/seed axis stays ``jax.vmap``ped (fold-batched
matmuls, ONE dispatch per batch for ALL folds — F x fewer dispatches than
looping ``fit_best_streaming`` per fold), but batches stream host->device
per step exactly like ``data/streaming.fit_best_streaming``: params,
optimizer state, metric sums, the best-checkpoint carry and the val-output
selection buffers are all device-resident with a leading fold axis; only
scalars and final results transfer.

Folds with fewer batches than the longest are padded with EMPTY batches
(zero data, zero mask) gated off exactly via ``gated_update`` — the same
construction the fused ``kfold_fit_best`` uses, so results are bit-equal
to it (hence to per-fold ``fit_best``) on data that fits
(tests/test_experiments_stream.py). Early stopping (``patience``) freezes
finished folds at epoch granularity, matching the fused while_loop's
frozen-lane semantics; the stop decision costs one (F,) bool fetch per
epoch.

Scope: auto engine only. ``dp_engine='shard_map'`` templates are rejected
(the explicit engine's streamed per-batch step exists for single models —
``data/streaming._sm_stream_step`` — but fold-vmapping it buys nothing the
auto engine's GSPMD partition does not already do here; use auto-engine
models, the equality tests cover both constructions of the same math).
A model-owned mesh IS supported: stacked (F, B, ...) batches shard their
batch axis over the mesh's ``data`` axis.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodn_tpu.core.fusion import default_order
from multimodn_tpu.core.losses import resolve_criterion
from multimodn_tpu.core.step import (_GRID_KEYS, _update_best, gated_update,
                                     make_selection_score)


def is_streaming_loader(ldr) -> bool:
    """Streaming-protocol detection: iter_batches + no device epoch stacks.
    ArrayLoader exposes host_stacks; streaming loaders expose iter_batches."""
    return hasattr(ldr, "iter_batches")


def _require_sized(ldr, role: str):
    if getattr(ldr, "n_batches", None) is None or \
            getattr(ldr, "n_samples", None) is None:
        raise NotImplementedError(
            f"streamed experiment programs need sized {role} geometry "
            f"(n_batches/n_samples); this loader wraps an unsized iterable "
            f"dataset. Use a sized loader.")


def _validate_streamed(template, loaders, mesh, patience):
    if template.dp_engine == "shard_map":
        raise NotImplementedError(
            "streamed kfold/sweep supports the auto (GSPMD) engine only: "
            "fold-vmapping the explicit shard_map per-batch step adds no "
            "collective the auto partition lacks here. Build auto-engine "
            "models (equality across engines is pinned for the non-vmapped "
            "streamed paths in tests/test_streaming.py).")
    if mesh is not None:
        raise ValueError(
            "fold/seed-axis sharding (mesh=) is a fused-path feature; the "
            "streamed programs shard the BATCH axis via the model's own "
            "mesh instead (model_factory models may carry mesh=).")
    if patience is not None and patience < 1:
        raise ValueError(f"patience must be >= 1, got {patience}")
    for ldr in loaders:
        if getattr(ldr, "shuffle", False):
            raise NotImplementedError(
                "streamed kfold/sweep cannot honor shuffle=True loaders "
                "(same contract as fit_best_streaming: the fused path's "
                "in-program permutation crosses batch boundaries); "
                "pre-shuffle the data once or use the fused programs.")
    sizes = {ldr.batch_size for ldr in loaders}
    if len(sizes) != 1:
        raise ValueError(
            f"all fold loaders must share one batch size (the vmapped "
            f"per-batch step has static shapes), got {sorted(sizes)}")
    from multimodn_tpu.data.streaming import _check_streaming_model
    _check_streaming_model(template, *loaders)


def _batch_put_folds(model):
    """Placer for (F, B, ...) fold-stacked per-batch arrays: batch axis
    (axis 1) sharded over the model mesh's ``data`` axis, fold axis
    replicated — the stacked twin of ``data/streaming._batch_put``."""
    if model.mesh is None:
        return jax.device_put
    from jax.sharding import NamedSharding, PartitionSpec
    sharding = NamedSharding(model.mesh, PartitionSpec(None, "data"))
    return lambda x: jax.device_put(x, sharding)


def _stream_experiment_fns(template, criterion, optimizer, order, binary):
    """Build (or fetch from the structural program cache) the jitted
    vmapped per-batch programs: train step, val step, per-fold selection,
    and the per-fold freeze select. Cache discipline mirrors
    ``experiments._cached_select_fit`` — protocol loops re-use traces."""
    from multimodn_tpu.experiments import _FIT_PROGRAM_CACHE, \
        _model_signature

    sig = _model_signature(template)
    opt_sig = getattr(optimizer, "signature", None)
    key = None
    if sig is not None and opt_sig is not None and \
            (isinstance(criterion, str) or
             getattr(criterion, "__module__", "").startswith(
                 "multimodn_tpu.")):
        crit_key = criterion if isinstance(criterion, str) \
            else ("fn", criterion)
        key = ("stream_experiment", sig, crit_key, opt_sig, tuple(order),
               tuple(binary))
        try:
            cached = _FIT_PROGRAM_CACHE.get(key)
        except TypeError:
            key, cached = None, None
        if cached is not None:
            return cached

    loss_fn = template._loss_fn(criterion, order, template.nan_skip)
    tx = optimizer.tx
    selection_score = make_selection_score(binary)

    def tstep1(params, opt_state, sums, offset, erng, data, targets, mask,
               b):
        brng = jax.random.fold_in(erng, b)
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, tuple(data), targets, mask, brng, offset, True)
        # Folds padded to a common batch count produce fully-empty batches:
        # gate them off exactly, like the fused kfold's gate_empty=True.
        params, opt_state = gated_update(tx, grads, opt_state, params, mask,
                                         True, enc_gates=aux["enc_gates"])
        sums = {k: sums[k] + aux[k] for k in _GRID_KEYS}
        return (params, opt_state, sums,
                offset + jnp.sum(mask).astype(jnp.int32))

    def vstep1(params, sums, offset, bufs, tbuf, mbuf, erng, b, data,
               targets, mask):
        brng = jax.random.fold_in(erng, b)
        _, aux = loss_fn(params, tuple(data), targets, mask, brng, offset,
                         False)
        B = mask.shape[0]
        at = b * B
        upd = lambda buf, o: jax.lax.dynamic_update_slice_in_dim(
            buf, o.astype(buf.dtype), at, axis=0)
        bufs = [upd(buf, o) for buf, o in zip(bufs, aux["final_outputs"])]
        tbuf = upd(tbuf, targets)
        mbuf = upd(mbuf, mask)
        sums = {k: sums[k] + aux[k] for k in _GRID_KEYS}
        return (sums, offset + jnp.sum(mask).astype(jnp.int32), bufs, tbuf,
                mbuf)

    def select1(best, params, bufs, tbuf, mbuf, eid):
        score = selection_score(bufs, tbuf, mbuf)
        best, improved = _update_best(best, params, score, eid)
        return best, score, improved

    # b and eid are shared scalars; everything else carries the fold axis.
    vt = jax.vmap(tstep1, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None))
    vv = jax.vmap(vstep1, in_axes=(0, 0, 0, 0, 0, 0, 0, None, 0, 0, 0))
    tstep, vstep = jax.jit(vt), jax.jit(vv)
    select = jax.jit(jax.vmap(select1, in_axes=(0, 0, 0, 0, 0, None)))

    # Seed-sweep twins: ONE host copy of the shared batch, seed axis added
    # by jnp.broadcast_to INSIDE jit — lazy under XLA, and the vmapped core
    # then sees exactly the fold-stacked shapes, matching the fused
    # sweep_fit_best's construction (in_axes=None instead changes the
    # dot_general batching and rounds differently — see experiments.py).
    def tstep_shared(params, opt_state, sums, offset, erng, data, targets,
                     mask, b):
        F = erng.shape[0]
        bc = lambda x: jnp.broadcast_to(x, (F,) + x.shape)
        return vt(params, opt_state, sums, offset, erng,
                  tuple(bc(d) for d in data), bc(targets), bc(mask), b)

    def vstep_shared(params, sums, offset, bufs, tbuf, mbuf, erng, b, data,
                     targets, mask):
        F = erng.shape[0]
        bc = lambda x: jnp.broadcast_to(x, (F,) + x.shape)
        return vv(params, sums, offset, bufs, tbuf, mbuf, erng, b,
                  tuple(bc(d) for d in data), bc(targets), bc(mask))

    tstep_shared, vstep_shared = jax.jit(tstep_shared), jax.jit(vstep_shared)

    def fold_erngs(rngs, eid):
        return jax.vmap(lambda r: jax.random.fold_in(r, eid))(rngs)

    def freeze(active, new, old):
        """Per-fold epoch-granular freeze: folds whose early-stop cond was
        False at epoch entry keep their pre-epoch carry — the vmapped
        while_loop's frozen-lane rule, applied host-side."""
        def sel(n, o):
            a = active.reshape((-1,) + (1,) * (n.ndim - 1))
            return jnp.where(a, n, o)
        return jax.tree_util.tree_map(sel, new, old)

    fns = (tstep, vstep, select, tstep_shared, vstep_shared,
           jax.jit(fold_erngs), jax.jit(freeze))
    if key is not None:
        _FIT_PROGRAM_CACHE[key] = fns
    return fns


def _stack_fold_batches(batches, widths, B, n_targets):
    """Stack per-fold (data, targets, mask) batches — None entries (folds
    already exhausted this epoch) become empty padded batches."""
    datas, targets, masks = [], [], []
    for batch in batches:
        if batch is None:
            datas.append([np.zeros((B, w), np.float32) for w in widths])
            targets.append(np.zeros((B, n_targets), np.int32))
            masks.append(np.zeros((B,), np.float32))
        else:
            d, t, m = batch
            datas.append([x.reshape(B, -1) for x in d])
            targets.append(t)
            masks.append(m)
    data = tuple(np.stack([d[i] for d in datas])
                 for i in range(len(widths)))
    return data, np.stack(targets), np.stack(masks)


def kfold_fit_best_streamed(
    model_factory: Callable[[int], "MultiModN"],
    folds: Sequence[Tuple],
    optimizer,
    criterion=None,
    epochs: int = 1,
    seeds: Optional[Sequence[int]] = None,
    patience: Optional[int] = None,
    on_epoch: Optional[Callable] = None,
    _shared_loaders: bool = False,
) -> List[dict]:
    """Streamed twin of ``experiments.kfold_fit_best`` — called by it when
    the fold loaders are StreamingLoaders (use that entry point).
    ``_shared_loaders=True`` is the seed-sweep construction: folds is
    [(train, val)] replicated logically over seeds; each batch is read
    once and broadcast on device."""
    criterion = resolve_criterion(criterion)
    from multimodn_tpu.experiments import _check_vmap_safe
    _check_vmap_safe(optimizer)
    folds = list(folds)
    n_folds = len(folds) if not _shared_loaders else len(seeds)
    seeds = list(seeds) if seeds is not None else list(range(n_folds))
    models = [model_factory(s) for s in seeds]
    template = models[0]
    binary = [d.n_classes == 2 for d in template.decoders]
    if not any(binary):
        raise ValueError(
            "kfold_fit_best requires at least one binary (n_classes==2) "
            "decoder: the AUROC+BAC selection score is undefined otherwise "
            "(same contract as MultiModN.fit_best).")
    all_loaders = [ldr for pair in folds for ldr in pair]
    for ldr in all_loaders:
        _require_sized(ldr, "fold")
    _validate_streamed(template, all_loaders, None, patience)
    if template.shuffle_mode and not template._chain_plan()[1]:
        raise NotImplementedError(
            "streamed kfold/sweep supports shuffle_mode only for chains "
            "that shuffle in-program (same rule as kfold_fit_best).")
    order = template._resolve_order(None, None, train=True)
    if tuple(order) != tuple(default_order(len(template.encoders))):
        raise NotImplementedError(
            "streamed experiment programs carry no encoding sequences "
            "(StreamingLoaders reject them at construction).")
    for ldr in all_loaders:
        template._validate_pairings(order, ldr)

    (tstep, vstep, select, tstep_shared, vstep_shared, fold_erngs,
     freeze) = _stream_experiment_fns(template, criterion, optimizer, order,
                                      binary)
    if _shared_loaders:
        tstep, vstep = tstep_shared, vstep_shared

    B = all_loaders[0].batch_size
    widths = [int(w) for w in all_loaders[0].modality_widths]
    n_targets = len(template.decoders)
    max_tb = max(f[0].n_batches for f in folds)
    max_vb = max(f[1].n_batches for f in folds)
    n_val = max_vb * B
    F = n_folds
    E, D = len(template.encoders), len(template.decoders)

    params = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[m.params for m in models])
    opt_state = jax.vmap(optimizer.tx.init)(params)
    rngs = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(m._seed), 0)
                      for m in models])
    offsets = jnp.stack([
        jnp.zeros((), jnp.int32) if m._cycle_base() is None
        else jnp.asarray(m._cycle_base(), jnp.int32) for m in models])
    best = (jax.tree_util.tree_map(lambda x: x, params),
            jnp.full((F,), -jnp.inf), jnp.full((F,), -1, jnp.int32))

    if _shared_loaders:
        # ONE host copy per shared batch: seed axis added in-jit by the
        # shared step's lazy broadcast_to (mirrors fused sweep_fit_best).
        from multimodn_tpu.data.streaming import _batch_put
        dput = _batch_put(template)
    else:
        dput = _batch_put_folds(template)

    def put(stacked):
        data, targets, mask = stacked
        return (tuple(dput(d) for d in data), dput(targets), dput(mask))

    def zero_sums():
        zg = {
            "err_loss": jnp.zeros((F, E + 1, D)),
            "state_change": jnp.zeros((F, E)),
            "n_correct": jnp.zeros((F, E + 1, D)),
            "tp": jnp.zeros((F, E + 1, D)), "tn": jnp.zeros((F, E + 1, D)),
            "fp": jnp.zeros((F, E + 1, D)), "fn": jnp.zeros((F, E + 1, D)),
            "n_counted": jnp.zeros((F, E + 1)),
        }
        return zg

    active = np.ones((F,), bool)
    since = np.zeros((F,), np.int64)
    ran = np.zeros((F,), np.int64)
    scores_hist: List = []
    tsums_hist: List = []
    vsums_hist: List = []

    def epoch_batches(loaders, max_nb):
        """Lockstep per-fold iterators; shorter folds yield None (padded)."""
        its = [ldr.iter_batches() for ldr in loaders]
        for _ in range(max_nb):
            yield [next(it, None) for it in its]

    for eid in range(epochs):
        pre = (params, opt_state, offsets) if patience is not None and \
            not active.all() else None
        erngs = fold_erngs(rngs, jnp.asarray(eid))
        tsums = zero_sums()
        vsums = zero_sums()
        # --- train sweep (double-buffered: put batch k+1 while k runs) ---
        if _shared_loaders:
            batches = ((tuple(np.asarray(x).reshape(B, -1) for x in d), t,
                        m) for d, t, m in folds[0][0].iter_batches())
        else:
            batches = (_stack_fold_batches(bs, widths, B, n_targets)
                       for bs in epoch_batches([f[0] for f in folds],
                                               max_tb))
        nxt = next(batches, None)
        pending = None
        b = 0
        while nxt is not None:
            cur = pending if pending is not None else put(nxt)
            nxt = next(batches, None)
            pending = put(nxt) if nxt is not None else None
            data, targets, mask = cur
            params, opt_state, tsums, offsets = tstep(
                params, opt_state, tsums, offsets, erngs, data, targets,
                mask, jnp.asarray(b, jnp.int32))
            b += 1
        # --- val sweep into device-resident selection buffers ---
        bufs = [jnp.zeros((F, n_val, dec.n_classes))
                for dec in template.decoders]
        tbuf = jnp.zeros((F, n_val, D), jnp.int32)
        mbuf = jnp.zeros((F, n_val), jnp.float32)
        if _shared_loaders:
            vbatches = ((tuple(np.asarray(x).reshape(B, -1) for x in d), t,
                         m) for d, t, m in folds[0][1].iter_batches())
        else:
            vbatches = (_stack_fold_batches(bs, widths, B, n_targets)
                        for bs in epoch_batches([f[1] for f in folds],
                                                max_vb))
        nxt = next(vbatches, None)
        pending = None
        b = 0
        while nxt is not None:
            cur = pending if pending is not None else put(nxt)
            nxt = next(vbatches, None)
            pending = put(nxt) if nxt is not None else None
            data, targets, mask = cur
            vsums, offsets, bufs, tbuf, mbuf = vstep(
                params, vsums, offsets, bufs, tbuf, mbuf, erngs,
                jnp.asarray(b, jnp.int32), data, targets, mask)
            b += 1
        best_new, score, improved = select(best, params, bufs, tbuf, mbuf,
                                           jnp.asarray(eid))
        if pre is not None:
            act = jnp.asarray(active)
            params, opt_state, offsets = freeze(act, (params, opt_state,
                                                      offsets), pre)
            # LOAD-BEARING: a stopped lane still TRAINS a phantom epoch
            # before this revert (pre is applied after tstep/vstep/select),
            # so `select` scored the post-phantom params and `improved`
            # can genuinely fire for it — without freezing `best` too, a
            # stopped lane's best_epoch/best_score would advance past its
            # patience stop (diverging from the fused while_loop's frozen
            # lanes).
            best = freeze(act, best_new, best)
        else:
            best = best_new
        scores_hist.append(score)
        tsums_hist.append(tsums)
        vsums_hist.append(vsums)
        ran += active
        if on_epoch is not None:
            # Same payload contract as the fused kfold's on_epoch (epoch /
            # train_loss / val_loss / score): the fused program divides
            # mean err_loss by its PADDED batch count (targets.shape[0]),
            # which is max_tb/max_vb here.
            sc = np.asarray(score)
            tl = np.asarray(tsums["err_loss"]).mean(axis=(1, 2)) / max_tb
            vl = np.asarray(vsums["err_loss"]).mean(axis=(1, 2)) / max_vb
            for f in range(F):
                if active[f]:
                    on_epoch({"epoch": eid, "train_loss": float(tl[f]),
                              "val_loss": float(vl[f]),
                              "score": float(sc[f])})
        if patience is not None:
            imp = np.asarray(improved)
            since = np.where(active & imp, 0,
                             since + active.astype(np.int64))
            active = active & (since < patience)
            if not active.any():
                break

    best_params, best_score, best_epoch = best
    best_params = jax.tree_util.tree_map(np.asarray, best_params)
    scores = np.stack([np.asarray(s) for s in scores_hist], axis=1)  # (F,e)
    tsums_all = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs], axis=1),
        *tsums_hist)   # {k: (F, epochs, ...)}
    vsums_all = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs], axis=1),
        *vsums_hist)

    results = []
    for f, model in enumerate(models):
        model.load_state_dict(
            jax.tree_util.tree_map(lambda x: x[f], best_params))
        ran_f = int(ran[f])
        tr, va = folds[0] if _shared_loaders else folds[f]
        model._advance_cycle(ran_f * (tr.n_samples + va.n_samples))
        model._epoch_counter += ran_f
        model.opt_state = jax.tree_util.tree_map(lambda x: x[f], opt_state)
        model._opt = optimizer
        results.append({
            "model": model,
            "best_epoch": int(np.asarray(best_epoch)[f]),
            "best_score": float(np.asarray(best_score)[f]),
            "scores": scores[f][:ran_f],
            "epochs_ran": ran_f,
            "train_sums": jax.tree_util.tree_map(
                lambda x: x[f][:ran_f], tsums_all),
            "val_sums": jax.tree_util.tree_map(
                lambda x: x[f][:ran_f], vsums_all),
            "n_train_batches": tr.n_batches,
            "n_val_batches": va.n_batches,
        })
    return results
