"""Experiment-scale fused programs: vmapped k-fold training.

The MIMIC protocol (reference ``mimic_single_task_pipeline.py``) trains a
fresh model per fold — 5 folds x 100 epochs x (train + val + checkpoint
selection), all independent and identically shaped. On TPU that independence
is free parallelism: ``kfold_fit_best`` stacks every fold's data (padded to a
common batch count; fully-padded batches are skipped exactly via
``gated_update``) and ``jax.vmap``s the fused select-fit program over the
fold axis — the ENTIRE cross-validation experiment becomes one device
dispatch with fold-batched matmuls (better MXU utilization than any single
fold's batch of 16).

Results are bit-identical to running ``MultiModN.fit_best`` per fold.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodn_tpu.core.fusion import default_order
from multimodn_tpu.core.losses import resolve_criterion
from multimodn_tpu.core.step import (epoch_reduction,
                                     make_select_fit_early_stop_fn,
                                     make_select_fit_fn)
from multimodn_tpu.optim import Optimizer


# ---------------------------------------------------------------------------
# Structural program cache: kfold/sweep calls in a protocol loop (e.g. the
# MNAR grid — 12 kfold calls) build identical select-fit programs from
# fresh model/optimizer objects; re-TRACING each costs ~15 s at the bench's
# unroll-32 config. Two models whose encoder/decoder/init-state structure,
# loss configuration, and optimizer hyperparameters are identical produce
# identical traced programs (parameters are ARGUMENTS, not constants), so
# the jitted program is cached under an exact structural signature.
# Caching is conservative: any component outside this package's own
# encoder/decoder/state classes (or an optimizer without a ``signature``)
# disables it for that call.
# ---------------------------------------------------------------------------

_SIG_MODULES = ("multimodn_tpu.encoders", "multimodn_tpu.decoders",
                "multimodn_tpu.core.state")
_FIT_PROGRAM_CACHE: dict = {}
# Per-call experiment progress callback cell: programs bake ONE dispatcher
# (cached on callback PRESENCE, like MultiModN._dispatch_on_epoch), which
# reads the live callback here — fresh lambdas never retrace.
_ON_EPOCH_CELL: list = [None]


def _experiment_on_epoch_dispatch(payload):
    # Payloads from stopped folds still fire under the vmapped while_loop
    # (the body runs for frozen lanes); the program marks them _active=0 —
    # drop them so the "once per fold per executed epoch" contract holds.
    if not bool(payload.get("_active", True)):
        return
    cb = _ON_EPOCH_CELL[0]
    if cb is not None:
        cb({k: (int(v) if k == "epoch" else float(v))
            for k, v in payload.items() if k != "_active"})
# sweep_fit_best's outer jit wrapper, keyed on the (cached) fit program it
# wraps: jitting a fresh closure per call re-traced the whole fused program
# every call (~15 s at the bench config), defeating the structural cache
# (review finding). Entries are added only for cache-eligible fit programs.
_SWEEP_PROGRAM_CACHE: dict = {}


def _sig_value(v):
    if isinstance(v, (str, int, float, bool, type(None))):
        return v
    if isinstance(v, (list, tuple)):
        return ("seq", tuple(_sig_value(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, _sig_value(x))
                                    for k, x in v.items())))
    if callable(v):
        # Keyed by the OBJECT (identity hash): two distinct callables never
        # share a cache entry even with equal names (conservative against
        # closures), and the key tuple's strong reference pins the object so
        # a freed callable's address can never alias a new one into a stale
        # cache hit (the raw-id pitfall).
        return ("fn", v)
    try:
        arr = np.asarray(v)
    except Exception:
        return ("obj", v)
    import hashlib
    return ("arr", arr.shape, str(arr.dtype),
            hashlib.sha1(np.ascontiguousarray(arr).tobytes()).hexdigest())


def _component_sig(obj):
    mod = type(obj).__module__ or ""
    if not any(mod == m or mod.startswith(m + ".") for m in _SIG_MODULES):
        return None
    return (type(obj).__qualname__,
            tuple((k, _sig_value(v)) for k, v in sorted(vars(obj).items())))


def _model_signature(model):
    parts = ([_component_sig(e) for e in model.encoders]
             + [_component_sig(d) for d in model.decoders]
             + [_component_sig(model.init_state)])
    if any(p is None for p in parts):
        return None
    return (model.state_size, model.err_penalty,
            model.state_change_penalty, model.nan_skip, model.chain_mode,
            model._chain_plan(), str(model.compute_dtype),
            model.scan_unroll, model.shuffle_mode,
            getattr(model, "presence_dropout", 0.0),
            getattr(model, "presence_penalty", 0.0), tuple(parts))


def _cached_select_fit(template, criterion, optimizer, order, per_batch,
                       binary, gate_empty: bool, reshuffle: bool,
                       early_stop: bool = False,
                       with_on_epoch: bool = False):
    """Return the fused select-fit program for this configuration, reusing
    a structurally-identical previously-traced one when safe.
    ``early_stop=True`` builds the while_loop program (traced patience);
    ``with_on_epoch`` bakes the experiment progress dispatcher (unordered
    — required under vmap) and joins the cache key."""
    sig = _model_signature(template)
    opt_sig = getattr(optimizer, "signature", None)
    key = None
    if sig is not None and opt_sig is not None and \
            (isinstance(criterion, str) or
             getattr(criterion, "__module__", "").startswith(
                 "multimodn_tpu.")):
        crit_key = criterion if isinstance(criterion, str) \
            else ("fn", criterion)
        key = (sig, crit_key, opt_sig, tuple(order), per_batch,
               tuple(binary), gate_empty, reshuffle, early_stop,
               with_on_epoch)
        try:
            cached = _FIT_PROGRAM_CACHE.get(key)
        except TypeError:  # unhashable component value -> uncacheable
            key, cached = None, None
        if cached is not None:
            return cached
    loss_fn = template._loss_fn(criterion, order, template.nan_skip,
                                per_batch)
    builder = make_select_fit_early_stop_fn if early_stop \
        else make_select_fit_fn
    fit = builder(loss_fn, optimizer.tx, binary,
                  gate_empty_batches=gate_empty,
                  scan_unroll=template.scan_unroll,
                  reshuffle=reshuffle,
                  on_epoch=_experiment_on_epoch_dispatch
                  if with_on_epoch else None,
                  on_epoch_ordered=False)
    # Mark cache-eligible programs so derived wrappers (the sweep jit) can
    # key their own caches on the fit object without growing unboundedly
    # when structural caching is disabled for a call.
    fit._mmtpu_cached = key is not None
    if key is not None:
        _FIT_PROGRAM_CACHE[key] = fit
    return fit


def _shard_map_experiment_fit(template, criterion, optimizer, order,
                              binary, gate_empty: bool, patience,
                              reshuffle: bool, per_batch: bool, mesh,
                              loaders, with_on_epoch: bool = False):
    """Build the explicit-engine fused select-fit for the experiment
    programs (VERDICT r3 next-#3: the shard_map story extended to
    kfold/sweep). The fold/seed axis rides OUTSIDE the shard_map region via
    ``jax.vmap`` (shard_map has a batching rule: the vmapped axis enters
    every per-device block as a leading batch dimension), while each fold's
    batch axis keeps the engine's hand-placed psums/all_gathers over the
    template's data mesh. ``patience`` builds the explicit engine's
    while_loop program (vmap freezes finished folds, like the auto path).
    Validates the same envelope as ``MultiModN.fit_best`` under the
    engine, plus the experiment-only constraints."""
    if mesh is not None:
        raise ValueError(
            "fold/seed-axis sharding (mesh=) and dp_engine='shard_map' "
            "models are mutually exclusive: the template's data mesh "
            "carries the explicit collectives; the fold axis is vmapped "
            "over it. Drop mesh= or build auto-engine models.")
    template._shard_map_reject_per_batch(per_batch)
    template._shard_map_fused_guards(reshuffle, *loaders)
    # Structural program cache, like _cached_select_fit's: a protocol loop
    # calling kfold per grid point would otherwise re-trace/re-compile the
    # whole vmapped shard_map program every call (30-500 s each through
    # the remote-compile tunnel). jax.sharding.Mesh is hashable, so it
    # rides the key; any unhashable component disables caching for the
    # call (same conservatism as the auto path).
    sig = _model_signature(template)
    opt_sig = getattr(optimizer, "signature", None)
    key = None
    if sig is not None and opt_sig is not None and \
            (isinstance(criterion, str) or
             getattr(criterion, "__module__", "").startswith(
                 "multimodn_tpu.")):
        crit_key = criterion if isinstance(criterion, str) \
            else ("fn", criterion)
        key = ("shard_map", sig, crit_key, opt_sig, tuple(order),
               tuple(binary), gate_empty, reshuffle, patience is not None,
               template.mesh, with_on_epoch)
        try:
            cached = _FIT_PROGRAM_CACHE.get(key)
        except TypeError:
            key, cached = None, None
        if cached is not None:
            return cached
    loss_fn = template._loss_fn(criterion, order, template.nan_skip,
                                per_batch, nan_axis=template._sm_nan_axis())
    from multimodn_tpu.parallel.shard_map_step import (
        make_shard_map_select_fit_early_stop_fn,
        make_shard_map_select_fit_fn,
    )
    n_mod = None if template._chain_plan()[0] == "scan" \
        else len(template.encoders)
    builder = make_shard_map_select_fit_early_stop_fn \
        if patience is not None else make_shard_map_select_fit_fn
    fit = builder(
        loss_fn, optimizer.tx, template.mesh, binary, n_mod,
        scan_unroll=template.scan_unroll, gate_empty_batches=gate_empty,
        reshuffle=reshuffle,
        on_epoch=_experiment_on_epoch_dispatch if with_on_epoch else None)
    fit._mmtpu_cached = key is not None
    if key is not None:
        _FIT_PROGRAM_CACHE[key] = fit
    return fit


def _pad_batches(stacks, max_nb: int):
    """Pad (data, targets, mask) epoch stacks to ``max_nb`` batches. ``data``
    is a tuple of per-modality arrays (unrolled chain) or one stacked array
    (scan chain)."""
    data, targets, mask = stacks

    def pad(a):
        nb = a.shape[0]
        if nb == max_nb:
            return np.asarray(a)
        pad_width = [(0, max_nb - nb)] + [(0, 0)] * (a.ndim - 1)
        return np.pad(np.asarray(a), pad_width)

    data = tuple(pad(d) for d in data) if isinstance(data, tuple) else pad(data)
    return data, pad(targets), pad(mask)


def _check_vmap_safe(optimizer):
    """The experiment programs jax.vmap the whole fused fit — optimizers
    whose update runs a Pallas kernel with input/output aliasing
    (``Adam8bit(mode='pallas')``) are not exercised under vmap; require
    the vmap-safe construction instead of failing deep inside tracing."""
    if not getattr(optimizer, "vmap_safe", True):
        raise NotImplementedError(
            f"optimizer {getattr(optimizer, 'signature', optimizer)} is not "
            "supported under the vmapped experiment programs — construct it "
            "in vmap-safe mode (e.g. Adam8bit(lr, mode='xla'), which keeps "
            "the 8-bit state but uses the plain-XLA update math).")


def kfold_fit_best(
    model_factory: Callable[[int], "MultiModN"],
    folds: Sequence[Tuple],            # [(train_loader, val_loader), ...]
    optimizer: Optimizer,
    criterion=None,
    epochs: int = 1,
    seeds: Optional[Sequence[int]] = None,
    mesh=None,
    fold_axis: str = "fold",
    patience: Optional[int] = None,
    on_epoch: Optional[Callable] = None,
) -> List[dict]:
    """Train one model per fold simultaneously.

    ``on_epoch``: optional progress callback streamed from inside the
    vmapped program via UNORDERED jax.debug.callback — called once PER
    FOLD per epoch with {"epoch", "train_loss", "val_loss", "score"}
    (epoch id identifies the epoch; fold attribution is unspecified —
    vmap unrolls the emissions anonymously). Delivery is guaranteed
    before the call returns. Works under BOTH engines: shard_map
    programs emit once per fold per epoch from the mesh-origin shard
    (parallel/shard_map_step._sm_emit_epoch).

    ``patience``: optional on-device early stopping per fold (same Keras
    semantics as ``MultiModN.fit_best``). Under vmap the while_loop runs
    until the SLOWEST fold stops (finished folds' state is frozen), so
    device time scales with max per-fold epochs, not the fixed budget;
    each result dict gains "epochs_ran" and its scores/sums are trimmed
    to the fold's own executed epochs.

    Args:
        model_factory: seed -> MultiModN; every fold's model must be
            structurally identical (same encoders/decoders/config).
        folds: per-fold (train_loader, val_loader) pairs; batch sizes must
            match across folds. shuffle=True train loaders are supported:
            with equal train batch counts the in-program per-epoch
            permutation acts on stacks shaped exactly like per-fold
            fit_best's (bit-equal trajectories); with UNEQUAL counts each
            fold gets a masked permutation of its OWN real sample slots
            (fold-padding stays fixed and exactly gated; per-fold results
            are independent of co-folds, both engines). Encoding sequences
            — uniform (shared or per-fold) and true per-batch — thread
            through as traced order arrays, exactly like fused
            fit/fit_best.
        seeds: per-fold init seeds (default 0..F-1, mirroring the reference's
            per-fold seed increment).
        mesh: optional ``jax.sharding.Mesh`` with a ``fold_axis`` axis. The
            vmapped fold dimension of every stacked input (data, params,
            optimizer state, rng streams) shards over it, so each device
            group trains its own folds with ZERO cross-fold collectives —
            the experiment axis is embarrassingly parallel (docs/SCALING.md).
            Fold count is padded to a multiple of the axis size by
            replicating the last fold (padded results are discarded).
            Models from ``model_factory`` must not carry their own mesh.
        fold_axis: mesh axis name the fold dimension shards over.
    Returns:
        Per-fold dicts: {model (best params restored), best_epoch,
        best_score, scores, epochs_ran, train_sums, val_sums,
        n_train_batches, n_val_batches}. "epochs_ran" is always present
        (= epochs unless patience stopped the fold early); scores/sums
        cover exactly the executed epochs.
    """
    folds = list(folds)
    streaming = [hasattr(ldr, "iter_batches") for pair in folds
                 for ldr in pair]
    if any(streaming):
        if not all(streaming):
            raise ValueError(
                "mixed fold loaders: every fold's train AND val loader "
                "must be streaming (iter_batches) or every one an "
                "ArrayLoader — the two paths build different programs.")
        from multimodn_tpu.experiments_stream import kfold_fit_best_streamed
        if mesh is not None:
            raise ValueError(
                "fold-axis sharding (mesh=) is a fused-path feature; "
                "streamed folds shard the batch axis via the model's own "
                "mesh (see experiments_stream).")
        return kfold_fit_best_streamed(
            model_factory, folds, optimizer, criterion, epochs=epochs,
            seeds=seeds, patience=patience, on_epoch=on_epoch)
    criterion = resolve_criterion(criterion)
    _check_vmap_safe(optimizer)
    if patience is not None and patience < 1:
        raise ValueError(f"patience must be >= 1, got {patience}")
    n_real = len(folds)
    seeds = list(seeds) if seeds is not None else list(range(n_real))
    if mesh is not None:
        if fold_axis not in mesh.axis_names:
            raise ValueError(
                f"mesh has no '{fold_axis}' axis (axes: {mesh.axis_names})")
        n_pad = (-n_real) % mesh.shape[fold_axis]
        folds += [folds[-1]] * n_pad
        seeds += [seeds[-1]] * n_pad
    n_folds = len(folds)
    models = [model_factory(s) for s in seeds]
    template = models[0]
    if mesh is not None and template.mesh is not None:
        raise ValueError(
            "fold-axis sharding and a model-owned mesh are mutually "
            "exclusive: model_factory must build mesh-free models (the fold "
            "axis is the parallel axis here; batch/TP sharding would nest "
            "meshes). Drop mesh= from the factory or from kfold_fit_best.")
    binary = [d.n_classes == 2 for d in template.decoders]
    if not any(binary):
        raise ValueError(
            "kfold_fit_best requires at least one binary (n_classes==2) "
            "decoder: the AUROC+BAC selection score is undefined otherwise "
            "(same contract as MultiModN.fit_best).")
    shuffles = [bool(getattr(f[0], "shuffle", False)) for f in folds]
    reshuffle = any(shuffles)
    if reshuffle and not all(shuffles):
        raise ValueError(
            "all fold train loaders must agree on shuffle=: the in-program "
            "per-epoch permutation is one property of the vmapped program.")
    if reshuffle:
        # Same guards fit_best applies per fold (host-side-order chains,
        # unbatched-compat encoders with padded tails).
        for tr, _ in folds:
            template._validate_fused_shuffle(True, tr)
    if template.shuffle_mode and not template._chain_plan()[1]:
        # Host-side (unrolled-chain) shuffle draws one order per call — that
        # cannot vary per fold inside one vmapped program. Scan/switch chains
        # shuffle IN-PROGRAM per batch (every fold gets the same rng stream,
        # matching per-fold fit_best which derives the identical stream from
        # a fresh model's epoch counter), so only the unrolled fallback is
        # rejected.
        raise NotImplementedError(
            "kfold_fit_best supports shuffle_mode only for chains that "
            "shuffle in-program (homogeneous 'scan' or 'switch' chains); "
            "the unrolled chain's host-side shuffle cannot vary per fold.")

    # Encoding-sequence resolution, mirroring MultiModN._fused_seqs:
    # - no sequences anywhere -> identity order, sequence-free program;
    # - ONE uniform sequence shared by every loader -> static order;
    # - anything else (true per-batch sequences, or folds with DIFFERENT
    #   uniform sequences) -> traced per-batch orders stacked over folds.
    E = len(template.encoders)

    def _pb(ldr):
        fn = getattr(ldr, "batch_sequences", None)
        return fn() if fn is not None else None

    all_loaders = [ldr for pair in folds for ldr in pair]
    any_pb = any(_pb(l) is not None for l in all_loaders)
    uniforms = [getattr(l, "encoding_sequence", None) for l in all_loaders]
    present = [u for u in uniforms if u is not None]
    shared_uniform = (len(present) == len(uniforms) and
                      all(np.array_equal(u, present[0]) for u in present)
                      ) if present else False
    per_batch = any_pb or (bool(present) and not shared_uniform)

    if per_batch:
        order = default_order(E)
        if reshuffle and any(_pb(tr) is not None for tr, _ in folds):
            raise ValueError(
                "shuffle=True fold loaders cannot carry per-batch encoding "
                "sequences: the in-program sample permutation would break "
                "the batch<->sequence association (same rule as fused "
                "fit/fit_best; batch-constant uniform sequences are fine).")
    elif shared_uniform:
        order = tuple((int(k), int(e)) for k, e in enumerate(present[0]))
    else:
        order = default_order(E)

    def fold_seqs(ldr, max_nb):
        """(max_nb, E) traced order rows for one loader: its own per-batch
        rows, or its uniform sequence (identity absent one) tiled; padded
        batches get identity rows (they are gated off exactly)."""
        rows = _pb(ldr)
        if rows is None:
            u = getattr(ldr, "encoding_sequence", None)
            row = np.asarray(u, np.int32) if u is not None \
                else np.arange(E, dtype=np.int32)
            rows = np.tile(row, (ldr.n_batches, 1))
        rows = np.asarray(rows, np.int32)
        template._validate_pairings((), ldr, rows)
        if rows.shape[0] < max_nb:
            pad = np.tile(np.arange(E, dtype=np.int32),
                          (max_nb - rows.shape[0], 1))
            rows = np.concatenate([rows, pad], axis=0)
        return rows

    # Unequal train batch counts + shuffle: the in-program permutation must
    # act on each fold's OWN nb_f*B sample slots (per-fold fit_best's
    # domain), not the fold-padded stack — 'masked' mode permutes exactly
    # that prefix per fold and leaves the padding tail (and its fully-empty
    # gated batches) fixed.
    masked_shuffle = reshuffle and \
        len({f[0].n_batches for f in folds}) > 1
    reshuffle_mode = "masked" if masked_shuffle else reshuffle

    # Folds get padded to a common batch count -> empty batches exist, so the
    # exact-skip gating must be on here.
    if template.dp_engine == "shard_map":
        fit = _shard_map_experiment_fit(
            template, criterion, optimizer, order, binary, True, patience,
            reshuffle_mode, per_batch, mesh, all_loaders,
            with_on_epoch=on_epoch is not None)
    else:
        fit = _cached_select_fit(template, criterion, optimizer, order,
                                 per_batch, binary, gate_empty=True,
                                 reshuffle=reshuffle_mode,
                                 early_stop=patience is not None,
                                 with_on_epoch=on_epoch is not None)

    # In scan-chain mode the loss fn expects ONE stacked modality array
    # (see MultiModN._place). Mesh-free templates (the common case and the
    # fold-mesh path) pad and fold-stack from the loaders' HOST arrays —
    # placing per-fold device arrays first would round-trip the whole
    # dataset device->host->device through _pad_batches/stack (3x the
    # transfer volume). Model-mesh templates keep _place (it attaches the
    # batch sharding the vmapped program relies on).
    def _host_place(loader):
        data, targets, mask = loader.host_stacks()
        if template._chain_plan()[0] == "scan" and isinstance(data, tuple):
            data = np.stack(data, axis=2)
        return data, targets, mask

    place = template._place if template.mesh is not None else _host_place
    train_stacks = [place(f[0]) for f in folds]
    val_stacks = [place(f[1]) for f in folds]
    max_tb = max(s[1].shape[0] for s in train_stacks)
    max_vb = max(s[1].shape[0] for s in val_stacks)
    train_p = [_pad_batches(s, max_tb) for s in train_stacks]
    val_p = [_pad_batches(s, max_vb) for s in val_stacks]

    stack = lambda items: jax.tree_util.tree_map(
        lambda *xs: jnp.stack([np.asarray(x) for x in xs]), *items)
    data = stack([p[0] for p in train_p])
    targets = jnp.stack([p[1] for p in train_p])
    mask = jnp.stack([p[2] for p in train_p])
    vdata = stack([p[0] for p in val_p])
    vtargets = jnp.stack([p[1] for p in val_p])
    vmask = jnp.stack([p[2] for p in val_p])

    params = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[m.params for m in models])
    opt_state = jax.vmap(optimizer.tx.init)(params)
    # Per-fold rng streams derived from each model's SEED, exactly like a
    # fresh model's fit_best would (fold_in(PRNGKey(seed), epoch_counter=0))
    # — dropout/in-program-shuffle draws match the sequential path per fold.
    rngs = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(m._seed), 0)
                      for m in models])
    if per_batch:
        tseqs = jnp.stack([fold_seqs(tr, max_tb) for tr, _ in folds])
        vseqs = jnp.stack([fold_seqs(va, max_vb) for _, va in folds])

    if mesh is not None:
        # Shard the leading (fold) axis of every stacked operand; trailing
        # dims replicate. Folds are independent, so GSPMD partitions the
        # whole program fold-wise with no collectives at all.
        from jax.sharding import NamedSharding, PartitionSpec
        fold_shard = NamedSharding(mesh, PartitionSpec(fold_axis))
        place = lambda t: jax.tree_util.tree_map(
            lambda x: jax.device_put(x, fold_shard), t)
        (data, targets, mask, vdata, vtargets, vmask, params, opt_state,
         rngs) = (place(t) for t in (data, targets, mask, vdata, vtargets,
                                     vmask, params, opt_state, rngs))
        if per_batch:
            tseqs, vseqs = place(tseqs), place(vseqs)

    pat = () if patience is None else (jnp.asarray(patience, jnp.int32),)
    pat_ax = () if patience is None else (None,)
    seq_args = (tseqs, vseqs) if per_batch else ()
    seq_ax = (0, 0) if per_batch else ()
    if masked_shuffle:
        # (F,) per-fold real-slot counts; rides the vmap as the fit's
        # n_real keyword (fit's positional tail ends at val_seqs).
        n_real_arr = jnp.asarray(
            [s[1].shape[0] * s[1].shape[1] for s in train_stacks],
            jnp.int32)
        extra, extra_ax = (n_real_arr,), (0,)
        call = lambda *a: fit(*a[:-1], n_real=a[-1])
    else:
        extra, extra_ax = (), ()
        call = fit
    _ON_EPOCH_CELL[0] = on_epoch
    try:
        vfit = jax.vmap(call, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None)
                        + pat_ax + (0,) + seq_ax + extra_ax)
        outs = vfit(params, opt_state, data, targets, mask,
                    vdata, vtargets, vmask, jnp.arange(epochs), *pat,
                    rngs, *seq_args, *extra)
    finally:
        if on_epoch is not None:
            jax.effects_barrier()   # all payloads delivered before return
            _ON_EPOCH_CELL[0] = None
    if patience is None:
        (params, opt_state, tsums, vsums, best_params, best_score,
         best_epoch, scores) = outs
        epochs_ran = np.full((n_folds,), epochs, np.int32)
    else:
        (params, opt_state, tsums, vsums, best_params, best_score,
         best_epoch, scores, ran) = outs
        epochs_ran = np.asarray(ran, np.int32)

    results = []
    best_params = jax.tree_util.tree_map(np.asarray, best_params)
    tsums = jax.tree_util.tree_map(np.asarray, tsums)
    vsums = jax.tree_util.tree_map(np.asarray, vsums)
    for f, model in enumerate(models[:n_real]):
        fold_best = jax.tree_util.tree_map(lambda x: x[f], best_params)
        model.load_state_dict(fold_best)
        ran = int(epochs_ran[f])
        # Leave each fold model exactly as per-fold fit_best would: the
        # training consumed ran*(n_train+n_val) StaticInitState cycle
        # states in-program and ran rng epochs, and the OPTIMIZER state
        # is the fold's trained moments (load_state_dict resets it) — a
        # later test()/predict()/continued training on the returned model
        # must continue from there.
        model._advance_cycle(
            ran * (folds[f][0].n_samples + folds[f][1].n_samples))
        model._epoch_counter += ran
        model.opt_state = jax.tree_util.tree_map(lambda x: x[f], opt_state)
        model._opt = optimizer
        results.append({
            "model": model,
            "best_epoch": int(np.asarray(best_epoch)[f]),
            "best_score": float(np.asarray(best_score)[f]),
            "scores": np.asarray(scores)[f][:ran],
            "epochs_ran": ran,
            "train_sums": jax.tree_util.tree_map(lambda x: x[f][:ran],
                                                 tsums),
            "val_sums": jax.tree_util.tree_map(lambda x: x[f][:ran], vsums),
            "n_train_batches": train_stacks[f][1].shape[0],
            "n_val_batches": val_stacks[f][1].shape[0],
        })
    return results


def sweep_fit_best(
    model_factory: Callable[[int], "MultiModN"],
    train_loader,
    val_loader,
    optimizer: Optimizer,
    criterion=None,
    epochs: int = 1,
    seeds: Sequence[int] = (0,),
    mesh=None,
    sweep_axis: str = "fold",
    patience: Optional[int] = None,
    on_epoch: Optional[Callable] = None,
) -> List[dict]:
    """Seed-replicate axis: N independent inits of ONE (train, val) workload
    train in a single dispatch (VERDICT r2 next-#4).

    ``kfold_fit_best`` vmaps over per-fold DATA; here the data is broadcast
    (``in_axes=None``) and only params/opt-state/rng streams carry the
    vmapped seed axis — N seeds cost one upload of the dataset and one
    fused program whose matmuls batch over seeds. Results are bit-identical
    to running ``MultiModN.fit_best`` once per seed
    (tests/test_experiments.py).

    Crossing axes: for targets x folds x seeds, call this per fold (seeds
    ride the cheap axis), or expand folds x seeds pairs through
    ``kfold_fit_best(folds=[pair for pair in folds for _ in seeds],
    seeds=seeds * len(folds))`` when fold data is small enough to replicate.

    ``mesh``: optional — shards the seed axis over ``sweep_axis`` exactly
    like kfold's fold axis (data replicated; zero cross-seed collectives).
    ``patience``: optional per-seed on-device early stopping (same
    semantics as ``kfold_fit_best``'s).

    Returns per-seed dicts shaped like ``kfold_fit_best``'s.
    """
    if hasattr(train_loader, "iter_batches") or \
            hasattr(val_loader, "iter_batches"):
        if not (hasattr(train_loader, "iter_batches")
                and hasattr(val_loader, "iter_batches")):
            raise ValueError(
                "mixed loaders: train and val must both be streaming "
                "(iter_batches) or both ArrayLoaders.")
        from multimodn_tpu.experiments_stream import kfold_fit_best_streamed
        if mesh is not None:
            raise ValueError(
                "seed-axis sharding (mesh=) is a fused-path feature; "
                "streamed sweeps shard the batch axis via the model's own "
                "mesh (see experiments_stream).")
        return kfold_fit_best_streamed(
            model_factory, [(train_loader, val_loader)], optimizer,
            criterion, epochs=epochs, seeds=list(seeds), patience=patience,
            on_epoch=on_epoch, _shared_loaders=True)
    criterion = resolve_criterion(criterion)
    _check_vmap_safe(optimizer)
    if patience is not None and patience < 1:
        raise ValueError(f"patience must be >= 1, got {patience}")
    seeds = list(seeds)
    n_real = len(seeds)
    if mesh is not None:
        if sweep_axis not in mesh.axis_names:
            raise ValueError(
                f"mesh has no '{sweep_axis}' axis (axes: {mesh.axis_names})")
        seeds += [seeds[-1]] * ((-n_real) % mesh.shape[sweep_axis])
    models = [model_factory(s) for s in seeds]
    template = models[0]
    if mesh is not None and template.mesh is not None:
        raise ValueError(
            "seed-axis sharding and a model-owned mesh are mutually "
            "exclusive (same rule as kfold_fit_best): model_factory must "
            "build mesh-free models.")
    binary = [d.n_classes == 2 for d in template.decoders]
    if not any(binary):
        raise ValueError(
            "sweep_fit_best requires at least one binary (n_classes==2) "
            "decoder: the AUROC+BAC selection score is undefined otherwise "
            "(same contract as MultiModN.fit_best).")
    reshuffle = bool(getattr(train_loader, "shuffle", False))
    if reshuffle:
        template._validate_fused_shuffle(True, train_loader)
    if template.shuffle_mode and not template._chain_plan()[1]:
        raise NotImplementedError(
            "sweep_fit_best supports shuffle_mode only for chains that "
            "shuffle in-program (same rule as kfold_fit_best).")

    # Sequence resolution over the SHARED loader pair — same rules as
    # MultiModN._fused_seqs, shared verbatim since there is one loader pair.
    seqs, val_seqs, per_batch = template._fused_seqs(
        train_loader, val_loader, reshuffle)
    order = template._resolve_order(train_loader, train=True)
    template._validate_pairings(order, train_loader,
                                template._batch_seqs(train_loader))

    if template.dp_engine == "shard_map":
        fit = _shard_map_experiment_fit(
            template, criterion, optimizer, order, binary, False, patience,
            reshuffle, per_batch, mesh, (train_loader, val_loader),
            with_on_epoch=on_epoch is not None)
    else:
        fit = _cached_select_fit(template, criterion, optimizer, order,
                                 per_batch, binary, gate_empty=False,
                                 reshuffle=reshuffle,
                                 early_stop=patience is not None,
                                 with_on_epoch=on_epoch is not None)

    def _host_place(loader):
        d, t, m = loader.host_stacks()
        if template._chain_plan()[0] == "scan" and isinstance(d, tuple):
            d = np.stack(d, axis=2)
        return (tuple(jnp.asarray(x) for x in d) if isinstance(d, tuple)
                else jnp.asarray(d)), jnp.asarray(t), jnp.asarray(m)

    place = template._place if template.mesh is not None else _host_place
    data, targets, mask = place(train_loader)
    vdata, vtargets, vmask = place(val_loader)

    params = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[m.params for m in models])
    opt_state = jax.vmap(optimizer.tx.init)(params)
    rngs = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(m._seed), 0)
                      for m in models])

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        seed_shard = NamedSharding(mesh, PartitionSpec(sweep_axis))
        repl = NamedSharding(mesh, PartitionSpec())
        put = lambda t, s: jax.tree_util.tree_map(
            lambda x: jax.device_put(x, s), t)
        params, opt_state, rngs = (put(params, seed_shard),
                                   put(opt_state, seed_shard),
                                   put(rngs, seed_shard))
        data, targets, mask = (put(data, repl), put(targets, repl),
                               put(mask, repl))
        vdata, vtargets, vmask = (put(vdata, repl), put(vtargets, repl),
                                  put(vmask, repl))

    # The shared data gets a leading seed axis via jnp.broadcast_to INSIDE
    # the jitted program: lazy under XLA (no HBM duplication — the broadcast
    # fuses into consumers), and the vmapped program then has exactly
    # kfold_fit_best's batched shapes, which measure bit-identical to
    # per-seed fit_best. Passing the data with in_axes=None instead changes
    # the dot_general batching and rounds differently (one threshold flip
    # observed in AUROC scores at fp32).
    early_stop = patience is not None
    sweep_key = (fit, per_batch, early_stop, on_epoch is not None)
    sweep_jit = _SWEEP_PROGRAM_CACHE.get(sweep_key)
    if sweep_jit is None:
        def sweep_prog(params, opt_state, *rest):
            # patience travels as the LEADING extra (right after opt_state)
            # so the data-args unpacking below stays position-stable.
            if early_stop:
                pat, pat_ax, rest = (rest[0],), (None,), rest[1:]
            else:
                pat, pat_ax = (), ()
            if per_batch:
                (data, targets, mask, vdata, vtargets, vmask, epoch_ids,
                 rngs, seqs, val_seqs) = rest
            else:
                (data, targets, mask, vdata, vtargets, vmask, epoch_ids,
                 rngs) = rest
            S = rngs.shape[0]
            bc = lambda tree: jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (S,) + x.shape), tree)
            if per_batch:
                return jax.vmap(fit, in_axes=(0,) * 8 + (None,) + pat_ax
                                + (0, 0, 0))(
                    params, opt_state, bc(data), bc(targets), bc(mask),
                    bc(vdata), bc(vtargets), bc(vmask), epoch_ids, *pat,
                    rngs, bc(seqs), bc(val_seqs))
            return jax.vmap(fit, in_axes=(0,) * 8 + (None,) + pat_ax + (0,))(
                params, opt_state, bc(data), bc(targets), bc(mask), bc(vdata),
                bc(vtargets), bc(vmask), epoch_ids, *pat, rngs)

        sweep_jit = jax.jit(sweep_prog)
        if getattr(fit, "_mmtpu_cached", False):
            _SWEEP_PROGRAM_CACHE[sweep_key] = sweep_jit

    args = (params, opt_state)
    if early_stop:
        args += (jnp.asarray(patience, jnp.int32),)
    args += (data, targets, mask, vdata, vtargets, vmask,
             jnp.arange(epochs), rngs)
    if per_batch:
        args += (seqs, val_seqs)
    _ON_EPOCH_CELL[0] = on_epoch
    try:
        outs = sweep_jit(*args)
    finally:
        if on_epoch is not None:
            jax.effects_barrier()   # all payloads delivered before return
            _ON_EPOCH_CELL[0] = None
    if early_stop:
        (params, opt_state, tsums, vsums, best_params, best_score,
         best_epoch, scores, ran) = outs
        epochs_ran = np.asarray(ran, np.int32)
    else:
        (params, opt_state, tsums, vsums, best_params, best_score,
         best_epoch, scores) = outs
        epochs_ran = np.full((len(seeds),), epochs, np.int32)

    results = []
    best_params = jax.tree_util.tree_map(np.asarray, best_params)
    tsums = jax.tree_util.tree_map(np.asarray, tsums)
    vsums = jax.tree_util.tree_map(np.asarray, vsums)
    for i, model in enumerate(models[:n_real]):
        model.load_state_dict(
            jax.tree_util.tree_map(lambda x: x[i], best_params))
        ran = int(epochs_ran[i])
        model._advance_cycle(
            ran * (train_loader.n_samples + val_loader.n_samples))
        model._epoch_counter += ran
        model.opt_state = jax.tree_util.tree_map(lambda x: x[i], opt_state)
        model._opt = optimizer
        results.append({
            "model": model,
            "best_epoch": int(np.asarray(best_epoch)[i]),
            "best_score": float(np.asarray(best_score)[i]),
            "scores": np.asarray(scores)[i][:ran],
            "epochs_ran": ran,
            "train_sums": jax.tree_util.tree_map(lambda x: x[i][:ran],
                                                 tsums),
            "val_sums": jax.tree_util.tree_map(lambda x: x[i][:ran], vsums),
            "n_train_batches": train_loader.n_batches,
            "n_val_batches": val_loader.n_batches,
        })
    return results


def fold_history(result: dict, targets: List[str],
                 ones_initialized_counts: bool = True):
    """Rebuild a MultiModNHistory from a kfold_fit_best result."""
    from multimodn_tpu.core.history import MultiModNHistory

    history = MultiModNHistory(targets)
    epochs = result["scores"].shape[0]
    for e in range(epochs):
        t_e = {k: v[e] for k, v in result["train_sums"].items()}
        stats = jax.tree_util.tree_map(
            np.asarray, epoch_reduction(t_e, result["n_train_batches"],
                                        ones_initialized_counts))
        history.append_epoch("train", stats,
                             state_change=stats["state_change_loss"])
        v_e = {k: v[e] for k, v in result["val_sums"].items()}
        vstats = jax.tree_util.tree_map(
            np.asarray, epoch_reduction(v_e, result["n_val_batches"],
                                        ones_initialized_counts))
        history.append_epoch("val", vstats)
    return history
