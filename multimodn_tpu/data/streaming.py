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

    @property
    def modality_widths(self):
        """Per-modality feature widths (the host-side pairing check
        ``MultiModN._validate_pairings`` consumes)."""
        return [int(np.prod(x.shape[1:])) if x.ndim > 1 else 1
                for x in self._xs]

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


class TorchStreamingLoader:
    """True streaming from a ``torch.utils.data.DataLoader``: batches are
    pulled from the torch loader ON DEMAND each epoch — never materialized
    into host/device epoch stacks — so torch datasets larger than memory
    (map- or iterable-style, lazy __getitem__, worker-loaded) drive every
    streaming entry point (``train_epoch_streaming`` / ``fit_streaming`` /
    ``test_epoch_streaming`` / ``fit_best_streaming``).

    Contrast with ``interop.adapt_loader``, which MATERIALIZES the torch
    dataset into an ArrayLoader (right call when it fits: one upload, fused
    epochs). Batch contract: the torch loader must yield the reference's
    ``([modality_batch, ...], target_batch)`` pairs
    (``multimodn/multimodn.py:132-135``); encoding-sequence-carrying
    3-tuples are rejected like StreamingLoader's. Short tail batches are
    padded to the static batch size with exact sample masks.

    ``shuffle`` reflects the torch sampler: any sampler other than a
    ``SequentialSampler`` (RandomSampler, SubsetRandomSampler, weighted or
    custom samplers — conservatively, anything whose order we cannot prove
    fixed) marks the loader shuffled, and torch samplers reshuffle
    themselves every iteration, so ``reshuffle()`` is a no-op;
    ``fit_best_streaming`` rejects shuffled loaders for fused-parity
    reasons (a deterministic CUSTOM sampler can subclass
    SequentialSampler to pass the check). An iterable-style dataset owns
    its ordering — undetectable here, so it is the caller's contract that
    an iterable dataset fed to ``fit_best_streaming`` yields a fixed
    order.

    Epoch geometry: ``n_samples``/``n_batches`` come from the sampler /
    DataLoader lengths (NOT ``len(dataset)`` alone — a
    ``SubsetRandomSampler`` covers fewer rows); ``batch_sampler``-based
    loaders take exact geometry from a standard ``BatchSampler`` and are
    otherwise rejected (a custom batch_sampler may yield different batch
    shapes each epoch, which the static-shape jitted step cannot serve).
    Unsized iterable-style datasets get ``n_samples = n_batches = None``
    and the epoch paths COUNT batches/samples during iteration;
    ``fit_best_streaming`` (which must preallocate val buffers) requires
    sized geometry.
    """

    def __init__(self, torch_loader):
        from multimodn_tpu.interop import is_torch_dataloader
        if not is_torch_dataloader(torch_loader):
            raise TypeError(
                f"TorchStreamingLoader wraps a torch DataLoader, got "
                f"{type(torch_loader).__name__}")
        if getattr(torch_loader, "drop_last", False):
            raise NotImplementedError(
                "DataLoader(drop_last=True) has no equivalent here (the "
                "padded-tail mask keeps the final short batch exact); use "
                "drop_last=False")
        import torch.utils.data as tud
        self._loader = torch_loader
        dataset = torch_loader.dataset
        self._iterable = isinstance(dataset, tud.IterableDataset)

        def _len(obj):
            if obj is None:
                return None
            try:
                return len(obj)
            except TypeError:
                return None

        batch_sampler = getattr(torch_loader, "batch_sampler", None)
        if torch_loader.batch_size is not None:
            # Automatic batching: geometry from the sampler / DataLoader
            # lengths (len(dataset) over-counts under a subset sampler;
            # an unsized IterableDataset leaves both None -> counted).
            self.batch_size = torch_loader.batch_size
            if self._iterable:
                self.n_samples = _len(dataset)
            else:
                self.n_samples = _len(getattr(torch_loader, "sampler",
                                              None))
                if self.n_samples is None:
                    self.n_samples = _len(dataset)
            self.n_batches = _len(torch_loader)
            if self.n_batches is None and self.n_samples is not None:
                self.n_batches = max(
                    1, math.ceil(self.n_samples / self.batch_size))
        elif isinstance(batch_sampler, tud.BatchSampler):
            # DataLoader(batch_sampler=...) has batch_size=None; a standard
            # BatchSampler's geometry is exact without iterating it (which
            # would consume a random sampler's rng draw).
            if getattr(batch_sampler, "drop_last", False):
                raise NotImplementedError(
                    "BatchSampler(drop_last=True) has no equivalent here; "
                    "use drop_last=False")
            self.batch_size = batch_sampler.batch_size
            self.n_batches = _len(batch_sampler)
            self.n_samples = _len(getattr(batch_sampler, "sampler", None))
            if self.n_samples is None and self.n_batches is not None:
                self.n_samples = self.n_batches * self.batch_size
        else:
            # batch_size=None with no (standard) batch_sampler is either
            # torch's UNBATCHED mode (per-sample items) or a custom
            # batch_sampler whose batch shapes we cannot bound — both break
            # the static-shape padded-batch contract. Reject loudly rather
            # than mis-deriving geometry (review finding: the old fallback
            # silently corrupted metrics and fit_best selection).
            raise NotImplementedError(
                "TorchStreamingLoader needs a DataLoader with automatic "
                "batching (batch_size=N) or a standard "
                "torch.utils.data.BatchSampler; unbatched loaders "
                "(batch_size=None) and custom batch_samplers have no "
                "static batch geometry for the jitted per-batch step.")

        if self._iterable:
            self.shuffle = False    # ordering is the dataset's own
        else:
            sampler = batch_sampler.sampler \
                if torch_loader.batch_size is None else \
                getattr(torch_loader, "sampler", None)
            self.shuffle = not isinstance(sampler, tud.SequentialSampler)
        self._widths = None
        if not self._iterable:
            try:    # peek ONE item for the width check (map-style)
                item = dataset[0]
                xs = item[0]
                if len(item) > 2 and item[2] is not None:
                    raise NotImplementedError(
                        "TorchStreamingLoader does not carry encoding "
                        "sequences; use ArrayLoader (via "
                        "interop.adapt_loader) for sequence-carrying "
                        "datasets.")
                self._widths = [int(np.prod(np.asarray(x).shape))
                                for x in xs]
            except (TypeError, IndexError, KeyError):
                pass    # non-indexable dataset: widths checked at runtime

    @property
    def modality_widths(self):
        return self._widths

    def __len__(self) -> int:
        if self.n_batches is None:
            raise TypeError(
                "this TorchStreamingLoader wraps an unsized iterable "
                "dataset; its batch count is only known after iterating "
                "an epoch")
        return self.n_batches

    def reshuffle(self):
        pass    # torch's sampler reshuffles on every iteration already

    @staticmethod
    def _np(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach")             else np.asarray(t)

    def iter_batches(self):
        B = self.batch_size
        for batch in self._loader:
            if len(batch) > 2 and batch[2] is not None:
                raise NotImplementedError(
                    "TorchStreamingLoader does not carry encoding "
                    "sequences; use ArrayLoader for sequence-carrying "
                    "datasets.")
            xs, y = batch[0], batch[1]
            y = self._np(y)
            if y.ndim == 1:
                y = y[:, None]
            n = y.shape[0]
            if n > B:
                raise ValueError(
                    f"the torch loader yielded a batch of {n} rows, "
                    f"larger than the declared batch_size {B}; the "
                    f"static-shape jitted step cannot serve it")
            mask = np.zeros((B,), np.float32)
            mask[:n] = 1.0
            data = []
            for x in xs:
                x = self._np(x).astype(np.float32)
                buf = np.zeros((B,) + x.shape[1:], np.float32)
                buf[:n] = x
                data.append(buf)
            targets = np.zeros((B, y.shape[1]), np.int32)
            targets[:n] = y
            yield data, targets, mask


def _zero_grid_sums(E: int, D: int):
    """Zeroed device-resident accumulators for one epoch's metric grids —
    the streaming twins of the fused programs' per-epoch sums (one entry
    per ``core.step._GRID_KEYS``; keep in lockstep with that list)."""
    return {
        "err_loss": jnp.zeros((E + 1, D)),
        "state_change": jnp.zeros((E,)),
        "n_correct": jnp.zeros((E + 1, D)),
        "tp": jnp.zeros((E + 1, D)), "tn": jnp.zeros((E + 1, D)),
        "fp": jnp.zeros((E + 1, D)), "fn": jnp.zeros((E + 1, D)),
        "n_counted": jnp.zeros((E + 1,)),
    }


def _check_streaming_model(model, *loaders):
    """Engine envelope for the streaming paths. The AUTO engine streams on
    a mesh: each incoming batch is device_put with its batch axis sharded
    over the mesh's ``data`` axis and GSPMD partitions the per-batch step
    exactly like the fused epoch programs (grid sums / any-NaN decisions
    are in-program global reductions, so nan_skip='batch' keeps the
    reference's whole-batch semantics across shards —
    multimodn.py:167-169). The explicit shard_map engine streams too:
    the per-batch TRAIN step is ``_sm_batch_update`` inside a
    ``jax.shard_map`` region (hand-placed grad/metric psums, psum'd
    any-NaN flags for nan_skip='batch', global StaticInitState offsets —
    the exact body the fused epoch programs scan over); the EVAL sweeps
    stay on the annotation-derived path, the same split ``MultiModN.test``
    uses for shard_map models (eval has no gradient collective to place,
    and GSPMD's global reductions preserve the whole-batch NaN
    decision)."""
    if model.mesh is not None:
        n_dev = model.mesh.shape.get("data", 1)
        for ldr in loaders:
            if ldr is not None and ldr.batch_size % n_dev != 0:
                raise ValueError(
                    f"meshed streaming needs the batch size "
                    f"({ldr.batch_size}) to divide the data mesh axis "
                    f"({n_dev}) so every padded batch shards evenly; pick "
                    f"a divisible batch_size.")


def _sm_stream_step(model, criterion, order, tx):
    """Per-batch explicit-DP train step for the streaming paths: the
    shard_map twin of the jitted ``step``/``tstep`` bodies below, built on
    ``parallel.shard_map_step._sm_batch_update`` — the SAME batch body the
    fused shard_map programs scan over, so the streamed update is
    collective-for-collective identical to one fused-epoch step (grad psum
    with global valid-sample weighting, psum'd metric grids, psum'd
    any-NaN flags under nan_skip='batch', global StaticInitState
    round-robin via the per-shard axis_index offset). The carried
    ``offset`` advances by the batch's GLOBAL valid count, equal to the
    auto step's ``sum(mask)``.

    Same engine caveat as ``make_shard_map_epoch_fn``: per-sample rng
    draws (encoder dropout, presence_dropout) see shard-local views —
    deterministic, but not bit-equal to single-device; dropout-free
    models match the auto engine exactly (tests/test_streaming.py).

    Signature (pytree-prefix in_specs — ``P('data')`` broadcasts over the
    modality tuple):
        (params, opt_state, sums, offset, data, targets, mask, rng)
        -> (params, opt_state, sums, offset)
    """
    from jax.sharding import PartitionSpec as P

    from multimodn_tpu.core.step import _GRID_KEYS
    from multimodn_tpu.parallel.shard_map_step import (_sm_advance_offset,
                                                       _sm_batch_update)

    loss_fn = model._loss_fn(criterion, order, model.nan_skip,
                             nan_axis=model._sm_nan_axis())
    batch_update = _sm_batch_update(loss_fn, tx, "data")

    def device_step(params, opt_state, sums, offset, data, targets, mask,
                    rng):
        params, opt_state, bsums, _, _, gvalid, _ = batch_update(
            params, opt_state, data, targets, mask, rng, offset)
        sums = {k: sums[k] + bsums[k] for k in _GRID_KEYS}
        return (params, opt_state, sums,
                _sm_advance_offset(offset, gvalid))

    in_specs = (P(), P(), P(), P(), P("data"), P("data"), P("data"), P())
    out_specs = (P(), P(), P(), P())
    return jax.jit(jax.shard_map(device_step, mesh=model.mesh,
                                 in_specs=in_specs, out_specs=out_specs,
                                 check_vma=False))


def _batch_put(model):
    """Return the host->device placer for per-batch arrays: plain
    ``device_put`` single-device, batch-axis ``NamedSharding`` over the
    mesh's ``data`` axis when the model is meshed (the per-batch twin of
    ``parallel.sharding.batch_sharding``, which shards (nb, B, ...) epoch
    stacks on axis 1 — here each array is one batch, so axis 0)."""
    if model.mesh is None:
        return jax.device_put
    from jax.sharding import NamedSharding, PartitionSpec
    sharding = NamedSharding(model.mesh, PartitionSpec("data"))
    return lambda x: jax.device_put(x, sharding)


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

    _check_streaming_model(model, loader)
    criterion = resolve_criterion(criterion)
    if model._opt is not optimizer or model.opt_state is None:
        model._opt = optimizer
        model.opt_state = optimizer.init(model.params)
    loader.reshuffle()
    order = model._resolve_order(None, None, train=True)
    model._validate_pairings(order, loader)

    from multimodn_tpu.model import _cache_key
    key = ("stream_step", _cache_key(criterion), order, model.nan_skip,
           _cache_key(optimizer.tx), model._chain_plan(),
           str(model.compute_dtype), model.dp_engine)
    if key not in model._fn_cache:
        tx = optimizer.tx
        if model.dp_engine == "shard_map":
            model._fn_cache[key] = _sm_stream_step(model, criterion, order,
                                                   tx)
        else:
            # Built here (not above) so the shard_map branch can never pick
            # it up by accident: this loss_fn has no nan_axis, which would
            # silently demote nan_skip='batch' to a shard-local decision
            # (_sm_stream_step builds its own with nan_axis threaded).
            loss_fn = model._loss_fn(criterion, order, model.nan_skip)

            @jax.jit
            def step(params, opt_state, sums, offset, data, targets, mask,
                     rng):
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(
                    params, tuple(data), targets, mask, rng, offset, True)
                params, opt_state = gated_update(tx, grads, opt_state,
                                                 params, mask,
                                                 enc_gates=aux["enc_gates"])
                sums = {k: sums[k] + aux[k] for k in _GRID_KEYS}
                return (params, opt_state, sums,
                        offset + jnp.sum(mask).astype(jnp.int32))

            model._fn_cache[key] = step
    step = model._fn_cache[key]

    E, D = len(model.encoders), len(model.decoders)
    sums = _zero_grid_sums(E, D)
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
    # Batch/sample counts come from the ITERATED batches (the host-side
    # numpy masks), not declared loader geometry — ground truth for
    # unsized iterable-style torch loaders and bit-equal to the declared
    # geometry for sized ones.
    it = loader.iter_batches()
    pending: Optional[tuple] = None
    n_samples = 0
    dput = _batch_put(model)

    def put(batch):
        nonlocal n_samples
        data, targets, mask = batch
        n_samples += int(mask.sum())
        return (tuple(dput(d) for d in data), dput(targets), dput(mask))

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

    model._advance_cycle(n_samples)
    stats = jax.tree_util.tree_map(
        np.asarray, epoch_reduction(sums, max(1, b),
                                    model.ones_initialized_counts))
    if history is not None:
        history.append_epoch("train", stats,
                             state_change=stats["state_change_loss"])
    return stats


def fit_streaming(model, train_loader: StreamingLoader, optimizer,
                  criterion=None, *, epochs: int, history=None,
                  val_loader: StreamingLoader = None, val_tag: str = "val"):
    """Streamed twin of ``MultiModN.fit``: N epochs of streamed training,
    optionally each followed by a streamed validation sweep, with the same
    history contract. Composes ``train_epoch_streaming`` +
    ``test_epoch_streaming`` so every equality guarantee of those paths
    (vs the fused programs) applies per epoch.

    Note the eval rng parity caveat: like ``model.test``, the streamed
    eval uses the fixed eval key, which for dropout-free models makes the
    val grids equal ``fit(val_loader=...)``'s exactly
    (tests/test_streaming.py).

    Returns ``history``.
    """
    for _ in range(epochs):
        train_epoch_streaming(model, train_loader, optimizer, criterion,
                              history)
        if val_loader is not None:
            test_epoch_streaming(model, val_loader, criterion,
                                 history=history, tag=val_tag)
    return history


def test_epoch_streaming(model, loader: StreamingLoader, criterion=None,
                         history=None, tag: str = "test"):
    """Streamed evaluation (VERDICT r3 next-#5): ``MultiModN.test`` over a
    StreamingLoader — per-batch jitted eval steps with device-resident grid
    accumulation; only the final-row outputs per batch come host-side (the
    same arrays the fused path transfers once). Equal to ``model.test`` on
    an ArrayLoader of the same data (tests/test_streaming.py).
    """
    from multimodn_tpu.core.losses import resolve_criterion
    from multimodn_tpu.core.metrics import get_performance_metrics
    from multimodn_tpu.core.step import _GRID_KEYS, epoch_reduction

    _check_streaming_model(model, loader)
    criterion = resolve_criterion(criterion)
    order = model._resolve_order(None, None, train=False)
    model._validate_pairings(order, loader)
    loss_fn = model._loss_fn(criterion, order, model.nan_skip)

    from multimodn_tpu.model import _cache_key
    key = ("stream_eval", _cache_key(criterion), order, model.nan_skip,
           model._chain_plan(), str(model.compute_dtype), model.dp_engine)
    if key not in model._fn_cache:
        @jax.jit
        def estep(params, sums, offset, data, targets, mask, rng):
            _, aux = loss_fn(params, tuple(data), targets, mask, rng,
                             offset, False)
            sums = {k: sums[k] + aux[k] for k in _GRID_KEYS}
            return (sums, offset + jnp.sum(mask).astype(jnp.int32),
                    aux["final_outputs"])

        model._fn_cache[key] = estep
    estep = model._fn_cache[key]

    E, D = len(model.encoders), len(model.decoders)
    sums = _zero_grid_sums(E, D)
    offset = model._cycle_base()
    if offset is None:
        offset = jnp.zeros((), jnp.int32)
    rng = jax.random.PRNGKey(0)     # test() parity: fixed eval key

    out_parts, tgt_parts, mask_parts = [], [], []
    b = 0
    dput = _batch_put(model)
    for data, targets, mask in loader.iter_batches():
        batch_rng = jax.random.fold_in(rng, b)
        sums, offset, fouts = estep(
            model.params, sums, offset,
            tuple(dput(d) for d in data),
            dput(targets), dput(mask), batch_rng)
        out_parts.append([np.asarray(o) for o in fouts])
        tgt_parts.append(targets)
        mask_parts.append(mask)
        b += 1
    # Counted geometry (see train_epoch_streaming): exact for unsized
    # iterable loaders, equal to the declared values for sized ones.
    model._advance_cycle(int(sum(m.sum() for m in mask_parts)))

    stats = jax.tree_util.tree_map(
        np.asarray, epoch_reduction(sums, max(1, b),
                                    model.ones_initialized_counts))
    if history is not None:
        history.append_epoch(tag, stats)

    flat_mask = np.concatenate(mask_parts) > 0
    flat_targets = np.concatenate(tgt_parts)[flat_mask]
    results = []
    for d in range(D):
        out = np.concatenate([p[d] for p in out_parts])[flat_mask]
        out = out / out.sum(axis=1, keepdims=True)
        pred = out.argmax(axis=1)
        results.append(get_performance_metrics(
            flat_targets[:, d], pred, out[:, 1]))
    return results


def fit_best_streaming(model, train_loader: StreamingLoader, optimizer,
                       criterion=None, *, epochs: int,
                       val_loader: StreamingLoader,
                       restore_best: bool = True, history=None,
                       val_tag: str = "val", on_epoch=None,
                       checkpoint_dir: Optional[str] = None,
                       checkpoint_every: int = 10, on_chunk=None):
    """Streamed fused-selection training (VERDICT r3 next-#5): the
    north-star fit_best protocol — train + val + AUROC/BAC best-checkpoint
    selection — over StreamingLoaders, so the full epoch stacks never need
    to be HBM-resident. Per-batch jitted steps stream host->device
    (double-buffered like train_epoch_streaming); params, optimizer state,
    the best-checkpoint carry, AND the per-epoch val-output buffer stay
    device-resident; only scalars and the final results transfer.

    Bit-equal to ``MultiModN.fit_best`` on ArrayLoaders of the same data
    (same rng stream: erng = fold_in(rng, eid), batch_rng = fold_in(erng,
    batch_idx); same offset threading; same strictly-greater selection —
    tests/test_streaming.py). shuffle=True loaders are rejected: the fused
    path's in-program permutation crosses batch boundaries, which a
    batch-by-batch stream cannot replicate.

    ``history``: like ``fit_best``'s — per-epoch train AND ``val_tag``
    grids appended (one host transfer of the reduced grids per epoch when
    set; with ``history=None`` only scalars ever leave the device).

    ``on_epoch``: optional host callback ``{"epoch", "score"}`` fired
    after each epoch's selection (the host loop makes this trivial — no
    in-program effects, so it works identically everywhere). Fetching the
    score forces a per-epoch device sync; leave None for maximum
    pipelining.

    ``checkpoint_dir``: preemption-safe streamed training. Every
    ``checkpoint_every`` epochs (and at the end) the FULL mid-run state —
    live params/optimizer state, the device-resident best carry, scores,
    the stream's StaticInitState offset, counters and ``history`` — is
    written atomically; re-invoking after an interruption resumes from
    the newest checkpoint. Because this loop is host-side, the per-epoch
    rng stream CONTINUES across the resume (eid and the rng base are
    restored), so kill-and-resume is BIT-EQUAL to the uninterrupted run —
    stronger than the fused ``fit_best_resumable``'s chunk-boundary rng
    caveat (tests/test_resume.py). ``on_chunk(epochs_done, epochs)``
    fires after each checkpoint lands, like ``fit_resumable``'s.

    Returns {"best_epoch", "best_score", "best_params", "scores",
    "epochs_ran"} like ``fit_best``.
    """
    from multimodn_tpu.core.losses import resolve_criterion
    from multimodn_tpu.core.step import (_GRID_KEYS, _update_best,
                                         epoch_reduction, gated_update,
                                         make_selection_score)

    if val_loader is None:
        raise ValueError("fit_best_streaming requires a val_loader")
    if getattr(train_loader, "shuffle", False) or \
            getattr(val_loader, "shuffle", False):
        raise NotImplementedError(
            "fit_best_streaming cannot honor shuffle=True loaders: the "
            "fused path's per-epoch in-program permutation crosses batch "
            "boundaries; stream with shuffle=False (or pre-shuffle the "
            "dataset once) for bit-parity with fit_best.")
    binary = [d.n_classes == 2 for d in model.decoders]
    if not any(binary):
        raise ValueError(
            "fit_best_streaming requires at least one binary decoder "
            "(same AUROC+BAC selection contract as fit_best).")
    _check_streaming_model(model, train_loader, val_loader)
    # An unrolled-chain shuffle_mode model would freeze ONE random order
    # for every epoch here (no in-program redraw) — the same configuration
    # model.fit_best rejects; reuse its guard.
    model._validate_fused_shuffle(False, train_loader)
    criterion = resolve_criterion(criterion)
    if model._opt is not optimizer or model.opt_state is None:
        model._opt = optimizer
        model.opt_state = optimizer.init(model.params)
    order = model._resolve_order(None, None, train=True)
    model._validate_pairings(order, train_loader)
    loss_fn = model._loss_fn(criterion, order, model.nan_skip)
    selection_score = make_selection_score(binary)

    from multimodn_tpu.model import _cache_key
    key = ("stream_select", _cache_key(criterion), order, model.nan_skip,
           _cache_key(optimizer.tx), model._chain_plan(),
           str(model.compute_dtype), model.dp_engine)
    if key not in model._fn_cache:
        tx = optimizer.tx

        if model.dp_engine == "shard_map":
            # Explicit-collective train sweep; the val sweep below stays on
            # the annotation-derived path (the same split MultiModN.test
            # uses for shard_map models — no gradient collective to place).
            tstep = _sm_stream_step(model, criterion, order, tx)
        else:
            @jax.jit
            def tstep(params, opt_state, sums, offset, data, targets, mask,
                      brng):
                (_, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(
                    params, tuple(data), targets, mask, brng, offset, True)
                params, opt_state = gated_update(tx, grads, opt_state,
                                                 params, mask,
                                                 enc_gates=aux["enc_gates"])
                sums = {k: sums[k] + aux[k] for k in _GRID_KEYS}
                return (params, opt_state, sums,
                        offset + jnp.sum(mask).astype(jnp.int32))

        @jax.jit
        def vstep(params, sums, offset, bufs, tbuf, mbuf, b, data, targets,
                  mask, brng):
            _, aux = loss_fn(params, tuple(data), targets, mask, brng,
                             offset, False)
            B = mask.shape[0]
            at = b * B      # traced batch index -> dynamic-slice writes
            upd = lambda buf, o: jax.lax.dynamic_update_slice_in_dim(
                buf, o.astype(buf.dtype), at, axis=0)
            bufs = [upd(buf, o)
                    for buf, o in zip(bufs, aux["final_outputs"])]
            tbuf = upd(tbuf, targets)
            mbuf = upd(mbuf, mask)
            sums = {k: sums[k] + aux[k] for k in _GRID_KEYS}
            return (sums, offset + jnp.sum(mask).astype(jnp.int32), bufs,
                    tbuf, mbuf)

        @jax.jit
        def select(best, params, bufs, tbuf, mbuf, eid):
            score = selection_score(bufs, tbuf, mbuf)
            best, _ = _update_best(best, params, score, eid)
            return best, score

        model._fn_cache[key] = (tstep, vstep, select)
    tstep, vstep, select = model._fn_cache[key]

    if val_loader.n_batches is None:
        raise NotImplementedError(
            "fit_best_streaming preallocates device-resident val-output "
            "buffers, which needs sized val geometry; this val_loader "
            "wraps an unsized iterable dataset (n_batches unknown). Use "
            "a sized val loader (the train loader may stay unsized).")
    # --- optional preemption-safe resume (see docstring) ---
    import os
    import pickle

    start_epoch = 0
    ec_base = model._epoch_counter
    cyc_base = model._cycle_offset
    stream_off = None
    total_samples = 0
    state_path = None
    restored_best = None
    scores = []
    synced_scores: List[float] = []   # host floats, extended per checkpoint
    if checkpoint_dir is not None:
        from multimodn_tpu.checkpoint import (_atomic_pickle,
                                              _merge_history,
                                              _restore_opt_state)
        if checkpoint_every < 1:
            raise ValueError(
                f"checkpoint_every must be >= 1, got {checkpoint_every}")
        os.makedirs(checkpoint_dir, exist_ok=True)
        state_path = os.path.join(checkpoint_dir,
                                  "resume_stream_latest.pkl")
        if os.path.exists(state_path):
            with open(state_path, "rb") as f:
                payload = pickle.load(f)
            # Same elastic-resume semantics as checkpoint._load_resume_
            # payload: load_state_dict re-places params on the model's
            # mesh; the helper mirrors that for the optimizer moments.
            model.load_state_dict(payload["model_state_dict"])
            _restore_opt_state(model, optimizer, payload["opt_state"])
            start_epoch = int(payload["epoch"])
            if start_epoch > epochs:
                raise ValueError(
                    f"this checkpoint has already trained {start_epoch} "
                    f"epochs but the call asks for epochs={epochs}; "
                    f"resuming would corrupt the epoch/cycle counters and "
                    f"re-use consumed rng folds. Pass epochs >= "
                    f"{start_epoch} (or point checkpoint_dir elsewhere).")
            ec_base = int(payload["ec_base"])
            cyc_base = int(payload["cycle_base"])
            model._epoch_counter = ec_base
            model._cycle_offset = cyc_base
            stream_off = int(payload["stream_offset"])
            total_samples = int(payload["total_samples"])
            synced_scores = [float(s) for s in payload["scores"]]
            scores = list(synced_scores)
            b = payload["best"]
            bp = jax.tree_util.tree_map(jnp.asarray, b["params"])
            if getattr(model, "mesh", None) is not None:
                # The best carry must live on the mesh like the live
                # params (a replicated copy would spike one device's
                # memory and restore_best would hand back unsharded
                # params — the elastic-resume gap review finding).
                from multimodn_tpu.parallel.sharding import shard_params
                bp = shard_params(bp, model.mesh)
            restored_best = (bp, jnp.asarray(b["score"], jnp.float32),
                             jnp.asarray(b["epoch"], jnp.int32))
            history = _merge_history(payload.get("history"), history)

    rng = jax.random.fold_in(jax.random.PRNGKey(model._seed), ec_base)
    offset = model._cycle_base() if stream_off is None \
        else jnp.asarray(stream_off, jnp.int32)
    if offset is None:
        offset = jnp.zeros((), jnp.int32)
    params, opt_state = model.params, model.opt_state
    best = restored_best if restored_best is not None else (
        jax.tree_util.tree_map(lambda x: x, params),
        jnp.full((), -jnp.inf), jnp.asarray(-1, jnp.int32))
    n_val = val_loader.n_batches * val_loader.batch_size
    E, D = len(model.encoders), len(model.decoders)

    dput = _batch_put(model)

    def put(batch):
        nonlocal total_samples
        data, targets, mask = batch
        total_samples += int(mask.sum())
        return (tuple(dput(d) for d in data), dput(targets), dput(mask))

    for eid in range(start_epoch, epochs):
        erng = jax.random.fold_in(rng, jnp.asarray(eid))
        tsums = _zero_grid_sums(E, D)
        vsums = _zero_grid_sums(E, D)
        # --- train sweep (double-buffered) ---
        it = train_loader.iter_batches()
        nxt = next(it, None)
        pending = None
        b = 0
        while nxt is not None:
            cur = pending if pending is not None else put(nxt)
            nxt = next(it, None)
            pending = put(nxt) if nxt is not None else None
            data, targets, mask = cur
            brng = jax.random.fold_in(erng, b)
            params, opt_state, tsums, offset = tstep(
                params, opt_state, tsums, offset, data, targets, mask, brng)
            b += 1
        n_train_batches = b
        # --- val sweep into device-resident buffers ---
        bufs = [jnp.zeros((n_val, dec.n_classes)) for dec in model.decoders]
        tbuf = jnp.zeros((n_val, D), jnp.int32)
        mbuf = jnp.zeros((n_val,), jnp.float32)
        it = val_loader.iter_batches()
        nxt = next(it, None)
        pending = None
        b = 0
        while nxt is not None:
            if b >= val_loader.n_batches:
                raise ValueError(
                    f"the val loader yielded more batches than its "
                    f"declared n_batches={val_loader.n_batches}; the "
                    f"selection buffers would overflow (is a custom "
                    f"sampler's length wrong?)")
            cur = pending if pending is not None else put(nxt)
            nxt = next(it, None)
            pending = put(nxt) if nxt is not None else None
            data, targets, mask = cur
            brng = jax.random.fold_in(erng, b)
            vsums, offset, bufs, tbuf, mbuf = vstep(
                params, vsums, offset, bufs, tbuf, mbuf,
                jnp.asarray(b, jnp.int32), data, targets, mask, brng)
            b += 1
        n_val_batches = b
        best, score = select(best, params, bufs, tbuf, mbuf,
                             jnp.asarray(eid))
        scores.append(score)     # device scalar; fetched once at the end
        if on_epoch is not None:
            on_epoch({"epoch": eid, "score": float(score)})
        if history is not None:
            tstats = jax.tree_util.tree_map(np.asarray, epoch_reduction(
                tsums, max(1, n_train_batches),
                model.ones_initialized_counts))
            history.append_epoch("train", tstats,
                                 state_change=tstats["state_change_loss"])
            vstats = jax.tree_util.tree_map(np.asarray, epoch_reduction(
                vsums, max(1, n_val_batches),
                model.ones_initialized_counts))
            history.append_epoch(val_tag, vstats)
        if state_path is not None and \
                ((eid + 1) % checkpoint_every == 0 or eid + 1 == epochs):
            bp, bs, be = best
            # Only scores ACCUMULATED since the last checkpoint get the
            # blocking device->host fetch (O(epochs) total, not O(n^2)).
            synced_scores.extend(float(s)
                                 for s in scores[len(synced_scores):])
            _atomic_pickle(state_path, {
                "epoch": eid + 1, "ec_base": ec_base,
                "cycle_base": cyc_base,
                "model_state_dict": jax.tree_util.tree_map(np.asarray,
                                                           params),
                "opt_state": jax.tree_util.tree_map(np.asarray, opt_state),
                "best": {"params": jax.tree_util.tree_map(np.asarray, bp),
                         "score": float(bs), "epoch": int(be)},
                "scores": list(synced_scores),
                "stream_offset": int(offset),
                "total_samples": total_samples,
                "history": history,
            })
            if on_chunk is not None:
                on_chunk(eid + 1, epochs)

    model.params, model.opt_state = params, opt_state
    model._epoch_counter = ec_base + epochs
    model._advance_cycle(total_samples)
    best_params, best_score, best_epoch = best
    best_params_np = jax.tree_util.tree_map(np.asarray, best_params)
    if restore_best:
        model.params = best_params
    return {
        "best_epoch": int(best_epoch),
        "best_score": float(best_score),
        "best_params": best_params_np,
        "scores": np.asarray([float(s) for s in scores]),
        "epochs_ran": epochs,
    }


def _predict_streaming(model, loader):
    """Shared streamed-inference driver: ``MultiModN._predict_loader``'s
    semantics over a streaming/disk loader — batches read per step, the
    dataset never host/HBM-resident. No NaN skip (predict quirk #9 parity:
    the forward runs nan_skip='none'); StaticInitState cycle offsets
    thread exactly like the loader path's."""
    _check_streaming_model(model, loader)
    if getattr(loader, "shuffle", False):
        raise ValueError(
            "streamed inference rejects shuffle=True loaders: the result "
            "rows could not be mapped back to input rows (no permutation "
            "is returned), and interleaved predict/predict_proba calls "
            "would see different orders. Build the loader with "
            "shuffle=False.")
    order = model._resolve_order(None, None, train=False)
    model._validate_pairings(order, loader)
    fwd = model._forward_fn(order, "none")
    scan = model._chain_plan()[0] == "scan"
    base = model._cycle_base()
    off = 0 if base is None else int(base)
    dput = _batch_put(model)

    def put(item):
        data, _targets, mask = item
        batch = dput(np.stack(data, axis=1)) if scan \
            else tuple(dput(d) for d in data)
        return batch, dput(mask), np.asarray(mask) > 0

    preds_parts, out_parts = [], []
    n_seen = 0
    # Double-buffered like the training streams: put batch k+1 and launch
    # batch k's forward BEFORE fetching k's results, so transfer and
    # compute overlap the (blocking) np.asarray fetches.
    it = loader.iter_batches()
    nxt = next(it, None)
    pending = None
    while nxt is not None:
        batch, mask_dev, keep = pending if pending is not None else put(nxt)
        nxt = next(it, None)
        preds, outputs, _, _ = fwd(model.params, batch, mask_dev,
                                   init_offset=jnp.asarray(off, jnp.int32))
        pending = put(nxt) if nxt is not None else None
        n = int(keep.sum())
        off += n
        n_seen += n
        preds_parts.append(np.asarray(preds)[:, :, keep])
        out_parts.append([np.asarray(o)[:, keep] for o in outputs])
    if not preds_parts:
        raise ValueError("the streaming loader yielded no batches")
    model._advance_cycle(n_seen)
    return (np.concatenate(preds_parts, axis=2),
            [np.concatenate([p[d] for p in out_parts], axis=1)
             for d in range(len(model.decoders))])


def predict_streaming(model, loader) -> np.ndarray:
    """``MultiModN.predict`` over a streaming/disk loader: (E+1, D, N)
    argmax predictions with batches read per step — inference over
    datasets larger than host/device memory. Equal to ``predict`` on an
    ArrayLoader of the same rows (tests/test_streaming.py)."""
    return _predict_streaming(model, loader)[0]


def predict_proba_streaming(model, loader):
    """``MultiModN.predict_proba`` over a streaming/disk loader: per-
    decoder (E+1, N, C_d) raw outputs, batches read per step."""
    return _predict_streaming(model, loader)[1]
