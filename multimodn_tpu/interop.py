"""Torch interop shims: run unmodified reference pipeline bodies.

Reference user code builds ``torch.optim.Adam(list(model.parameters()),
lr)``, passes ``torch.nn.CrossEntropyLoss()`` as the criterion, and wraps
datasets in ``torch.utils.data.DataLoader``
(``pipelines/titanic/titanic_mlp_pipeline.py:63-76``). This module maps each
of those torch objects onto the JAX-native equivalent at the model-method
boundary, so a byte-identical copy of a reference pipeline body executes
against the compat tree (tests/test_dropin.py):

- ``adapt_optimizer``: torch Adam/AdamW/SGD instance -> ``optim.Adam`` /
  ``AdamW`` / ``SGD`` with the instance's hyperparameters. The torch object
  is only a hyperparameter carrier — parameter updates run in the fused
  on-device programs, never through torch. Memoized per torch instance so
  a 300-epoch ``train_epoch`` loop reuses ONE optimizer (and its state).
- ``adapt_criterion``: torch loss module -> the matching mask-aware JAX
  loss (CrossEntropyLoss -> cross_entropy; BCELoss -> bce; MSELoss -> mse),
  rejecting non-default knobs (reduction/weight/...) loudly instead of
  silently ignoring them.
- ``adapt_loader``: ``torch.utils.data.DataLoader`` -> ``ArrayLoader`` over
  the same dataset with the same batch geometry (shuffle honored via the
  sampler type). Memoized per DataLoader instance so epoch stacks upload
  once per loader, not once per epoch.
- ``torch_parameters``: torch-tensor mirrors of the model's JAX parameters,
  so ``torch.optim.Adam(list(model.parameters()), lr)`` constructs. The
  mirrors are snapshots for constructor compatibility; training updates the
  JAX pytree (document: introspect live weights via ``state_dict()``).

Nothing here imports torch unless a torch object is actually seen: every
check first consults ``sys.modules`` so torch-free programs never pay the
import.
"""
from __future__ import annotations

import sys
from typing import Any


import weakref

# id(torch_obj) -> (weakref(torch_obj), adapted). The weakref's finalizer
# evicts the entry when the torch object dies, so (a) the caches never grow
# past the set of LIVE torch objects, and (b) a recycled id can never alias
# a dead key (the stored weakref is checked for identity on every hit).
_OPT_CACHE: dict = {}
_LOADER_CACHE: dict = {}


def _cache_lookup(cache: dict, obj):
    entry = cache.get(id(obj))
    if entry is not None and entry[0]() is obj:
        return entry[1]
    return None


def _cache_store(cache: dict, obj, value):
    key = id(obj)
    cache[key] = (weakref.ref(obj, lambda _r, k=key, c=cache:
                              c.pop(k, None)), value)
    return value


def _torch_mod(obj: Any, prefix: str) -> bool:
    """True iff torch is already imported and obj's class (or a base) lives
    under the given torch module prefix."""
    if "torch" not in sys.modules:
        return False
    return any(getattr(c, "__module__", "").startswith(prefix)
               for c in type(obj).__mro__)


def is_torch_optimizer(obj: Any) -> bool:
    return _torch_mod(obj, "torch.optim")


def is_torch_loss(obj: Any) -> bool:
    return _torch_mod(obj, "torch.nn.modules.loss")


def is_torch_dataloader(obj: Any) -> bool:
    # Match the DataLoader class specifically: the broader "torch.utils.data"
    # prefix also matches Dataset/TensorDataset/Subset/Sampler, misrouting
    # them into the loader-adaptation path (review finding — they then die
    # on `.batch_size` with an opaque AttributeError instead of the clear
    # loader duck-typing error).
    return _torch_mod(obj, "torch.utils.data.dataloader")


def _reject(name: str, **nondefault):
    bad = {k: v for k, v in nondefault.items() if v[0] != v[1]}
    if bad:
        detail = ", ".join(f"{k}={v[0]!r} (supported: {v[1]!r})"
                           for k, v in bad.items())
        raise NotImplementedError(
            f"torch {name} with non-default options cannot be mapped onto "
            f"the JAX-native optimizer/criterion: {detail}")


def _torch_opt_hparams(opt) -> dict:
    """Effective hyperparameters of a torch optimizer, read from
    ``param_groups`` — torch lr schedulers and manual edits mutate the
    groups, never ``.defaults`` (reading defaults froze the lr for the whole
    run; review finding). All groups must agree: the adapter maps the WHOLE
    JAX parameter pytree through one transformation and has no per-group
    parameter mapping."""
    groups = opt.param_groups
    keys = set().union(*(g.keys() for g in groups)) - {"params"}
    hp = {}
    for k in sorted(keys):
        vals = [g.get(k, opt.defaults.get(k)) for g in groups]
        if any(v != vals[0] for v in vals[1:]):
            raise NotImplementedError(
                f"torch optimizer with per-param-group '{k}' values "
                f"{vals!r} cannot be mapped onto the JAX-native optimizer "
                "(one hyperparameter set updates the whole pytree); use a "
                "single param group or multimodn_tpu.optim directly")
        hp[k] = tuple(vals[0]) if isinstance(vals[0], (list, tuple)) \
            else vals[0]
    return hp


def _build_native_optimizer(opt, hp: dict):
    import torch.optim as topt

    from multimodn_tpu.optim import SGD, Adam, AdamW
    # maximize=True is gradient ASCENT — silently mapping it to the
    # minimizing native optimizer would train in the opposite direction
    # (review finding), so it is rejected like the other unmappable knobs.
    if isinstance(opt, topt.AdamW):
        _reject("AdamW", amsgrad=(hp.get("amsgrad", False), False),
                maximize=(hp.get("maximize", False), False))
        return AdamW(hp["lr"], betas=tuple(hp["betas"]), eps=hp["eps"],
                     weight_decay=hp["weight_decay"])
    if isinstance(opt, topt.Adam):
        _reject("Adam", amsgrad=(hp.get("amsgrad", False), False),
                weight_decay=(hp.get("weight_decay", 0.0), 0.0),
                maximize=(hp.get("maximize", False), False))
        return Adam(hp["lr"], betas=tuple(hp["betas"]), eps=hp["eps"])
    if isinstance(opt, topt.SGD):
        _reject("SGD", weight_decay=(hp.get("weight_decay", 0.0), 0.0),
                dampening=(hp.get("dampening", 0.0), 0.0),
                nesterov=(hp.get("nesterov", False), False),
                maximize=(hp.get("maximize", False), False))
        return SGD(hp["lr"], momentum=hp.get("momentum", 0.0))
    raise NotImplementedError(
        f"no JAX-native mapping for torch optimizer "
        f"{type(opt).__name__}; use multimodn_tpu.optim directly")


_HP_VARIANTS_WARN_AT = 6


def adapt_optimizer(opt: Any):
    """Map a torch optimizer instance to the JAX-native Optimizer, memoized
    per instance (state continuity across train_epoch calls).

    Hyperparameter MUTATIONS are honored: when a torch lr scheduler (or a
    manual ``param_groups`` edit) changes the lr between epochs, the cached
    adapter swaps in a rebuilt transformation IN PLACE — the model keeps the
    same Optimizer object, so Adam moments/step counts carry across the lr
    change exactly like torch. Each DISTINCT hyperparameter set traces and
    compiles its own fused program (lr is baked into the transformation):
    a StepLR with a handful of distinct lrs compiles that many programs,
    and revisited sets (cyclic schedules, warm restarts) reuse the
    memoized transformation so the already-compiled program is re-hit.
    Per-epoch-varying schedulers (CosineAnnealingLR, OneCycleLR) compile
    one program per epoch — a warning fires after
    ``_HP_VARIANTS_WARN_AT`` distinct sets; prefer step-wise schedules or
    ``multimodn_tpu.optim`` directly for those."""
    if not is_torch_optimizer(opt):
        return opt
    cached = _cache_lookup(_OPT_CACHE, opt)
    if cached is not None:
        ours, built_hp, variants = cached
        hp = _torch_opt_hparams(opt)
        if hp != built_hp:
            key = tuple(sorted(hp.items()))
            variant = variants.get(key)
            if variant is None:
                fresh = _build_native_optimizer(opt, hp)
                variant = (fresh.tx, getattr(fresh, "signature", None))
                variants[key] = variant
                if len(variants) == _HP_VARIANTS_WARN_AT:
                    import warnings
                    warnings.warn(
                        f"adapt_optimizer has built {len(variants)} distinct "
                        "hyperparameter variants for one torch optimizer — "
                        "each compiles its own fused program. A per-epoch-"
                        "varying lr scheduler (CosineAnnealingLR, OneCycle) "
                        "pays one XLA compile per epoch; use a step-wise "
                        "schedule or multimodn_tpu.optim directly.",
                        stacklevel=2)
            ours.tx, ours.signature = variant
            _cache_store(_OPT_CACHE, opt, (ours, hp, variants))
        return ours
    hp = _torch_opt_hparams(opt)
    ours = _build_native_optimizer(opt, hp)
    variants = {tuple(sorted(hp.items())):
                (ours.tx, getattr(ours, "signature", None))}
    _cache_store(_OPT_CACHE, opt, (ours, hp, variants))
    return ours


def adapt_criterion(criterion: Any):
    """Map a torch loss-module instance to the matching JAX loss name, or
    return None when the object is not a torch loss."""
    if not is_torch_loss(criterion):
        return None
    import torch.nn as nn
    _reject(type(criterion).__name__,
            reduction=(getattr(criterion, "reduction", "mean"), "mean"))
    if isinstance(criterion, nn.CrossEntropyLoss):
        _reject("CrossEntropyLoss",
                weight=(criterion.weight, None),
                ignore_index=(criterion.ignore_index, -100),
                label_smoothing=(getattr(criterion, "label_smoothing", 0.0),
                                 0.0))
        return "cross_entropy"
    if isinstance(criterion, nn.BCELoss):
        _reject("BCELoss", weight=(criterion.weight, None))
        return "bce"
    if isinstance(criterion, nn.MSELoss):
        return "mse"
    raise NotImplementedError(
        f"no JAX-native mapping for torch loss {type(criterion).__name__}; "
        f"pass one of the multimodn_tpu.core.losses names/callables")


def adapt_loader(loader: Any):
    """Materialize a torch DataLoader's dataset into an ArrayLoader with the
    same batch geometry, memoized per DataLoader instance."""
    if not is_torch_dataloader(loader):
        return loader
    cached = _cache_lookup(_LOADER_CACHE, loader)
    if cached is not None:
        return cached
    import torch.utils.data as tud

    from multimodn_tpu.data.loader import ArrayLoader
    if getattr(loader, "drop_last", False):
        raise NotImplementedError(
            "torch DataLoader(drop_last=True) has no ArrayLoader "
            "equivalent (the padded-tail mask keeps the final short batch "
            "exact); use drop_last=False")
    if getattr(loader, "batch_sampler", None) is not None and \
            not isinstance(loader.batch_sampler, tud.BatchSampler):
        raise NotImplementedError(
            "custom torch batch_samplers are not supported; use the "
            "default sequential/random samplers")
    # The sampler decides WHICH rows the loader serves — treating an
    # unrecognized sampler as "sequential over the full dataset" silently
    # trained on every row (train/test leakage with a SubsetRandomSampler;
    # review finding). Map the stock samplers, refuse the rest loudly.
    sampler = getattr(loader, "sampler", None)
    dataset = loader.dataset
    if sampler is None or isinstance(sampler, tud.SequentialSampler):
        shuffle = False
    elif isinstance(sampler, tud.SubsetRandomSampler):
        dataset = tud.Subset(dataset, [int(i) for i in sampler.indices])
        shuffle = True
    elif isinstance(sampler, tud.RandomSampler):
        if getattr(sampler, "replacement", False) or \
                sampler.num_samples != len(dataset):
            raise NotImplementedError(
                "torch RandomSampler with replacement=True or a custom "
                "num_samples has no ArrayLoader equivalent (epochs here "
                "are exact permutations); use the default RandomSampler")
        shuffle = True
    else:
        raise NotImplementedError(
            f"torch DataLoader sampler {type(sampler).__name__} is not "
            "supported by the interop shim (it selects rows the "
            "materialized ArrayLoader would silently ignore); use "
            "shuffle=True/False, SubsetRandomSampler, or build an "
            "ArrayLoader over the intended subset directly")
    batch_size = loader.batch_size or len(dataset)
    ours = ArrayLoader(dataset, batch_size, shuffle=shuffle)
    return _cache_store(_LOADER_CACHE, loader, ours)


def torch_parameters(model):
    """torch-tensor mirrors of the model's parameter pytree — snapshots
    sufficient for ``torch.optim.X(list(model.parameters()), lr)``
    construction (the reference pipelines' idiom,
    ``titanic_mlp_pipeline.py:74``)."""
    import jax
    import numpy as np
    import torch

    leaves = jax.tree_util.tree_leaves(model.state_dict())
    return [torch.nn.Parameter(torch.from_numpy(np.asarray(leaf).copy()))
            for leaf in leaves]
