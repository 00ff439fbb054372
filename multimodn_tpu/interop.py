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


def adapt_optimizer(opt: Any):
    """Map a torch optimizer instance to the JAX-native Optimizer, memoized
    per instance (state continuity across train_epoch calls)."""
    if not is_torch_optimizer(opt):
        return opt
    cached = _cache_lookup(_OPT_CACHE, opt)
    if cached is not None:
        return cached
    import torch.optim as topt

    from multimodn_tpu.optim import SGD, Adam, AdamW
    d = opt.defaults
    if isinstance(opt, topt.AdamW):
        _reject("AdamW", amsgrad=(d.get("amsgrad", False), False))
        ours = AdamW(d["lr"], betas=tuple(d["betas"]), eps=d["eps"],
                     weight_decay=d["weight_decay"])
    elif isinstance(opt, topt.Adam):
        _reject("Adam", amsgrad=(d.get("amsgrad", False), False),
                weight_decay=(d.get("weight_decay", 0.0), 0.0))
        ours = Adam(d["lr"], betas=tuple(d["betas"]), eps=d["eps"])
    elif isinstance(opt, topt.SGD):
        _reject("SGD", weight_decay=(d.get("weight_decay", 0.0), 0.0),
                dampening=(d.get("dampening", 0.0), 0.0),
                nesterov=(d.get("nesterov", False), False))
        ours = SGD(d["lr"], momentum=d.get("momentum", 0.0))
    else:
        raise NotImplementedError(
            f"no JAX-native mapping for torch optimizer "
            f"{type(opt).__name__}; use multimodn_tpu.optim directly")
    return _cache_store(_OPT_CACHE, opt, ours)


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
    shuffle = isinstance(getattr(loader, "sampler", None), tud.RandomSampler)
    batch_size = loader.batch_size or len(loader.dataset)
    ours = ArrayLoader(loader.dataset, batch_size, shuffle=shuffle)
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
