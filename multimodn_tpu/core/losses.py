"""Loss functions (jit-traceable, mask-aware).

The reference applies ``torch.nn.CrossEntropyLoss`` to the decoders'
*sigmoid-activated* outputs (reference ``multimodn/multimodn.py:146`` with
``decoders.py:20``): CE-over-sigmoid is the behavior to match, so the loss
here is log-softmax over whatever the decoder emitted, exactly like torch.

All losses take an optional per-sample validity mask so padded batch tails
(static shapes for XLA) and per-sample missingness never contaminate the mean.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy_loss(outputs: jnp.ndarray, targets: jnp.ndarray,
                       mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean cross-entropy, semantics of torch.nn.CrossEntropyLoss(reduction='mean').

    Args:
        outputs: (..., B, C) unnormalized (or sigmoid-activated — matched
            behavior) class scores.
        targets: (..., B) integer class indices.
        mask: optional (..., B) float/bool validity; mean is over valid samples.
    Returns:
        scalar (or leading-dims) mean loss.
    """
    logz = jax.scipy.special.logsumexp(outputs, axis=-1)
    picked = jnp.take_along_axis(outputs, targets[..., None].astype(jnp.int32),
                                 axis=-1)[..., 0]
    ce = logz - picked
    if mask is None:
        return jnp.mean(ce, axis=-1)
    m = mask.astype(ce.dtype)
    denom = jnp.maximum(jnp.sum(m, axis=-1), 1.0)
    return jnp.sum(ce * m, axis=-1) / denom


def bce_loss(outputs: jnp.ndarray, targets: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Binary cross-entropy over the positive-class column (column 1)."""
    p = jnp.clip(outputs[..., 1], 1e-7, 1.0 - 1e-7)
    t = targets.astype(p.dtype)
    ce = -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))
    if mask is None:
        return jnp.mean(ce, axis=-1)
    m = mask.astype(ce.dtype)
    denom = jnp.maximum(jnp.sum(m, axis=-1), 1.0)
    return jnp.sum(ce * m, axis=-1) / denom


def mse_loss(outputs: jnp.ndarray, targets: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean squared error against one-hot targets."""
    onehot = jax.nn.one_hot(targets, outputs.shape[-1], dtype=outputs.dtype)
    se = jnp.mean((outputs - onehot) ** 2, axis=-1)
    if mask is None:
        return jnp.mean(se, axis=-1)
    m = mask.astype(se.dtype)
    denom = jnp.maximum(jnp.sum(m, axis=-1), 1.0)
    return jnp.sum(se * m, axis=-1) / denom


LOSSES = {
    "cross_entropy": cross_entropy_loss,
    "ce": cross_entropy_loss,
    "bce": bce_loss,
    "mse": mse_loss,
}


for _fn in (cross_entropy_loss, bce_loss, mse_loss):
    _fn._accepts_mask = True


class CrossEntropyLoss:
    """Drop-in-named criterion object mirroring torch.nn.CrossEntropyLoss usage
    in the reference pipelines (``titanic_mlp_pipeline.py:76``)."""

    _accepts_mask = True

    def __call__(self, outputs, targets, mask=None):
        return cross_entropy_loss(outputs, targets, mask)


import weakref

# id(criterion) -> wrapped, with WEAK values: the wrapped closure holds the
# only strong reference to its base criterion, so an entry lives exactly as
# long as some consumer (e.g. a model's program cache) holds the wrapped
# function — and the id key can never alias a dead object while its entry
# exists. (A WeakKeyDictionary would never evict here: the wrapped VALUE
# strongly references the KEY through its _base default.)
_WRAP_CACHE: "weakref.WeakValueDictionary" = weakref.WeakValueDictionary()


def resolve_criterion(criterion):
    """Accept a string name, a callable, or None (-> cross-entropy).

    Callables taking only (outputs, targets) are applied per metric row via
    vmap (see core.fusion.decode_grid); they cannot be mask-corrected, so
    with such criteria padded batch tails contribute to the per-cell mean
    (use mask-aware 3-arg criteria for exactness). Wrapping is memoized per
    base callable so repeated train/eval calls with the same user criterion
    reuse one compiled program."""
    if criterion is None:
        return cross_entropy_loss
    # Torch loss-module instances (reference pipelines pass
    # ``nn.CrossEntropyLoss()``, titanic_mlp_pipeline.py:76) map to the
    # matching JAX loss BEFORE the generic-callable branch — calling a torch
    # module with traced jnp arrays would fail deep inside torch.
    from multimodn_tpu.interop import adapt_criterion
    _torch_name = adapt_criterion(criterion)
    if _torch_name is not None:
        return LOSSES[_torch_name]
    if callable(criterion):
        if getattr(criterion, "_accepts_mask", None) is not None:
            return criterion
        import inspect
        try:
            sig = inspect.signature(criterion)
            # Mask-aware means the callable REQUIRES a third argument: count
            # parameters without defaults, so torch-style criteria with
            # extra defaulted knobs (e.g. reduction='mean') are not handed
            # the row mask as that knob.
            required = [
                p for p in sig.parameters.values()
                if p.default is inspect.Parameter.empty
                and p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)]
            n_params = len(required)
        except (ValueError, TypeError):
            # Uninspectable (C-extension) callables: assume the torch-style
            # 2-arg contract the reference uses (multimodn.py:146).
            required, n_params = [], 2
        if n_params >= 3 and (
                n_params > 3 or required[2].name not in
                ("mask", "sample_mask", "valid_mask", "validity")):
            # A third REQUIRED parameter that isn't mask-named is a loss
            # knob (e.g. focal gamma) — silently feeding it the 0/1 row
            # mask would corrupt every batch's loss. Refuse loudly.
            raise ValueError(
                f"criterion {getattr(criterion, '__name__', criterion)!r} "
                f"requires {n_params} positional arguments; only "
                "(outputs, targets) or (outputs, targets, mask) criteria "
                "are supported — name the third parameter 'mask' (it "
                "receives the per-sample 0/1 validity of padded batch "
                "tails), bind extra knobs with functools.partial or "
                "defaults, or set `criterion._accepts_mask = True/False` "
                "explicitly.")
        if n_params >= 3:
            try:
                criterion._accepts_mask = True
                return criterion
            except (AttributeError, TypeError):
                # Extension-type callables reject attribute writes; wrap in
                # a mask-forwarding shim instead of crashing.
                cached = _WRAP_CACHE.get(id(criterion))
                if cached is not None and \
                        cached.__defaults__[1] is criterion:
                    return cached

                def wrapped3(outputs, targets, mask=None, _base=criterion):
                    return _base(outputs, targets, mask)
                wrapped3._accepts_mask = True
                _WRAP_CACHE[id(criterion)] = wrapped3
                return wrapped3
        cached = _WRAP_CACHE.get(id(criterion))
        if cached is not None and cached.__defaults__[1] is criterion:
            return cached

        def wrapped(outputs, targets, mask=None, _base=criterion):
            return _base(outputs, targets)
        wrapped._accepts_mask = False
        _WRAP_CACHE[id(criterion)] = wrapped
        return wrapped
    try:
        return LOSSES[criterion]
    except KeyError:
        raise ValueError(f"Unknown loss {criterion!r}; known: {sorted(LOSSES)}")
