"""Minimal pure-functional NN primitives used by every encoder/decoder.

Parameters are plain pytrees (dicts of jnp arrays); modules are static config
objects exposing ``init(key) -> params`` and ``apply(params, ...) -> out``.
This keeps every model a single flat pytree, which is what lets the framework
stack parameters for ``lax.scan`` over homogeneous encoder chains and apply
``jax.sharding`` specs uniformly.

Initialization matches the distribution torch.nn.Linear uses (reference
encoders/decoders are built exclusively from nn.Linear / nn.LSTM / nn.RNN):
both weight and bias ~ U(-1/sqrt(fan_in), +1/sqrt(fan_in)).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def _uniform(key, shape, bound, dtype):
    return jax.random.uniform(key, shape, dtype=dtype, minval=-bound, maxval=bound)


def dense_init(key, in_dim: int, out_dim: int, dtype=jnp.float32) -> dict:
    """Linear layer params with torch.nn.Linear's default init distribution."""
    wk, bk = jax.random.split(key)
    bound = 1.0 / (in_dim ** 0.5) if in_dim > 0 else 0.0
    return {
        # Stored as (in, out) so application is a plain x @ w — the layout XLA
        # tiles directly onto the MXU for row-major activations.
        "w": _uniform(wk, (in_dim, out_dim), bound, dtype),
        "b": _uniform(bk, (out_dim,), bound, dtype),
    }


def dense_apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """y = x @ w + b. Supports arbitrary leading batch dims, so a decoder can
    evaluate the whole (E+1, B, S) state stack in one contraction.

    The contraction always accumulates in float32 (the MXU's native mode for
    bf16 inputs) and the result is cast back to the activation dtype, so
    bf16 compute chains stay bf16 end-to-end with fp32 accumulation."""
    y = jnp.matmul(x, params["w"], preferred_element_type=jnp.float32)
    return y.astype(x.dtype) + params["b"].astype(x.dtype)


# Activation registry: string names keep pipeline configs serializable while
# callables remain accepted everywhere. All entries are module-level named
# functions so models holding them pickle by reference (the reference
# pipelines pickle whole models — titanic_mlp_pipeline.py:96).
def identity(x):
    return x


def relu(x):
    return jax.nn.relu(x)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def tanh(x):
    return jnp.tanh(x)


def gelu(x):
    return jax.nn.gelu(x)


def softmax(x):
    return jax.nn.softmax(x, axis=-1)


ACTIVATIONS = {
    "relu": relu,
    "sigmoid": sigmoid,
    "tanh": tanh,
    "identity": identity,
    "none": identity,
    "gelu": gelu,
    "softmax": softmax,
}


def resolve_activation(act):
    if act is None:
        return identity
    if callable(act):
        # Torch activations (reference pipelines pass ``F.relu``,
        # titanic_mlp_pipeline.py:69) map to the JAX twin by name — calling
        # a torch function on traced jnp arrays would fail inside torch.
        mod = getattr(act, "__module__", "") or ""
        if mod.startswith("torch"):
            name = getattr(act, "__name__", type(act).__name__).lower()
            if name in ACTIVATIONS:
                return ACTIVATIONS[name]
            raise ValueError(
                f"torch activation {name!r} has no JAX mapping; known: "
                f"{sorted(ACTIVATIONS)}")
        return act
    try:
        return ACTIVATIONS[act]
    except KeyError:
        raise ValueError(f"Unknown activation {act!r}; known: {sorted(ACTIVATIONS)}")


def mlp_init(key, dims: Sequence[int], dtype=jnp.float32) -> list:
    """Params for a stack of dense layers with the given dims chain."""
    keys = jax.random.split(key, max(len(dims) - 1, 1))
    return [
        dense_init(k, d_in, d_out, dtype)
        for k, d_in, d_out in zip(keys, dims[:-1], dims[1:])
    ]


def dropout(x: jnp.ndarray, rate: float, rng: Optional[jax.Array], train: bool):
    """Inverted dropout matching torch.nn.Dropout semantics (identity in eval)."""
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
