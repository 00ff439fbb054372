"""Transformer encoder: the "large user-supplied encoder" the sharding layer
was designed for.

The reference has no attention anywhere (SURVEY §2.4/§5 — its widest module
is a 1080x32 Linear); its ResNet image encoder (``multimodn/encoders/
resnet_encoder.py``) is the only gesture toward heavy encoders and is not
even exported. This module is the beyond-reference counterpart for the TPU
era: a pre-LN transformer over feature-chunk tokens that plugs into the
standard ``MultiModEncoder`` contract, so wide tabular/embedding modalities
(e.g. the 1024-dim HAIM image embeddings) get an MXU-saturating encoder
while every training program (fused fit, k-fold vmap, DP x TP sharding)
keeps working unchanged — the whole point of exposing mesh axes in
``parallel/sharding.py``: every 2-D weight here (qkv/proj/mlp) is
column-shardable over the ``model`` axis.

Design for the MXU: tokens are contiguous feature chunks projected to
``embed_dim`` (pad-to-chunk handled at init by a fixed zero-pad), attention
uses jnp.einsum with fp32 accumulation, and all dims should be multiples of
128 for best tiling (not required for correctness).
"""
from __future__ import annotations

from typing import Callable, Union

import jax
import jax.numpy as jnp

from multimodn_tpu.core.nn import (dense_apply, dense_init, dropout,
                                   resolve_activation)
from multimodn_tpu.encoders.base import MultiModEncoder


def _layernorm(params, x, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    xhat = (x - mu) * jax.lax.rsqrt(var + eps)
    return xhat * params["scale"] + params["bias"]


def _ln_init(dim):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


class TransformerEncoder(MultiModEncoder):
    """Pre-LN transformer over feature-chunk tokens.

    (B, n_features) input -> zero-pad to a multiple of ``chunk`` -> (B, T,
    chunk) tokens -> linear embed (+learned positions) -> ``n_layers``
    pre-LN blocks (MHA + GELU MLP, residuals, optional dropout) -> mean-pool
    -> concat fusion state -> project to state_size. Also accepts (B, T, F)
    inputs directly (real token sequences), skipping the chunking.
    """

    def __init__(self, state_size: int, n_features: int, embed_dim: int = 256,
                 n_heads: int = 4, n_layers: int = 2, mlp_ratio: int = 4,
                 chunk: int = 64, dropout_rate: float = 0.0,
                 activation: Union[str, Callable] = "gelu"):
        super().__init__(state_size, n_features)
        if embed_dim % n_heads:
            raise ValueError(f"embed_dim {embed_dim} % n_heads {n_heads} != 0")
        self.embed_dim = embed_dim
        self.n_heads = n_heads
        self.n_layers = n_layers
        self.mlp_ratio = mlp_ratio
        self.mlp_dim = embed_dim * mlp_ratio
        self.chunk = chunk
        self.dropout_rate = dropout_rate
        self.activation = resolve_activation(activation)
        self.n_tokens = -(-n_features // chunk)          # cdiv
        self.pad = self.n_tokens * chunk - n_features

    @property
    def stochastic(self) -> bool:
        # Base-class contract: whether apply() consumes rng during training
        # (review finding: this reported False with dropout_rate > 0).
        return self.dropout_rate > 0

    def init(self, key) -> dict:
        keys = jax.random.split(key, 2 + self.n_layers)
        params = {
            "embed": dense_init(keys[0], self.chunk, self.embed_dim),
            "pos": jnp.zeros((self.n_tokens, self.embed_dim), jnp.float32),
            "out": dense_init(keys[1], self.embed_dim + self.state_size,
                              self.state_size),
            "blocks": [],
            "ln_f": _ln_init(self.embed_dim),
        }
        for k in keys[2:]:
            kq, kp, k1, k2 = jax.random.split(k, 4)
            params["blocks"].append({
                "ln1": _ln_init(self.embed_dim),
                "qkv": dense_init(kq, self.embed_dim, 3 * self.embed_dim),
                "proj": dense_init(kp, self.embed_dim, self.embed_dim),
                "ln2": _ln_init(self.embed_dim),
                "mlp1": dense_init(k1, self.embed_dim, self.mlp_dim),
                "mlp2": dense_init(k2, self.mlp_dim, self.embed_dim),
            })
        return params

    def _attend(self, block, h):
        B, T, D = h.shape
        H = self.n_heads
        hd = D // H
        qkv = dense_apply(block["qkv"], h)                  # (B, T, 3D)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda t: t.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        att = jax.nn.softmax(logits / jnp.sqrt(float(hd)), axis=-1)
        att = att.astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v,
                         preferred_element_type=jnp.float32).astype(h.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
        return dense_apply(block["proj"], out)

    def apply(self, params, state, x, *, train=False, rng=None):
        if x.ndim == 2:
            if self.pad:
                x = jnp.pad(x, ((0, 0), (0, self.pad)))
            h = x.reshape(x.shape[0], self.n_tokens, self.chunk)
        else:
            h = x                                           # (B, T, F) tokens
        h = dense_apply(params["embed"], h) + \
            params["pos"][None].astype(x.dtype)
        for i, block in enumerate(params["blocks"]):
            step_rng = jax.random.fold_in(rng, i) if rng is not None else None
            a = self._attend(block, _layernorm(block["ln1"], h))
            a = dropout(a, self.dropout_rate, step_rng, train)
            h = h + a
            m = dense_apply(block["mlp2"], self.activation(
                dense_apply(block["mlp1"], _layernorm(block["ln2"], h))))
            h = h + m
        h = _layernorm(params["ln_f"], h).mean(axis=1)       # (B, D)
        return dense_apply(params["out"],
                           jnp.concatenate([h, state], axis=-1))


class ViTEncoder(TransformerEncoder):
    """Vision Transformer image encoder with a state-concat head.

    ``apply(params, state (B, S), images (B, H, W, C) or flat
    (B, H*W*C)) -> (B, S)`` — the MXU-native large image encoder SURVEY
    §2.4 names as the natural replacement for the reference's unused
    torchvision ResNet (``multimodn/encoders/resnet_encoder.py:6-45``):
    patch embedding and attention/MLP blocks are all large matmuls, and
    every 2-D weight is column-shardable over the ``model`` mesh axis
    (``parallel/sharding.py``), so it composes with DP×TP unchanged.

    Implementation: non-overlapping ``patch_size`` patches become the
    parent class's tokens (``chunk = patch² · channels``, so the shared
    ``embed`` dense IS the patch embedding and ``pos`` the learned
    position table); blocks, pooling, and the state-concat output head
    are inherited unchanged. Flat inputs (the `MultiModDataset` column
    convention) are reshaped to (H, W, C) row-major first.
    """

    def __init__(self, state_size: int, image_size=(32, 32),
                 patch_size: int = 8, channels: int = 3,
                 embed_dim: int = 256, n_heads: int = 4, n_layers: int = 4,
                 mlp_ratio: int = 4, dropout_rate: float = 0.0,
                 activation: Union[str, Callable] = "gelu"):
        if isinstance(image_size, int):
            image_size = (image_size, image_size)
        H, W = image_size
        if H % patch_size or W % patch_size:
            raise ValueError(
                f"image_size {image_size} must be divisible by "
                f"patch_size {patch_size}")
        super().__init__(state_size, H * W * channels,
                         embed_dim=embed_dim, n_heads=n_heads,
                         n_layers=n_layers, mlp_ratio=mlp_ratio,
                         chunk=patch_size * patch_size * channels,
                         dropout_rate=dropout_rate, activation=activation)
        # chunk divides H*W*C exactly, so the parent's token count is the
        # patch grid and its zero-pad is 0 by construction. Raise (not
        # assert, which python -O strips) so a parent-tokenization change
        # can never silently mis-patch images (ADVICE r3).
        if self.pad != 0 or self.n_tokens != (H // patch_size) * \
                (W // patch_size):
            raise ValueError(
                f"parent tokenization diverged from the patch grid: pad="
                f"{self.pad}, n_tokens={self.n_tokens} (expected 0 and "
                f"{(H // patch_size) * (W // patch_size)})")
        self.image_size = (H, W)
        self.patch_size = patch_size
        self.channels = channels

    def _patchify(self, x):
        """(B, H, W, C) or flat (B, H*W*C) -> (B, T, patch²·C) tokens."""
        B = x.shape[0]
        H, W = self.image_size
        p, C = self.patch_size, self.channels
        if x.ndim == 2:
            if x.shape[1] != H * W * C:
                raise ValueError(
                    f"ViTEncoder configured for {(H, W, C)} images "
                    f"({H * W * C} flat features), got flat width "
                    f"{x.shape[1]}")
            x = x.reshape(B, H, W, C)
        elif x.shape[1:] != (H, W, C):
            raise ValueError(
                f"ViTEncoder configured for {(H, W, C)} images, got "
                f"{tuple(x.shape[1:])}")
        x = x.reshape(B, H // p, p, W // p, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(B, (H // p) * (W // p), p * p * C)

    def apply(self, params, state, x, *, train=False, rng=None):
        return super().apply(params, state, self._patchify(x),
                             train=train, rng=rng)
