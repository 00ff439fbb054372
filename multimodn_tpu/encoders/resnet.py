"""ResNet image encoder.

Reference counterpart: ``multimodn/encoders/resnet_encoder.py`` — a
torchvision resnet18 (optionally ImageNet-pretrained or checkpoint-loaded),
final fc replaced by identity, with a new head
``Linear(512 + state_size, state_size)`` over ``[resnet(img), state]``.
Quirk #10: the reference class is NOT exported and NOT a MultiModEncoder
subclass; here it IS a proper ``MultiModEncoder`` (the quirk is an omission,
not a behavior — nothing consumes it in the shipped pipelines).

TPU-native rebuild: the ResNet-18 topology (7x7/2 stem, 4 stages of 2 basic
blocks, widths 64/128/256/512, global average pool) implemented directly in
JAX with NHWC layout (TPU-preferred) so XLA tiles the convolutions onto the
MXU. No network access exists here, so "pretrained" means loading a local
``.npz`` of this module's parameter pytree (``pretrained_path``); training
from scratch works out of the box.

BatchNorm: ``train=True`` normalizes with batch statistics; ``train=False``
uses the stored (loaded or identity-initialized) running statistics. Running
stats are NOT updated during training (document: this encoder is API surface;
full BN-EMA tracking can ride the params pytree if a use case needs it).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodn_tpu.core.nn import dense_init, dense_apply
from multimodn_tpu.encoders.base import MultiModEncoder

_STAGES = (64, 128, 256, 512)
_BLOCKS_PER_STAGE = 2


def _conv_init(key, kh, kw, cin, cout):
    # He-normal fan-out like torchvision's resnet init.
    std = float(np.sqrt(2.0 / (kh * kw * cout)))
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * std


def _bn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _conv(x, w, stride):
    # Torch-exact symmetric padding ((k-1)//2 per side — torchvision uses
    # padding=3/1/0 for the 7x7/3x3/1x1 convs). For stride 1 this equals
    # XLA's SAME; for the strided convs SAME would pad asymmetrically
    # ((2,3) instead of (3,3)) and diverge numerically from converted
    # torchvision checkpoints (tools/convert_resnet18.py golden test).
    kh, kw = int(w.shape[0]), int(w.shape[1])
    pad = (((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2)
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(x, p, train, mask=None):
    """BatchNorm. In train mode with a per-sample ``mask`` (B,), statistics
    are computed over VALID rows only — padded zero-image rows in a tail
    batch must not shift the normalization of real samples (the loader's
    padded-batch exactness invariant)."""
    if train:
        if mask is not None:
            w = mask.reshape(-1, 1, 1, 1).astype(x.dtype)
            denom = jnp.maximum(jnp.sum(w) * x.shape[1] * x.shape[2], 1.0)
            mean = jnp.sum(x * w, axis=(0, 1, 2)) / denom
            var = jnp.sum(w * (x - mean) ** 2, axis=(0, 1, 2)) / denom
        else:
            mean = jnp.mean(x, axis=(0, 1, 2))
            var = jnp.var(x, axis=(0, 1, 2))
    else:
        mean, var = p["mean"], p["var"]
    inv = jax.lax.rsqrt(var + 1e-5)
    return (x - mean) * inv * p["scale"] + p["bias"]


class ResNet(MultiModEncoder):
    """ResNet-18 image encoder with a state-concat head.

    apply(params, state (B, S), images (B, H, W, 3)) -> (B, S).
    """

    def __init__(self, *, state_size: int, freeze: bool = False,
                 pretrained_path: Optional[str] = None,
                 pretrained: bool = False):
        super().__init__(state_size, n_features=None)
        if pretrained_path is not None and pretrained:
            raise ValueError(
                "Loading a pretrained ResNet should either be from a local "
                "checkpoint (pretrained_path) or default init, not both.")
        if pretrained:
            raise ValueError(
                "No network access: supply pretrained weights as a local "
                ".npz via pretrained_path (numpy pytree of this module).")
        if state_size < 1:
            # A Linear(512, 0) head would emit (B, 0) states and only fail
            # as an opaque carry-shape error deep inside the fusion trace.
            raise ValueError(f"ResNet needs state_size >= 1, got {state_size}")
        self.freeze = freeze
        self.pretrained_path = pretrained_path

    # ------------------------------------------------------------------
    def init(self, key) -> dict:
        keys = iter(jax.random.split(key, 64))
        params = {
            "stem": {"w": _conv_init(next(keys), 7, 7, 3, 64),
                     "bn": _bn_init(64)},
            "stages": [],
            "head": dense_init(next(keys), 512 + self.state_size,
                               self.state_size),
        }
        cin = 64
        for s, cout in enumerate(_STAGES):
            blocks = []
            for b in range(_BLOCKS_PER_STAGE):
                stride = 2 if (s > 0 and b == 0) else 1
                block = {
                    "conv1": {"w": _conv_init(next(keys), 3, 3, cin, cout),
                              "bn": _bn_init(cout)},
                    "conv2": {"w": _conv_init(next(keys), 3, 3, cout, cout),
                              "bn": _bn_init(cout)},
                }
                if stride != 1 or cin != cout:
                    block["down"] = {
                        "w": _conv_init(next(keys), 1, 1, cin, cout),
                        "bn": _bn_init(cout)}
                blocks.append(block)
                cin = cout
            params["stages"].append(blocks)
        if self.pretrained_path:
            params = self._load_npz(params, self.pretrained_path)
        return params

    @staticmethod
    def _load_npz(params, path):
        """Overlay a flat .npz (keys = 'stem/w', 'stages/0/0/conv1/bn/scale',
        ...) onto the freshly-initialized pytree; missing keys keep init."""
        flat = dict(np.load(path))

        def walk(tree, prefix):
            if isinstance(tree, dict):
                return {k: walk(v, f"{prefix}/{k}" if prefix else k)
                        for k, v in tree.items()}
            if isinstance(tree, list):
                return [walk(v, f"{prefix}/{i}") for i, v in enumerate(tree)]
            return jnp.asarray(flat[prefix]) if prefix in flat else tree

        return walk(params, "")

    # Chains pass the EFFECTIVE per-sample validity mask so train-mode
    # BatchNorm excludes both padded rows and NaN-missing rows from batch
    # statistics (see core/fusion.chain_step_skip).
    _accepts_sample_mask = True

    # ------------------------------------------------------------------
    def features(self, params, images, train=False, mask=None):
        """(B, H, W, 3) -> (B, 512) global-average-pooled features."""
        x = _conv(images, params["stem"]["w"], 2)
        x = jax.nn.relu(_bn(x, params["stem"]["bn"], train, mask))
        # torch MaxPool2d(3, stride=2, padding=1): symmetric -inf padding.
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))
        for s, blocks in enumerate(params["stages"]):
            for b, block in enumerate(blocks):
                stride = 2 if (s > 0 and b == 0) else 1
                h = jax.nn.relu(_bn(_conv(x, block["conv1"]["w"], stride),
                                    block["conv1"]["bn"], train, mask))
                h = _bn(_conv(h, block["conv2"]["w"], 1),
                        block["conv2"]["bn"], train, mask)
                shortcut = x
                if "down" in block:
                    shortcut = _bn(_conv(x, block["down"]["w"], stride),
                                   block["down"]["bn"], train, mask)
                x = jax.nn.relu(h + shortcut)
        return jnp.mean(x, axis=(1, 2))

    def apply(self, params, state, x, *, train=False, rng=None,
              sample_mask=None):
        feats = self.features(params, x, train=train, mask=sample_mask)
        if self.freeze:
            feats = jax.lax.stop_gradient(feats)
        return dense_apply(params["head"],
                           jnp.concatenate([feats, state], axis=-1))

    # ------------------------------------------------------------------
    def update_batch_stats(self, params, images, momentum: float = 0.9,
                           sample_mask=None):
        """Return params with BatchNorm running statistics EMA-updated from
        one batch (torch momentum convention: new = (1-m)*batch + m*old with
        torch's momentum=0.1 <-> momentum=0.9 here).

        The training step itself is pure (train=True normalizes with batch
        stats and never mutates); call this periodically — or per batch — on
        the side when eval-mode stats should track training data.
        ``sample_mask`` (B,) excludes padded tail rows from the batch
        statistics — without it, zero-image padding would drag every
        running mean toward 0 and inflate variance (the same padded-batch
        exactness the masked ``_bn`` path guarantees in-step).
        """
        stats = {}
        if sample_mask is not None:
            w = sample_mask.astype(jnp.float32)
            denom = jnp.maximum(jnp.sum(w), 1.0)

            def record(name, xs):
                wm = w.reshape((-1,) + (1,) * (xs.ndim - 1))
                # Per-channel masked mean/var over (real samples x H x W).
                hw = xs.shape[1] * xs.shape[2]
                mean = jnp.sum(xs * wm, axis=(0, 1, 2)) / (denom * hw)
                var = jnp.sum(((xs - mean) ** 2) * wm,
                              axis=(0, 1, 2)) / (denom * hw)
                stats[name] = (mean, var)
        else:
            def record(name, xs):
                stats[name] = (jnp.mean(xs, axis=(0, 1, 2)),
                               jnp.var(xs, axis=(0, 1, 2)))

        # Re-run the stem/stages capturing pre-normalization activations;
        # the in-run batch normalization is masked too, so deeper layers'
        # REAL-row activations match an unpadded run exactly.
        x = _conv(images, params["stem"]["w"], 2)
        record("stem", x)
        x = jax.nn.relu(_bn(x, params["stem"]["bn"], True, sample_mask))
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))
        for s, blocks in enumerate(params["stages"]):
            for b, block in enumerate(blocks):
                stride = 2 if (s > 0 and b == 0) else 1
                h = _conv(x, block["conv1"]["w"], stride)
                record(f"{s}/{b}/conv1", h)
                h = jax.nn.relu(_bn(h, block["conv1"]["bn"], True,
                                    sample_mask))
                h = _conv(h, block["conv2"]["w"], 1)
                record(f"{s}/{b}/conv2", h)
                h = _bn(h, block["conv2"]["bn"], True, sample_mask)
                shortcut = x
                if "down" in block:
                    shortcut = _conv(x, block["down"]["w"], stride)
                    record(f"{s}/{b}/down", shortcut)
                    shortcut = _bn(shortcut, block["down"]["bn"], True,
                                   sample_mask)
                x = jax.nn.relu(h + shortcut)

        def ema(bn, key):
            mean, var = stats[key]
            return dict(bn, mean=momentum * bn["mean"] + (1 - momentum) * mean,
                        var=momentum * bn["var"] + (1 - momentum) * var)

        new = jax.tree_util.tree_map(lambda v: v, params)
        new["stem"] = dict(new["stem"], bn=ema(params["stem"]["bn"], "stem"))
        new_stages = []
        for s, blocks in enumerate(params["stages"]):
            nb = []
            for b, block in enumerate(blocks):
                blk = dict(block,
                           conv1=dict(block["conv1"],
                                      bn=ema(block["conv1"]["bn"],
                                             f"{s}/{b}/conv1")),
                           conv2=dict(block["conv2"],
                                      bn=ema(block["conv2"]["bn"],
                                             f"{s}/{b}/conv2")))
                if "down" in block:
                    blk["down"] = dict(block["down"],
                                       bn=ema(block["down"]["bn"],
                                              f"{s}/{b}/down"))
                nb.append(blk)
            new_stages.append(nb)
        new["stages"] = new_stages
        return new
