#!/usr/bin/env python
"""Convert a torchvision resnet18 ``state_dict`` file to the encoder's npz.

The reference loads torchvision's ImageNet-pretrained resnet18 directly
(``multimodn/encoders/resnet_encoder.py:18``) or a torch checkpoint
(``:24-33``). This environment has no network, so pretrained weights arrive
as a file: this tool maps a torch-saved resnet18 ``state_dict`` (or a
checkpoint dict wrapping one under ``state_dict``/``model_state_dict``) onto
``multimodn_tpu.encoders.resnet.ResNet``'s flat-npz pretrained format
(keys like ``stem/w``, ``stages/0/1/conv1/bn/scale`` — see
``ResNet._load_npz``), converting conv weights OIHW -> HWIO for the NHWC
TPU layout.

Usage:
    python tools/convert_resnet18.py resnet18.pth out.npz
    ResNet(state_size=S, pretrained_path="out.npz")

The reference replaces the final fc with Identity and adds a fresh
``Linear(512 + state_size, state_size)`` head (``resnet_encoder.py:36,21``);
accordingly ``fc.*`` weights are dropped and the encoder's head keeps its
fresh initialization.
"""
from __future__ import annotations

import sys

import numpy as np

_STAGES = 4
_BLOCKS = 2

# torchvision key prefix per (stage, block) -> our pytree path prefix.
_BN_FIELDS = {"weight": "scale", "bias": "bias",
              "running_mean": "mean", "running_var": "var"}


def _conv_w(t) -> np.ndarray:
    """OIHW (torch) -> HWIO (our NHWC convs)."""
    w = np.asarray(t, dtype=np.float32)
    if w.ndim != 4:
        raise ValueError(f"conv weight must be 4-D, got shape {w.shape}")
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def convert_state_dict(sd: dict) -> dict:
    """torchvision resnet18 state_dict -> flat {path: ndarray} npz dict."""
    def t(key):
        if key not in sd:
            raise KeyError(
                f"missing key {key!r} — is this a torchvision resnet18 "
                f"state_dict? (got {len(sd)} keys)")
        v = sd[key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v, dtype=np.float32)

    out = {"stem/w": _conv_w(t("conv1.weight"))}
    for tf, of in _BN_FIELDS.items():
        out[f"stem/bn/{of}"] = t(f"bn1.{tf}")
    for s in range(_STAGES):
        for b in range(_BLOCKS):
            src = f"layer{s + 1}.{b}"
            dst = f"stages/{s}/{b}"
            for c in ("conv1", "conv2"):
                bn = "bn1" if c == "conv1" else "bn2"
                out[f"{dst}/{c}/w"] = _conv_w(t(f"{src}.{c}.weight"))
                for tf, of in _BN_FIELDS.items():
                    out[f"{dst}/{c}/bn/{of}"] = t(f"{src}.{bn}.{tf}")
            if f"{src}.downsample.0.weight" in sd:
                out[f"{dst}/down/w"] = _conv_w(t(f"{src}.downsample.0.weight"))
                for tf, of in _BN_FIELDS.items():
                    out[f"{dst}/down/bn/{of}"] = t(f"{src}.downsample.1.{tf}")
    # fc.* intentionally dropped (reference fc -> Identity,
    # resnet_encoder.py:36); the encoder head keeps its fresh init.
    return out


def convert_file(in_path: str, out_path: str) -> dict:
    import torch

    obj = torch.load(in_path, map_location="cpu", weights_only=False)
    for wrapper in ("state_dict", "model_state_dict"):
        if isinstance(obj, dict) and wrapper in obj:
            obj = obj[wrapper]
    if not isinstance(obj, dict):
        raise ValueError(
            f"{in_path} does not contain a state_dict (got {type(obj)})")
    flat = convert_state_dict(obj)
    np.savez(out_path, **flat)
    return flat


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        print(__doc__)
        raise SystemExit(2)
    flat = convert_file(argv[0], argv[1])
    print(f"wrote {argv[1]}: {len(flat)} arrays, "
          f"{sum(a.size for a in flat.values()):,} parameters")


if __name__ == "__main__":
    main()
