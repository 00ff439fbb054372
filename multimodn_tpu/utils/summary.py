"""Architecture summaries — the ``display_arch`` equivalent of the reference's
torchsummary tables (reference ``multimodn/multimodn.py:494-507``)."""
from __future__ import annotations

import jax
import numpy as np


def _count_params(tree) -> int:
    return sum(int(np.prod(np.shape(leaf)))
               for leaf in jax.tree_util.tree_leaves(tree))


def _describe_tree(tree, indent: str = "    ") -> str:
    lines = []
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        lines.append(f"{indent}{name}: {tuple(np.shape(leaf))}")
    return "\n".join(lines)


def summarize_model(model) -> str:
    """Human-readable per-module parameter table for a MultiModN model."""
    out = []
    total = 0
    n = _count_params(model.params["init_state"])
    total += n
    out.append(f"InitState ({type(model.init_state).__name__}): {n} params")
    enc_params = model.params["encoders"]
    if isinstance(enc_params, (list, tuple)):
        for i, enc in enumerate(model.encoders):
            p = enc_params[i]
            n = _count_params(p)
            total += n
            out.append(f"Encoder {i} ({type(enc).__name__}): {n} params")
            out.append(_describe_tree(p))
    else:
        # Scan-mode stacked storage: one pytree with a leading (E,) axis.
        n = _count_params(enc_params)
        total += n
        out.append(f"Encoders x{len(model.encoders)} "
                   f"({type(model.encoders[0]).__name__}, stacked): "
                   f"{n} params")
        out.append(_describe_tree(enc_params))
    for i, dec in enumerate(model.decoders):
        p = model.params["decoders"][i]
        n = _count_params(p)
        total += n
        out.append(f"Decoder {i} ({type(dec).__name__}, n_classes={dec.n_classes}): "
                   f"{n} params")
        out.append(_describe_tree(p))
    out.append(f"Total parameters: {total}")
    return "\n".join(out)
