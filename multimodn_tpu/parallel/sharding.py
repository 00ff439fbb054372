"""Sharding rules for MultiModN-TPU.

Data-parallel: epoch batch stacks are (n_batches, B, ...) — the scan axis
stays unsharded, the batch axis shards over the mesh's ``data`` axis. Metric
grids and the loss are full reductions over the batch, so XLA lowers them to
``psum`` collectives over ICI automatically; parameters/optimizer state stay
replicated and gradients all-reduce — classic DP from annotations alone.

Tensor-parallel (optional): every 2-D dense weight whose output dim divides
the ``model`` axis shards column-wise, with the matching bias sharded too.
For MultiModN's layer widths this is headroom for user-supplied large encoders
(e.g. a ViT replacing the reference's resnet_encoder.py) rather than a win for
the shipped model sizes — documented capability, zero-cost when model axis=1.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Sharding for (n_batches, B, ...) epoch stacks: shard B over data axis.

    The same spec works for any trailing rank because PartitionSpec pads with
    None for unnamed dims... but jax requires the spec rank <= array rank, so
    we shard the first two dims explicitly and let the rest replicate.
    """
    return NamedSharding(mesh, P(None, data_axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh, model_axis: str = "model"):
    """Place a parameter pytree: replicate by default, shard dense layers
    column-wise over ``model_axis`` when the width divides the axis size."""
    if model_axis not in mesh.axis_names:
        return jax.device_put(params, replicate(mesh))
    axis_size = mesh.shape[model_axis]

    def place(leaf):
        arr = np.asarray(leaf) if not hasattr(leaf, "shape") else leaf
        if arr.ndim == 2 and arr.shape[1] % axis_size == 0 and arr.shape[1] >= axis_size:
            spec = P(None, model_axis)
        elif arr.ndim == 1 and arr.shape[0] % axis_size == 0 and arr.shape[0] >= axis_size:
            spec = P(model_axis)
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params)


def shard_opt_state(opt_state, mesh: Mesh, model_axis: str = "model"):
    """Place a RESTORED optimizer state on a (possibly different) mesh —
    the elastic-rescaling path: checkpoints are mesh-free numpy pytrees, so
    a run interrupted on N devices resumes on M by re-placing params
    (model.load_state_dict -> shard_params) and optimizer state (here).
    The torch-Adam state's moment trees mirror the parameter tree and shard
    identically; step counts (and any non-dict optax state) replicate."""
    if isinstance(opt_state, dict) and "m" in opt_state and "v" in opt_state:
        out = {k: jax.device_put(v, replicate(mesh))
               for k, v in opt_state.items() if k not in ("m", "v")}
        out["m"] = shard_params(opt_state["m"], mesh, model_axis)
        out["v"] = shard_params(opt_state["v"], mesh, model_axis)
        return out
    return jax.device_put(opt_state, replicate(mesh))
