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
