"""Device mesh helpers.

The reference has no distributed backend at all (SURVEY §2.4: no
torch.distributed anywhere); parallelism here is new, TPU-native capability:

- ``data`` axis: batch-dimension sharding (DP). The jitted epoch programs take
  batch-sharded inputs and XLA emits the gradient all-reduce over ICI from the
  sharding annotations alone.
- ``model`` axis: optional tensor-parallel axis for wide encoder layers;
  composes through the same programs via parameter shardings
  (see ``sharding.shard_params``).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Build a Mesh over available devices.

    ``make_mesh()`` -> all devices on one ``data`` axis.
    ``make_mesh((4, 2), ("data", "model"))`` -> 4-way DP x 2-way TP.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"Mesh shape {shape} needs {n} devices, "
                         f"have {len(devices)}")
    dev_array = np.array(devices[:n]).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))
