"""Micro-benchmark: explicit-collective (shard_map) epoch program vs XLA
auto-sharding, on whatever mesh is available.

On the 8-virtual-CPU-device mesh this validates that the two engines compile
to comparable programs; real speed conclusions need a multi-chip TPU slice
(single-chip meshes have no collectives to place). Run:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    MULTIMODN_PLATFORM=cpu python examples/shard_map_epoch_bench.py
"""
import time

import numpy as np

import multimodn_tpu  # noqa: F401  (honors MULTIMODN_PLATFORM)
import jax

from multimodn_tpu import Adam, MultiModN
from multimodn_tpu.data import ArrayLoader, PartitionDataset
from multimodn_tpu.decoders import LogisticDecoder
from multimodn_tpu.encoders import MIMICMLPEncoder
from multimodn_tpu.parallel import make_mesh


def main(epochs=30, n=1024, widths=(6, 256, 128, 99), state=32):
    rng = np.random.default_rng(0)
    X = rng.normal(size=(n, sum(widths))).astype(np.float32)
    y = (X[:, :4].sum(axis=1, keepdims=True) > 0).astype(np.int64)
    ds = PartitionDataset(X, y, list(widths))
    mesh = make_mesh(axis_names=("data",))

    results = {}
    for engine in ("auto", "shard_map"):
        model = MultiModN(
            state,
            [MIMICMLPEncoder(state, w, (32, 32), dropout=0.0)
             for w in widths],
            [LogisticDecoder(state)], 1.0, 0.0, mesh=mesh, dp_engine=engine)
        loader = ArrayLoader(ds, 128)
        opt = Adam(1e-3)
        model.train_epoch(loader, opt, "cross_entropy")  # compile
        jax.block_until_ready(model.params)
        t0 = time.perf_counter()
        for _ in range(epochs):
            model.train_epoch(loader, opt, "cross_entropy")
        jax.block_until_ready(model.params)
        dt = (time.perf_counter() - t0) / epochs
        results[engine] = dt
        print(f"{engine:>10}: {dt * 1e3:.2f} ms/epoch")
    print(f"shard_map / auto = {results['shard_map'] / results['auto']:.3f}")


if __name__ == "__main__":
    main()
