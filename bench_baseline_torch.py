"""Measure the PyTorch-reference-semantics baseline for bench.py.

Runs the behavioral torch mirror of the reference training loop
(tests/torch_ref.TorchOracle — per-batch Python loop, per-cell criterion and
confusion counts, exactly the reference's train_epoch structure,
``multimodn/multimodn.py:117-220``) on the MIMIC north-star workload shape
(SURVEY §6: E=4 encoders, widths {10,1024,768,99}, state 50, batch 16) and
caches the epoch wall-clock in bench_baseline.json.

Run once per machine: ``python bench_baseline_torch.py``. bench.py reads the
cached number; if absent, it measures on the fly.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_WIDTHS = [10, 1024, 768, 99]
BENCH_STATE = 50
BENCH_HIDDEN = 32
BENCH_BATCH = 16
BENCH_N = 1024
BASELINE_PATH = os.path.join(REPO, "bench_baseline.json")


def bench_data(n=BENCH_N, seed=0):
    rng = np.random.default_rng(seed)
    data = [rng.normal(size=(n, w)).astype(np.float32) for w in BENCH_WIDTHS]
    latent = rng.normal(size=(n, 8))
    y = (latent @ rng.normal(size=8) > 0).astype(np.int64)[:, None]
    return data, y


def measure_torch_epoch(n_epochs=3, warmup=1) -> dict:
    import torch

    from tests.torch_ref import (
        TorchMIMICMLPEncoder,
        TorchMLPDecoder,
        TorchOracle,
    )

    torch.manual_seed(0)
    data, y = bench_data()
    batches = []
    for i in range(0, BENCH_N, BENCH_BATCH):
        batches.append((
            [torch.from_numpy(d[i:i + BENCH_BATCH]) for d in data],
            torch.from_numpy(y[i:i + BENCH_BATCH]),
        ))
    oracle = TorchOracle(
        BENCH_STATE,
        [TorchMIMICMLPEncoder(BENCH_STATE, w, (BENCH_HIDDEN, BENCH_HIDDEN),
                              dropout=0.0) for w in BENCH_WIDTHS],
        [TorchMLPDecoder(BENCH_STATE, (BENCH_HIDDEN, BENCH_HIDDEN), 2)],
        1.0, 0.0)
    opt = torch.optim.Adam(oracle.parameters(), 1e-3)
    crit = torch.nn.CrossEntropyLoss()

    for _ in range(warmup):
        oracle.run_epoch(batches, crit, opt)
    times = []
    for _ in range(n_epochs):
        t0 = time.perf_counter()
        oracle.run_epoch(batches, crit, opt)
        times.append(time.perf_counter() - t0)
    epoch_s = float(np.median(times))
    return {
        "framework": "torch-cpu (reference semantics)",
        "torch_threads": int(torch.get_num_threads()),
        "workload": {"widths": BENCH_WIDTHS, "state": BENCH_STATE,
                     "hidden": BENCH_HIDDEN, "batch": BENCH_BATCH,
                     "n": BENCH_N},
        "epoch_seconds": epoch_s,
        "samples_per_sec": BENCH_N / epoch_s,
    }


def main():
    result = measure_torch_epoch()
    with open(BASELINE_PATH, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
