"""Benchmark: seed-sweep axis utilization (VERDICT r2 next-#4).

Measures ``experiments.sweep_fit_best`` — N seed-replicates of the MIMIC
north-star fit_best workload in ONE dispatch (data broadcast, params/opt
state batched over seeds) — against N sequential ``fit_best`` dispatches,
on whatever platform is default (TPU under axon).

The point: the per-seed models are tiny (state 50, hidden 32), so a single
seed leaves the MXU mostly idle; batching the seed axis turns the sweep
into fold-batched matmuls. Reported as seeds-for-the-price-of-one:
  speedup(N) = N * t_sequential(1) / t_sweep(N).

Writes bench_sweep.json and prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from bench_baseline_torch import (  # noqa: E402
    BENCH_BATCH,
    BENCH_HIDDEN,
    BENCH_STATE,
    BENCH_WIDTHS,
    bench_data,
)

EPOCHS = 100
SWEEP_SIZES = (4, 8, 16)


def main():
    import jax

    from multimodn_tpu import Adam, MultiModN
    from multimodn_tpu.data import ArrayLoader, PartitionDataset
    from multimodn_tpu.data.dataset import Subset
    from multimodn_tpu.decoders import MLPDecoder
    from multimodn_tpu.encoders import MIMICMLPEncoder
    from multimodn_tpu.experiments import sweep_fit_best

    data, y = bench_data()
    X = np.concatenate(data, axis=1)
    ds = PartitionDataset(X, y, list(BENCH_WIDTHS))
    n = len(ds)
    n_tr = int(n * 0.8)
    tr = ArrayLoader(Subset(ds, list(range(n_tr))), BENCH_BATCH)
    va = ArrayLoader(Subset(ds, list(range(n_tr, n))), BENCH_BATCH)

    def factory(seed):
        return MultiModN(
            BENCH_STATE,
            [MIMICMLPEncoder(BENCH_STATE, w, (BENCH_HIDDEN, BENCH_HIDDEN),
                             dropout=0.0) for w in BENCH_WIDTHS],
            [MLPDecoder(BENCH_STATE, (BENCH_HIDDEN, BENCH_HIDDEN), 2)],
            1.0, 0.0, seed=seed, scan_unroll=32)

    def sync(model):
        return float(np.asarray(model.params["init_state"]["value"])[0, 0])

    opt = Adam(1e-3)

    # Sequential baseline: one fit_best dispatch (warm + 3 timed).
    m = factory(0)
    m.fit_best(tr, opt, "cross_entropy", epochs=EPOCHS, val_loader=va)
    sync(m)
    seq_times = []
    for _ in range(3):
        m2 = factory(0)
        opt2 = Adam(1e-3)
        t0 = time.perf_counter()
        m2.fit_best(tr, opt2, "cross_entropy", epochs=EPOCHS, val_loader=va)
        sync(m2)
        seq_times.append(time.perf_counter() - t0)
    t_seq = float(np.median(seq_times))

    # Warm-sequential arm: ONE model re-used across seeds (per-seed
    # load_state_dict resets params+opt state; the fused program cache
    # hits, so no per-seed retrace). This isolates DEVICE-time batching
    # gains from the fresh-model trace amortization the plain sequential
    # arm also includes.
    m_warm = factory(0)
    opt_warm = Adam(1e-3)
    m_warm.fit_best(tr, opt_warm, "cross_entropy", epochs=EPOCHS,
                    val_loader=va)
    sync(m_warm)
    warm_inits = [factory(s).state_dict() for s in range(max(SWEEP_SIZES))]

    def warm_seq(S):
        t0 = time.perf_counter()
        for k in range(S):
            m_warm.load_state_dict(warm_inits[k])
            m_warm.fit_best(tr, opt_warm, "cross_entropy", epochs=EPOCHS,
                            val_loader=va)
        sync(m_warm)
        return time.perf_counter() - t0

    warm_seq(2)  # dry
    t_warm_per_seed = warm_seq(8) / 8.0

    rows = []
    for S in SWEEP_SIZES:
        seeds = list(range(S))
        sweep_fit_best(factory, tr, va, Adam(1e-3), "cross_entropy",
                       epochs=EPOCHS, seeds=seeds)          # warm compile
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = sweep_fit_best(factory, tr, va, Adam(1e-3),
                                 "cross_entropy", epochs=EPOCHS, seeds=seeds)
            sync(res[0]["model"])
            times.append(time.perf_counter() - t0)
        t_sweep = float(np.median(times))
        rows.append({
            "seeds": S,
            "t_sweep_s": t_sweep,
            "t_sequential_fresh_s": t_seq * S,
            "t_sequential_warm_s": t_warm_per_seed * S,
            "speedup_vs_fresh_models": t_seq * S / t_sweep,
            "speedup_vs_warm_sequential": t_warm_per_seed * S / t_sweep,
            "per_seed_ms": 1000 * t_sweep / S,
        })
        print(f"S={S}: sweep {t_sweep:.2f}s vs fresh-seq {t_seq * S:.2f}s "
              f"({t_seq * S / t_sweep:.1f}x) vs warm-seq "
              f"{t_warm_per_seed * S:.2f}s "
              f"({t_warm_per_seed * S / t_sweep:.1f}x)", flush=True)

    detail = {
        "platform": str(jax.devices()[0]),
        "epochs": EPOCHS,
        "t_fit_best_fresh_model_s": t_seq,
        "t_fit_best_warm_per_seed_s": t_warm_per_seed,
        "sweeps": rows,
    }
    with open(os.path.join(REPO, "bench_sweep.json"), "w") as f:
        json.dump(detail, f, indent=2)
    best = max(rows, key=lambda r: r["speedup_vs_warm_sequential"])
    print(json.dumps({
        "metric": "seed_sweep_speedup",
        "value": round(best["speedup_vs_warm_sequential"], 2),
        "unit": f"x vs warm sequential at {best['seeds']} seeds",
        "vs_baseline": round(best["speedup_vs_warm_sequential"], 2),
    }))


if __name__ == "__main__":
    main()
