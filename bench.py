"""Benchmark: MIMIC north-star training throughput on the default platform.

Workload (SURVEY §6 / BASELINE.md): MultiModN with E=4 MIMIC-MLP encoders
over source widths {10, 1024, 768, 99}, state 50, hidden 32, batch 16,
N=1024 synthetic samples — the reference's heaviest configuration shape.

Measures the framework's real training path: the fused multi-epoch ``fit``
program at 100 epochs per device dispatch — exactly the reference MIMIC
protocol's epoch count (mimic_single_task_pipeline.py:64), so the dispatch
amortization in the metric is the amortization a real run gets. Reports
amortized per-epoch wall-clock and samples/sec against the cached
PyTorch-CPU reference-semantics baseline (bench_baseline.json, produced by
bench_baseline_torch.py on this machine).

Prints ONE JSON line:
  {"metric": "mimic_train_samples_per_sec", "value": ..., "unit":
   "samples/s", "vs_baseline": ...}
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Pin the persistent XLA compilation cache to a REPO-LOCAL directory
# (committed to git) so the driver's fresh-environment run hits the warmed
# cache for this exact program instead of paying a 30-500 s remote compile
# (BENCH_r03 paid 55.5 s because ~/.cache did not survive to the driver's
# container; the repo does). multimodn_tpu/__init__ honors this env var.
os.environ.setdefault("MULTIMODN_COMPILE_CACHE",
                      os.path.join(REPO, ".xla_cache"))

from bench_baseline_torch import (  # noqa: E402
    BASELINE_PATH,
    BENCH_BATCH,
    BENCH_HIDDEN,
    BENCH_N,
    BENCH_STATE,
    BENCH_WIDTHS,
    bench_data,
)

EPOCHS_PER_DISPATCH = 100

# TPU v5e (1 chip) dense bf16 peak — the MXU rate XLA's default
# fp32-input matmul precision (single-pass bf16) is bounded by.
PEAK_V5E_BF16_FLOPS = 197e12
# Measured serial-chain matmul ceiling on THIS chip (bench_mfu.json
# matmul_512_serial: back-to-back 512x1024x1024 matmuls, 91.6 TF/s) — the
# realistic upper bound for a dependent-chain workload like this model.
MEASURED_MATMUL_CEILING_FLOPS = 91.6e12


def _register_compile_instrumentation():
    """Count persistent-compilation-cache traffic and split compile-path
    time via jax.monitoring listeners (VERDICT r4 next-#6: the bench must
    MEASURE where warmup seconds go, not assert it). Returns live dicts the
    listeners keep updating; snapshot around the warmup call.

    Best-effort: jax._src.monitoring and the event-name strings are PRIVATE
    jax API — if a jax upgrade moves/renames them, degrade to all-zero
    diagnostics rather than crash (CLAUDE.md invariant: bench.py must keep
    printing its ONE JSON line every round)."""
    counts = {"cache_requests": 0, "cache_hits": 0, "cache_misses": 0}
    durations = {"trace_sec": 0.0, "mlir_lowering_sec": 0.0,
                 "backend_compile_sec": 0.0, "cache_executable_load_sec": 0.0,
                 "compile_time_saved_sec": 0.0}
    try:
        from jax._src import monitoring
    except ImportError:
        return counts, durations
    count_events = {
        "/jax/compilation_cache/compile_requests_use_cache": "cache_requests",
        "/jax/compilation_cache/cache_hits": "cache_hits",
        "/jax/compilation_cache/cache_misses": "cache_misses",
    }
    duration_events = {
        "/jax/core/compile/jaxpr_trace_duration": "trace_sec",
        "/jax/core/compile/jaxpr_to_mlir_module_duration":
            "mlir_lowering_sec",
        "/jax/core/compile/backend_compile_duration": "backend_compile_sec",
        "/jax/compilation_cache/cache_retrieval_time_sec":
            "cache_executable_load_sec",
        "/jax/compilation_cache/compile_time_saved_sec":
            "compile_time_saved_sec",
    }

    def on_event(event, **kw):
        key = count_events.get(event)
        if key is not None:
            counts[key] += 1

    def on_duration(event, duration, **kw):
        key = duration_events.get(event)
        if key is not None:
            durations[key] += duration

    try:
        monitoring.register_event_listener(on_event)
        monitoring.register_event_duration_secs_listener(on_duration)
    except AttributeError:    # private API moved: zeros, not a crash
        pass
    return counts, durations


def _model_flops_per_epoch(model, n_samples: int) -> float:
    """Analytic MODEL matmul FLOPs for one training epoch (the MFU
    numerator — model flops, not XLA's counted flops, per the standard MFU
    convention): every encoder dense runs once per sample, every decoder
    dense runs at each of the E+1 state rows (the training loss/metric
    grid is (E+1) x D, reference multimodn.py:171-192); training costs
    3x the forward matmuls (fwd + dW + dx), 2 FLOPs per MAC."""
    def mlp_macs(dims):
        return sum(int(a) * int(b) for a, b in zip(dims[:-1], dims[1:]))

    enc_macs = sum(mlp_macs(e._dims) for e in model.encoders)
    dec_macs = sum(mlp_macs(d._dims) for d in model.decoders)
    rows = len(model.encoders) + 1
    return 6.0 * (enc_macs + rows * dec_macs) * n_samples


def measure_jax() -> dict:
    import jax

    from multimodn_tpu import Adam, MultiModN
    from multimodn_tpu.data import ArrayLoader, PartitionDataset
    from multimodn_tpu.decoders import MLPDecoder
    from multimodn_tpu.encoders import MIMICMLPEncoder

    data, y = bench_data()
    X = np.concatenate(data, axis=1)
    ds = PartitionDataset(X, y, list(BENCH_WIDTHS))
    loader = ArrayLoader(ds, BENCH_BATCH)

    # scan_unroll=32 measured +9% over the default 8 (1.73 vs 1.9 ms/epoch);
    # its one-time ~31 s compile used to be a driver-run risk under the
    # remote-compile service's variance, but the persistent compilation
    # cache (multimodn_tpu/__init__) makes repeat runs skip the compiler
    # entirely — pre-warmed by any prior bench invocation on this machine.
    model = MultiModN(
        BENCH_STATE,
        [MIMICMLPEncoder(BENCH_STATE, w, (BENCH_HIDDEN, BENCH_HIDDEN),
                         dropout=0.0) for w in BENCH_WIDTHS],
        [MLPDecoder(BENCH_STATE, (BENCH_HIDDEN, BENCH_HIDDEN), 2)],
        1.0, 0.0, scan_unroll=32)
    opt = Adam(1e-3)

    def sync():
        # Force completion via a value transfer: on the axon tunnel platform
        # block_until_ready returns before execution finishes, which silently
        # turns the timing into a dispatch-latency measurement.
        return float(np.asarray(model.params["init_state"]["value"])[0, 0])

    counts, durations = _register_compile_instrumentation()

    def _snapshot():
        return dict(counts), dict(durations)

    def _delta(before):
        c0, d0 = before
        return ({k: counts[k] - c0[k] for k in counts},
                {k: round(durations[k] - d0[k], 3) for k in durations})

    # Separate the device-claim cost from program compilation: the first
    # dispatch of ANY program pays the tunnel claim (seconds to minutes of
    # service-side latency, CLAUDE.md) — a tiny matmul absorbs it so
    # compile_seconds below reflects trace + compile-cache load + first
    # fused dispatch only.
    import jax.numpy as jnp
    pre_claim = _snapshot()
    t0 = time.perf_counter()
    float(np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))[0, 0])
    claim_s = time.perf_counter() - t0
    claim_counts, claim_durations = _delta(pre_claim)

    # Warmup: compile the fused program + one timed-region dry pass.
    pre_warm = _snapshot()
    t0 = time.perf_counter()
    model.fit(loader, opt, "cross_entropy", epochs=EPOCHS_PER_DISPATCH)
    sync()
    compile_s = time.perf_counter() - t0
    warm_counts, warm_durations = _delta(pre_warm)
    # Whatever the listeners did NOT account for is the first fused
    # dispatch itself (execution + tunnel round-trip) plus host-side
    # program construction — the residual the VERDICT asked to pin down.
    accounted = (warm_durations["trace_sec"]
                 + warm_durations["mlir_lowering_sec"]
                 + warm_durations["backend_compile_sec"]
                 + warm_durations["cache_executable_load_sec"])
    warm_durations["first_dispatch_residual_sec"] = round(
        compile_s - accounted, 3)

    # N timed repeats with a min/median/max band: a single sample cannot
    # distinguish a real regression from the ~10% tunnel-latency swing that
    # made r02->r03 read as 229x -> 208x (VERDICT r3 weak-#4).
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        model.fit(loader, opt, "cross_entropy", epochs=EPOCHS_PER_DISPATCH)
        sync()
        times.append(time.perf_counter() - t0)
    per_epoch = float(np.median(times)) / EPOCHS_PER_DISPATCH
    flops_epoch = _model_flops_per_epoch(model, BENCH_N)
    tflops = flops_epoch / per_epoch / 1e12
    return {
        "platform": str(jax.devices()[0]),
        "claim_seconds": claim_s,
        "compile_seconds": compile_s,
        "compile_breakdown": {
            "claim_probe": {"counts": claim_counts,
                            "durations_sec": claim_durations},
            "warmup_fit": {"counts": warm_counts,
                           "durations_sec": warm_durations},
        },
        # MFU in chip terms (VERDICT r4 next-#8). The flagship shape is
        # the REFERENCE's (batch 16, widths 10/1024/768/99, hidden 32):
        # per-batch matmuls of at most 16x1074x32 — latency/HBM-bound by
        # construction, so single-digit MFU is the honest number; the
        # scaled-shape MFU story (70-120 TF/s) is in RESULTS.md.
        "model_flops_per_epoch": flops_epoch,
        "model_tflops_per_sec": round(tflops, 3),
        "mfu_vs_v5e_bf16_peak_pct": round(100 * tflops * 1e12
                                          / PEAK_V5E_BF16_FLOPS, 3),
        "pct_of_measured_matmul_ceiling": round(
            100 * tflops * 1e12 / MEASURED_MATMUL_CEILING_FLOPS, 3),
        "epoch_seconds": per_epoch,
        "epoch_seconds_min": float(np.min(times)) / EPOCHS_PER_DISPATCH,
        "epoch_seconds_max": float(np.max(times)) / EPOCHS_PER_DISPATCH,
        "repeat_seconds": [round(t, 4) for t in times],
        "samples_per_sec": BENCH_N / per_epoch,
        "samples_per_sec_best": BENCH_N * EPOCHS_PER_DISPATCH
        / float(np.min(times)),
        "epochs_per_dispatch": EPOCHS_PER_DISPATCH,
    }


def load_baseline() -> dict:
    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            return json.load(f)
    from bench_baseline_torch import measure_torch_epoch
    result = measure_torch_epoch()
    with open(BASELINE_PATH, "w") as f:
        json.dump(result, f, indent=2)
    return result


def main():
    ours = measure_jax()
    baseline = load_baseline()
    vs = ours["samples_per_sec"] / baseline["samples_per_sec"]
    detail = {
        "jax": ours,
        "torch_baseline": baseline,
    }
    with open(os.path.join(REPO, "bench_detail.json"), "w") as f:
        json.dump(detail, f, indent=2)
    print(json.dumps({
        "metric": "mimic_train_samples_per_sec",
        "value": round(ours["samples_per_sec"], 1),
        "unit": "samples/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
