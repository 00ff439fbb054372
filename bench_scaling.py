"""Scaling benchmark: beyond-reference model sizes on one TPU chip.

The reference's model sizes (state<=50, hidden 32) leave the MXU idle — the
north-star bench is overhead-bound. This script measures a scaled-up
configuration (wide encoders, large state) in bf16 mixed precision across
batch sizes, reporting model TFLOP/s against the measured matmul ceiling
(bench_mfu.py). Secondary benchmark: the driver's tracked metric stays
bench.py.

Measurement notes (see bench_mfu.json and RESULTS.md):
- 100 epochs per dispatch: the axon tunnel costs ~30 ms per dispatch+fetch,
  so short dispatches understate device throughput (round 1 reported
  35 TFLOP/s at 5 epochs/dispatch; 25 epochs/dispatch still hid ~1.2 ms/epoch
  of tunnel cost at b512 — ~18%).
- fp32 is opt-in (--fp32): it measures the same throughput as bf16 at
  batch 512 (62.5 vs 60.6 TFLOP/s — both Adam/pipeline-bound there). The
  round-1 "fp32 compile cliff" was remote-compile-service variance (same
  program: 21.5 s one session, 108 s another, 513 s in round 1); bf16 stays
  the tracked configuration.

Usage: python bench_scaling.py [--fp32]  (prints one JSON line per config)
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

WIDTHS = [1024, 1024, 1024, 1024]
STATE = 256
HIDDEN = 1024
N = 4096
EPOCHS = 100


def model_flops_per_sample() -> float:
    """Forward MACs per sample (backward ~2x)."""
    macs = 0
    for w in WIDTHS:
        macs += (w + STATE) * HIDDEN + HIDDEN * HIDDEN + HIDDEN * STATE
    # decoder on E+1 rows
    macs += (len(WIDTHS) + 1) * (STATE * HIDDEN + HIDDEN * HIDDEN + HIDDEN * 2)
    return 2 * macs * 3  # fwd+bwd ~3x fwd FLOPs


def run(compute_dtype, batch, adam_state_dtype=None):
    import jax  # noqa: F401
    import jax.numpy as jnp

    from multimodn_tpu import Adam, MultiModN
    from multimodn_tpu.data import ArrayLoader, PartitionDataset
    from multimodn_tpu.decoders import MLPDecoder
    from multimodn_tpu.encoders import MIMICMLPEncoder

    rng = np.random.default_rng(0)
    X = rng.normal(size=(N, sum(WIDTHS))).astype(np.float32)
    y = rng.integers(0, 2, size=(N, 1))
    loader = ArrayLoader(PartitionDataset(X, y, WIDTHS), batch)
    model = MultiModN(
        STATE,
        [MIMICMLPEncoder(STATE, w, (HIDDEN, HIDDEN), dropout=0.0)
         for w in WIDTHS],
        [MLPDecoder(STATE, (HIDDEN, HIDDEN), 2)],
        1.0, 0.0, compute_dtype=compute_dtype)
    if adam_state_dtype and adam_state_dtype.startswith("8bit"):
        # Variants: "8bit" (fp8 codes, default mode = the XLA path),
        # "8bit_int8" (int8 codes), plus "_pallas" / "_xla" tokens to
        # force the update path (e.g. "8bit_pallas", "8bit_int8_pallas").
        # The committed bench_adam8bit*.json Pallas rows predate the
        # auto->xla default flip; "_pallas" reproduces them.
        from multimodn_tpu import Adam8bit
        parts = adam_state_dtype.split("_")
        mode = ("pallas" if "pallas" in parts
                else "xla" if "xla" in parts else "auto")
        opt = Adam8bit(1e-3, mode=mode,
                       fmt="int8" if "int8" in parts else "fp8")
    else:
        opt = Adam(1e-3, state_dtype=jnp.bfloat16
                   if adam_state_dtype == "bf16" else None)

    def sync():
        return float(np.asarray(
            model.params["init_state"]["value"])[0, 0])

    t0 = time.perf_counter()
    model.fit(loader, opt, "cross_entropy", epochs=EPOCHS)
    sync()
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        model.fit(loader, opt, "cross_entropy", epochs=EPOCHS)
        sync()
        times.append(time.perf_counter() - t0)
    per_epoch = float(np.median(times)) / EPOCHS
    sps = N / per_epoch
    tflops = sps * model_flops_per_sample() / 1e12
    suffix = ("_adamstate_bf16" if adam_state_dtype == "bf16" else
              f"_adam{adam_state_dtype}" if adam_state_dtype else "")
    return {
        "metric": f"scaling_train_samples_per_sec_"
                  f"{compute_dtype or 'float32'}_b{batch}{suffix}",
        "value": round(sps, 1),
        "unit": "samples/s",
        "epoch_ms": round(per_epoch * 1e3, 2),
        "model_tflops_per_sec": round(tflops, 2),
        "compile_s": round(compile_s, 1),
        "config": {"widths": WIDTHS, "state": STATE, "hidden": HIDDEN,
                   "batch": batch, "n": N, "epochs_per_dispatch": EPOCHS},
    }


def main():
    if "--adam-state" in sys.argv:
        # Same-process A/B (the remote compiler's session variance makes
        # cross-session comparisons meaningless): fp32 vs bf16 Adam moments.
        # Optional batch after the flag (default 512, the Adam-traffic-bound
        # point); the output filename records non-default batches, matching
        # the committed artifacts (bench_adam_state.json @512,
        # bench_adam_state_b2048.json @2048).
        i = sys.argv.index("--adam-state")
        batch = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 \
            and sys.argv[i + 1].isdigit() else 512
        results = [run("bfloat16", batch), run("bfloat16", batch, "bf16")]
        for r in results:
            print(json.dumps(r))
        name = "bench_adam_state.json" if batch == 512 \
            else f"bench_adam_state_b{batch}.json"
        with open(os.path.join(REPO, name), "w") as f:
            json.dump(results, f, indent=2)
        return
    if "--adam8bit" in sys.argv:
        # Same-process three-way A/B: fp32 moments vs bf16 moments vs
        # 8-bit quantized moments (ops/fused_adam.py, default update path).
        # Default batch 512 = the measured update-bound point (RESULTS.md
        # roofline); pass a batch to probe the compute-bound regime.
        i = sys.argv.index("--adam8bit")
        batch = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 \
            and sys.argv[i + 1].isdigit() else 512
        results = [run("bfloat16", batch), run("bfloat16", batch, "bf16"),
                   run("bfloat16", batch, "8bit")]
        for r in results:
            print(json.dumps(r))
        name = "bench_adam8bit.json" if batch == 512 \
            else f"bench_adam8bit_b{batch}.json"
        with open(os.path.join(REPO, name), "w") as f:
            json.dump(results, f, indent=2)
        return
    results = [run("bfloat16", 512), run("bfloat16", 1024),
               run("bfloat16", 2048)]
    if "--fp32" in sys.argv:
        results.append(run(None, 512))
    for r in results:
        print(json.dumps(r))
    with open(os.path.join(REPO, "bench_scaling.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
