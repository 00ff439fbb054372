"""MFU investigation at the bench_scaling config (VERDICT r1 next #2).

Measures, on the real TPU chip:
  1. dispatch latency — the tunnel's per-dispatch+fetch round trip (the
     reason every number here amortizes many iterations per dispatch).
  2. matmul ceilings — achievable TFLOP/s for the config's dominant matmul
     shapes, serial and independent (the roofline numerator).
  3. grad-only (SGD) training — isolates the Adam HBM-traffic cost.
  4. full Adam training at batch 512 (the bench_scaling config) and 2048
     (4x fewer optimizer updates/epoch).

Writes bench_mfu.json. One process, sequential (the tunnel is single-client).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402

WIDTHS = [1024, 1024, 1024, 1024]
STATE = 256
HIDDEN = 1024
N = 4096
EPOCHS = 25


def fetch(x):
    return float(np.asarray(x).ravel()[0])


def probe():
    x = jnp.ones((8, 128), jnp.bfloat16)
    fetch(jnp.dot(x, x.T, preferred_element_type=jnp.float32))
    print("probe OK", flush=True)


def model_flops_per_sample() -> float:
    macs = 0
    for w in WIDTHS:
        macs += (w + STATE) * HIDDEN + HIDDEN * HIDDEN + HIDDEN * STATE
    macs += (len(WIDTHS) + 1) * (STATE * HIDDEN + HIDDEN * HIDDEN + HIDDEN * 2)
    return 2 * macs * 3


def dispatch_latency():
    """Round-trip cost of one tiny dispatch+fetch through the tunnel."""
    @jax.jit
    def tiny(x):
        return jnp.sum(x)
    x = jnp.ones((8, 128), jnp.bfloat16)
    fetch(tiny(x))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        fetch(tiny(x))
        times.append(time.perf_counter() - t0)
    return {"ms": round(float(np.median(times)) * 1e3, 2)}


def matmul_ceiling(batch=512, d=1024, iters=5000, serial=True):
    """Achievable TFLOP/s for (batch,d)@(d,d) bf16 matmuls: ``serial`` chains
    each matmul on the previous (latency-exposed); otherwise steps are
    independent (pipelineable). Scalar fetch; iters amortize dispatch."""
    w = (jnp.ones((d, d), jnp.bfloat16) * 0.001)
    c0 = jnp.ones((batch, d), jnp.bfloat16)

    @jax.jit
    def loop(c, w):
        if serial:
            def body(c, _):
                return jnp.dot(c, w, preferred_element_type=jnp.bfloat16), ()
            c, _ = jax.lax.scan(body, c, None, length=iters)
            return jnp.sum(c.astype(jnp.float32))
        else:
            def body(acc, i):
                y = jnp.dot(c0 + i.astype(jnp.bfloat16) * 0,
                            w, preferred_element_type=jnp.bfloat16)
                return acc + jnp.sum(y.astype(jnp.float32)), ()
            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(iters))
            return acc

    fetch(loop(c0, w))          # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        fetch(loop(c0, w))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    tflops = 2 * batch * d * d * iters / dt / 1e12
    return {"batch": batch, "d": d, "iters": iters, "serial": serial,
            "ms": round(dt * 1e3, 2), "tflops": round(tflops, 1)}


def build(batch, compute_dtype="bfloat16"):
    from multimodn_tpu import MultiModN
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
    return model, loader


def time_fit(model, loader, opt, epochs=EPOCHS, reps=3):
    t0 = time.perf_counter()
    model.fit(loader, opt, "cross_entropy", epochs=epochs)
    fetch(model.params["init_state"]["value"])
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        model.fit(loader, opt, "cross_entropy", epochs=epochs)
        fetch(model.params["init_state"]["value"])
        times.append(time.perf_counter() - t0)
    per_epoch = float(np.median(times)) / epochs
    sps = N / per_epoch
    return {"epoch_ms": round(per_epoch * 1e3, 2),
            "samples_per_sec": round(sps, 1),
            "tflops": round(sps * model_flops_per_sample() / 1e12, 2),
            "compile_s": round(compile_s, 1)}


def main():
    from multimodn_tpu import Adam
    from multimodn_tpu.optim import SGD

    print("devices:", jax.devices(), flush=True)
    probe()
    out = {}

    out["dispatch_latency"] = dispatch_latency()
    print("latency:", out["dispatch_latency"], flush=True)
    out["matmul_512_serial"] = matmul_ceiling(512, 1024, serial=True)
    print("matmul 512 serial:", out["matmul_512_serial"], flush=True)
    out["matmul_512_indep"] = matmul_ceiling(512, 1024, serial=False)
    print("matmul 512 indep:", out["matmul_512_indep"], flush=True)
    out["matmul_2048_indep"] = matmul_ceiling(2048, 1024, serial=False)
    print("matmul 2048 indep:", out["matmul_2048_indep"], flush=True)

    m, l = build(512)
    out["sgd_b512"] = time_fit(m, l, SGD(1e-3))
    print("sgd 512:", out["sgd_b512"], flush=True)

    m, l = build(512)
    out["adam_b512"] = time_fit(m, l, Adam(1e-3))
    print("adam 512:", out["adam_b512"], flush=True)

    m, l = build(2048)
    out["adam_b2048"] = time_fit(m, l, Adam(1e-3))
    print("adam 2048:", out["adam_b2048"], flush=True)

    with open(os.path.join(REPO, "bench_mfu.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
