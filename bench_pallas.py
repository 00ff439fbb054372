"""Pallas fused-chain kernel vs XLA, measured on the real TPU chip
(VERDICT r1 next #3).

Two configs:
  - "shipped": the MIMIC pipeline widths (10/1024/768/99, state 50,
    hidden (32,32)) at batch 1024 (batch 16 is dispatch-latency noise).
  - "scaled": the bench_scaling widths (4x1024, state 256, hidden 1024)
    at batch 512.

Per config: forward-only (pallas kernel vs XLA) and train-step
(value_and_grad through the custom-VJP kernel path vs plain XLA), each
amortized over K iterations inside one jitted lax.scan dispatch (the tunnel
costs ~30 ms per dispatch). Writes bench_pallas.json.
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

from multimodn_tpu import MultiModN                          # noqa: E402
from multimodn_tpu.decoders import MLPDecoder                # noqa: E402
from multimodn_tpu.encoders import MIMICMLPEncoder           # noqa: E402
from multimodn_tpu.ops.fused_chain import (                  # noqa: E402
    make_fused_chain_forward,
    make_fused_chain_vjp,
    make_xla_chain_forward,
)

CONFIGS = {
    "shipped": dict(widths=[10, 1024, 768, 99], state=50, hidden=(32, 32),
                    batch=1024, iters=200),
    "scaled": dict(widths=[1024] * 4, state=256, hidden=(1024, 1024),
                   batch=512, iters=200),
}


def fetch(x):
    return float(np.asarray(x).ravel()[0])


def build(cfg):
    model = MultiModN(
        cfg["state"],
        [MIMICMLPEncoder(cfg["state"], w, cfg["hidden"], dropout=0.0)
         for w in cfg["widths"]],
        [MLPDecoder(cfg["state"], cfg["hidden"], 2)], 1.0, 0.0)
    rng = np.random.default_rng(0)
    data = tuple(jnp.asarray(rng.normal(size=(cfg["batch"], w))
                             .astype(np.float32)) for w in cfg["widths"])
    valid = jnp.ones((cfg["batch"], len(cfg["widths"])), jnp.float32)
    init_row = model.init_state.apply(model.params["init_state"], 1, 0)[0]
    return model, data, valid, init_row


def timeit(jitted, args, reps=3):
    fetch(jitted(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(jitted(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def bench_config(name, cfg):
    model, data, valid, init_row = build(cfg)
    iters = cfg["iters"]
    pallas_fwd = make_fused_chain_forward(model.encoders, model.decoders,
                                          cfg["state"])
    xla_fwd = make_xla_chain_forward(model.encoders, model.decoders,
                                     cfg["state"])
    vjp_fwd = make_fused_chain_vjp(model.encoders, model.decoders,
                                   cfg["state"])

    def loop_fwd(fwd):
        @jax.jit
        def run(params, data, valid, init_row):
            def body(acc, i):
                # acc*1e-30 is a REAL loop-carried dependence: XLA cannot
                # const-fold it (unlike acc*0) or hoist the forward out of
                # the scan.
                states, outs = fwd(params, data, valid,
                                   init_row + acc * 1e-30)
                return acc + jnp.sum(states[-1]) * 1e-6, ()
            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(iters))
            return acc
        return run

    def loop_train(fwd):
        def loss_fn(params, data, valid, init_row):
            states, outs = fwd(params, data, valid, init_row)
            return jnp.mean(states ** 2) + sum(jnp.mean(o) for o in outs)

        @jax.jit
        def run(params, data, valid, init_row):
            def body(acc, i):
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, data, valid, init_row + acc * 1e-30)
                leaves = jax.tree_util.tree_leaves(grads)
                gsum = sum(jnp.sum(l) for l in leaves)
                return acc + loss + gsum * 1e-30, ()
            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(iters))
            return acc
        return run

    args = (model.params, data, valid, init_row)
    out = {"config": {k: list(v) if isinstance(v, (tuple, list)) else v
                      for k, v in cfg.items()}}
    out["fwd_xla_ms"] = round(timeit(loop_fwd(xla_fwd), args) / iters * 1e3, 3)
    print(name, "fwd xla:", out["fwd_xla_ms"], "ms", flush=True)
    out["fwd_pallas_ms"] = round(
        timeit(loop_fwd(pallas_fwd), args) / iters * 1e3, 3)
    print(name, "fwd pallas:", out["fwd_pallas_ms"], "ms", flush=True)
    out["train_xla_ms"] = round(
        timeit(loop_train(xla_fwd), args) / iters * 1e3, 3)
    print(name, "train xla:", out["train_xla_ms"], "ms", flush=True)
    out["train_pallas_vjp_ms"] = round(
        timeit(loop_train(vjp_fwd), args) / iters * 1e3, 3)
    print(name, "train pallas+vjp:", out["train_pallas_vjp_ms"], "ms",
          flush=True)
    out["fwd_ratio_pallas_over_xla"] = round(
        out["fwd_pallas_ms"] / out["fwd_xla_ms"], 3)
    out["train_ratio_pallas_over_xla"] = round(
        out["train_pallas_vjp_ms"] / out["train_xla_ms"], 3)
    return out


def main():
    results = {name: bench_config(name, cfg) for name, cfg in CONFIGS.items()}
    with open(os.path.join(REPO, "bench_pallas.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
