#!/usr/bin/env python
"""Round-4 consolidated TPU session: ALL device work in ONE process
(CLAUDE.md: the tunnel claim can cost 10-20 min; pay it once).

Stages (sequential):
  1. tiny-matmul probe (claim sanity)
  2. full MNAR protocol, nan_skip='sample' + presence_penalty (the round-4
     mitigation variant) -> third summary CSV + markdown table
  3. bench.py measurement (writes bench_detail.json; the repo-local
     .xla_cache gets warmed for the driver's run)
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
os.environ.setdefault("MULTIMODN_COMPILE_CACHE",
                      os.path.join(REPO, ".xla_cache"))

import numpy as np


def stage1_probe():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    x = jnp.ones((256, 256))
    v = float(jnp.sum(x @ x))
    print(f"[probe] {jax.devices()[0]} matmul={v:.0f} "
          f"claim+first-dispatch {time.time() - t0:.1f}s", flush=True)


def stage2_mnar_pp(pp: float = 25.0):
    from nips.run_mnar_protocol import main as protocol_main

    t0 = time.time()
    protocol_main(300, 100, 5, "sample", pp)
    print(f"[mnar pp={pp:g}] total {time.time() - t0:.1f}s", flush=True)


def stage3_bench():
    import bench

    bench.main()
    with open(os.path.join(REPO, "bench_detail.json")) as f:
        print("[bench detail]", json.dumps(json.load(f)["jax"], indent=1),
              flush=True)


if __name__ == "__main__":
    stages = sys.argv[1:] or ["probe", "mnar", "bench"]
    if "probe" in stages:
        stage1_probe()
    if "mnar" in stages:
        stage2_mnar_pp()
    if "bench" in stages:
        stage3_bench()
    print("ROUND4 TPU SESSION DONE", flush=True)
