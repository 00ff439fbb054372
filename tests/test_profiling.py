"""Profiling utilities: trace emission, annotations, epoch timing."""
import os

import numpy as np

import jax.numpy as jnp

from multimodn_tpu.utils.profiling import EpochTimer, annotate, sync, trace


def test_epoch_timer_counts_and_syncs():
    logs = []
    x = jnp.ones((8, 8))
    timer = EpochTimer(logger=logs.append, log_every=2, sync_tree=x)
    for _ in range(4):
        with timer.epoch():
            x = x * 1.0
    assert len(timer.times) == 4
    assert timer.last_s >= 0 and timer.mean_s >= 0
    assert len(logs) == 2  # every 2 epochs


def test_trace_writes_profile(tmp_path):
    logdir = str(tmp_path / "trace")
    with trace(logdir):
        with annotate("tiny-matmul"):
            y = jnp.ones((16, 16)) @ jnp.ones((16, 16))
            sync(y)
    # jax writes plugins/profile/<ts>/*.trace.json.gz (or .xplane.pb)
    found = []
    for root, _dirs, files in os.walk(logdir):
        found += files
    assert found, "profiler trace produced no files"
