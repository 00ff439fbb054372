"""Tracing / profiling hooks.

The reference has no instrumentation beyond optional stdout batch logging and
tqdm bars (SURVEY §5). TPU-native equivalents:

- ``trace(logdir)``: context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of everything dispatched inside (XLA ops, pallas
  kernels, transfers).
- ``annotate(name)``: TraceAnnotation for named host-side regions.
- ``EpochTimer``: lightweight wall-clock epoch logger with a synchronization
  fetch (block_until_ready is unreliable on tunneled platforms; see
  bench.py), mirroring the reference's ``log_interval`` logging cadence.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace into ``logdir`` (TensorBoard format)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region annotation visible in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


def sync(tree) -> None:
    """Force completion of all computations producing ``tree`` by fetching a
    scalar from each leaf (robust on platforms where block_until_ready
    returns early)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        # Slice ON DEVICE first: np.asarray(leaf) would ship the WHOLE
        # buffer through the tunnel (~30-40 MB/s) and time the transfer,
        # not the compute. ravel()[:1] executes device-side; one element
        # crosses the wire (same trick as bench.py's sync()).
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[:1])
        else:
            np.asarray(leaf)


class EpochTimer:
    """Wall-clock timing for epochs with optional logging.

    Usage::
        timer = EpochTimer(logger=print, log_every=10)
        for epoch in range(n):
            with timer.epoch():
                model.train_epoch(...)
            # timer.last_s, timer.mean_s available
    """

    def __init__(self, logger: Optional[Callable] = None, log_every: int = 1,
                 sync_tree=None):
        self.logger = logger
        self.log_every = log_every
        self.sync_tree = sync_tree
        self.times = []

    @contextlib.contextmanager
    def epoch(self):
        t0 = time.perf_counter()
        yield
        if self.sync_tree is not None:
            sync(self.sync_tree)
        self.times.append(time.perf_counter() - t0)
        if self.logger and len(self.times) % self.log_every == 0:
            self.logger(
                f"epoch {len(self.times)}: {self.last_s * 1e3:.2f} ms "
                f"(mean {self.mean_s * 1e3:.2f} ms)")

    @property
    def last_s(self) -> float:
        return self.times[-1] if self.times else 0.0

    @property
    def mean_s(self) -> float:
        return float(np.mean(self.times)) if self.times else 0.0
