"""MultiModN-TPU: a TPU-native JAX framework for sequential multimodal fusion.

Re-implements the capabilities of EPFLiGHT/MultiModN (NeurIPS 2023,
reference: /root/reference) as an idiomatic JAX/XLA framework:

- The sequential fusion core (reference ``multimodn/multimodn.py``) becomes a
  single jitted train step: the encoder chain threads a shared state vector,
  every intermediate state is stacked into an ``(E+1, B, S)`` tensor, and all
  decoder heads evaluate the full stack in one batched matmul.
- NaN-missingness skipping (reference ``multimodn.py:167-169``) becomes
  explicit validity masks with ``jnp.where`` state passthrough — per-sample by
  default (a strict generalization), with a batch-granular parity mode.
- Epochs run as ``lax.scan`` over on-device batches: one device dispatch per
  epoch instead of per batch.
- Data parallelism is a ``jax.sharding`` mesh axis; metric grids reduce with
  XLA collectives emitted from sharding annotations.
"""

import os as _os

# MULTIMODN_PLATFORM=cpu|tpu forces the JAX platform at import. Needed
# because some TPU plugins (axon) override JAX_PLATFORMS from sitecustomize,
# making the standard env var ineffective.
_platform = _os.environ.get("MULTIMODN_PLATFORM")
if _platform:
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _platform)
    except Exception:
        pass

# Persistent XLA compilation cache, ON by default for accelerator
# platforms. Through a remote-compile TPU tunnel the same program has
# measured 21-513 s to compile depending on service state (CLAUDE.md); the
# on-disk cache removes that entirely on any repeat run (measured: 60.5 s
# first process -> 0.25 s second). Entries are keyed by HLO + compile
# options + backend version. NOT enabled for CPU-pinned processes: XLA:CPU
# caches AOT machine code keyed on compile-time-detected CPU features, and
# feature detection has been observed to differ between processes on this
# same host ("+prefer-no-gather ... could lead to SIGILL" loader warnings)
# — CPU compiles are fast anyway. MULTIMODN_COMPILE_CACHE=0 disables,
# =<path> overrides the location (and forces it on regardless of platform).
_cache = _os.environ.get("MULTIMODN_COMPILE_CACHE", "")
if _cache != "0":
    import jax as _jax

    def _cpu_pinned() -> bool:
        if (_platform or "").lower() == "cpu":
            return True
        if _os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
            return True
        try:   # e.g. dryrun_multichip sets jax.config directly
            return (_jax.config.jax_platforms or "").lower() == "cpu"
        except Exception:
            return False

    if _cache or not _cpu_pinned():
        try:
            _path = _cache or _os.path.join(
                _os.path.expanduser("~"), ".cache", "multimodn_tpu", "xla")
            _os.makedirs(_path, exist_ok=True)
            _jax.config.update("jax_compilation_cache_dir", _path)
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass

from multimodn_tpu.model import MultiModN
from multimodn_tpu.core.state import InitState, TrainableInitState, StaticInitState
from multimodn_tpu.core.history import MultiModNHistory
from multimodn_tpu.core.losses import cross_entropy_loss, CrossEntropyLoss
from multimodn_tpu.core.metrics import get_performance_metrics, performance_metrics
from multimodn_tpu.optim import Adam, Adam8bit, SGD, AdamW
from multimodn_tpu.serving import (
    InferenceSession,
    export_compiled,
    export_model,
    load_compiled,
    load_model,
)

__version__ = "0.1.0"

__all__ = [
    "MultiModN",
    "InitState",
    "TrainableInitState",
    "StaticInitState",
    "MultiModNHistory",
    "cross_entropy_loss",
    "CrossEntropyLoss",
    "get_performance_metrics",
    "performance_metrics",
    "Adam",
    "Adam8bit",
    "SGD",
    "AdamW",
    "InferenceSession",
    "export_compiled",
    "export_model",
    "load_compiled",
    "load_model",
]
