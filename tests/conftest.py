"""Test configuration: force an 8-virtual-device CPU platform BEFORE any test
imports jax, so sharding/multi-chip tests run anywhere (SURVEY §7 test
strategy). The axon TPU plugin (when present) overrides JAX_PLATFORMS from its
sitecustomize, so we must also update jax.config after import."""
import os
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"

# Never let pipeline smoke tests append rows to the TRACKED protocol CSVs
# (nips/results/*.csv are published deliverables and the pipelines'
# results files are append-only, reference-style) — redirect all pipeline
# artifact writes to a scratch storage root for the whole suite.
os.environ.setdefault(
    "MULTIMODN_STORAGE",
    tempfile.mkdtemp(prefix="multimodn_test_storage_"))
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
