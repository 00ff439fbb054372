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


# ---------------------------------------------------------------------------
# Quick tier (VERDICT r4 next-#5): `pytest -m quick` is the per-change gate —
# one fast representative per subsystem, <5 min total on the 1-core dev box.
# The full suite stays the round-validation gate. Membership is centralized
# here (names, not decorators) so the tier is auditable in one place; tests
# may ALSO self-mark with @pytest.mark.quick (disk/streamed-experiments do).
# ---------------------------------------------------------------------------
QUICK_TESTS = {
    # core chain / fusion
    "test_scan_matches_unrolled[sample]",
    "test_repeated_sequence_on_scan_stacked_storage",
    # independent torch-mirror parity + reference-oracle parity smoke
    "test_single_encoder_training_trajectory_matches_torch",
    "test_titanic_mlp_config_matches_reference",
    # fused fit / fit_best / early stop
    "test_fit_matches_looped_epochs",
    "test_plateau_stops_early",
    # experiment programs (kfold; masked shuffle corner)
    "test_kfold_vmap_matches_sequential",
    "test_kfold_shuffle_unequal_folds",
    # explicit shard_map engine + NaN mesh + presence knobs
    "test_shard_map_epoch_matches_auto_sharded_epoch",
    "test_shard_map_engine_batch_skip_matches_auto",
    "test_presence_penalty_noop_on_complete_data",
    # streaming (host + torch); disk + streamed-experiments self-mark
    "test_streaming_epoch_matches_array_loader",
    "test_torch_streaming_loader_matches_array_loader",
    # metrics / data plumbing (cheap, pure)
    "test_auroc_matches_sklearn",
    "test_confusion_counts",
    "test_random_split_matches_reference_algorithm",
    # checkpoint / resume
    "test_checkpoint_roundtrip",
}


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        if item.name in QUICK_TESTS:
            item.add_marker(pytest.mark.quick)
    # A rename/reparametrization must not silently shrink the per-change
    # gate: on any full-directory collection (no explicit file/node args),
    # every QUICK_TESTS name must still exist. Runs before -m/-k
    # deselection, so `pytest -m quick` checks the full collection too.
    if not any(".py" in a or "::" in a for a in config.args):
        missing = QUICK_TESTS - {item.name for item in items}
        assert not missing, (
            f"QUICK_TESTS entries no longer collect (renamed or "
            f"reparametrized?): {sorted(missing)} — update "
            f"tests/conftest.py::QUICK_TESTS so the quick gate keeps "
            f"covering those subsystems")
