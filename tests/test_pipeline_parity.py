"""End-to-end parity: the reference's ACTUAL pipeline scripts vs the repo's.

The strongest parity loop (VERDICT r2 next-#1): for each Titanic pipeline,
run the reference script's own ``main()`` (``/root/reference/pipelines/
titanic/*_pipeline.py`` — splits, DataLoader batch geometry, epoch loop,
history writing, results CSV, all the reference's code, executed via
``tests/ref_pipeline_harness.py``) and the repo pipeline at the same seed on
the same CSV with transplanted initial weights, and assert the produced
history trajectories and results-CSV artifacts agree.

Tolerances: losses/state-change are fp32-accumulation-limited (same bounds
family as tests/test_parity.py); count-derived metrics (accuracy/sensitivity/
specificity) additionally admit a few argmax flips of borderline samples
under 1e-6-level probability drift, so they get an absolute tolerance of a
couple of samples' worth.
"""
from __future__ import annotations

import dataclasses
import os

import numpy as np
import pandas as pd
import pytest

from tests.ref_pipeline_harness import run_reference_pipeline

REPO_SAVE_FLAGS = ["-m", "false", "-y", "false", "-p", "false", "-r", "false"]
REF_SAVE_FLAGS = ["-m", "false", "-y", "false", "-p", "false", "-r", "true"]

# (repo pipeline module, cfg overrides for reference-exact mode, epochs,
#  count-metric atol)
PIPELINES = [
    ("titanic_mlp_pipeline", {}, 4, 5e-3),
    ("titanic_partitioned_pipeline", {}, 3, 5e-3),
    ("titanic_featurewise_pipeline", {}, 3, 5e-3),
    ("titanic_lstm_pipeline", {}, 3, 5e-3),
    ("titanic_rnn_pipeline", {}, 3, 5e-3),
]

# Reference missingness mode: batch_size=1 + batch-granular NaN skip
# (quirk #2, titanic_missingness_pipeline.py:35).
MISSINGNESS_OVERRIDES = dict(batch_size=1, nan_skip="batch")


@pytest.fixture(scope="module")
def titanic_csv(tmp_path_factory):
    """One synthetic Titanic CSV served to BOTH implementations."""
    from multimodn_tpu.data.synth import synthetic_titanic
    path = tmp_path_factory.mktemp("titanic_data") / "titanic.csv"
    synthetic_titanic().to_csv(path, index=False)
    return str(path)


def _assert_history_close(repo_h, ref_h, counts_atol):
    for field in ("loss",):
        ours, theirs = getattr(repo_h, field), getattr(ref_h, field)
        assert set(ours) == set(theirs), (field, set(ours), set(theirs))
        for tag in theirs:
            np.testing.assert_allclose(
                np.asarray(ours[tag], np.float64),
                np.asarray(theirs[tag], np.float64),
                rtol=3e-3, atol=1e-5, err_msg=f"{field}[{tag}]")
    for field in ("accuracy", "sensitivity", "specificity",
                  "balanced_accuracy"):
        ours, theirs = getattr(repo_h, field), getattr(ref_h, field)
        assert set(ours) == set(theirs), (field, set(ours), set(theirs))
        for tag in theirs:
            np.testing.assert_allclose(
                np.asarray(ours[tag], np.float64),
                np.asarray(theirs[tag], np.float64),
                rtol=0, atol=counts_atol, err_msg=f"{field}[{tag}]")
    np.testing.assert_allclose(
        np.asarray(repo_h.state_change_loss, np.float64),
        np.asarray(ref_h.state_change_loss, np.float64),
        rtol=3e-3, atol=1e-5, err_msg="state_change_loss")


def _assert_results_csv_close(repo_csv, ref_csv, counts_atol):
    ours, theirs = pd.read_csv(repo_csv), pd.read_csv(ref_csv)
    assert list(ours.columns) == list(theirs.columns)
    assert len(ours) == len(theirs)
    for col in theirs.columns:
        if theirs[col].dtype.kind in "fc":
            np.testing.assert_allclose(
                ours[col].to_numpy(np.float64),
                theirs[col].to_numpy(np.float64),
                rtol=3e-3, atol=counts_atol, err_msg=f"results[{col}]")
        else:
            assert list(ours[col]) == list(theirs[col]), col


@pytest.mark.parametrize("name,overrides,epochs,counts_atol",
                         PIPELINES, ids=[p[0] for p in PIPELINES])
def test_reference_script_parity(name, overrides, epochs, counts_atol,
                                 titanic_csv, tmp_path, monkeypatch):
    import multimodn_tpu.data.titanic as repo_titanic
    from pipelines.titanic import common

    monkeypatch.setattr(repo_titanic, "DEFAULT_DATA_PATH", titanic_csv)

    pipe_mod = __import__(f"pipelines.titanic.{name}", fromlist=["CONFIG"])
    cfg = (dataclasses.replace(pipe_mod.CONFIG, **overrides) if overrides
           else pipe_mod.CONFIG)

    # Repo pipeline at seed 0 through its own runner; artifacts into tmp.
    repo_dir = tmp_path / "repo"
    repo_dir.mkdir()
    repo_model, repo_hist = common.run(
        cfg, str(repo_dir / (name + ".py")),
        argv=["-e", str(epochs)] + REPO_SAVE_FLAGS)
    repo_results = repo_dir / "results.csv"
    repo_hist.save_results(str(repo_results))

    # The reference script, same seed/CSV, starting from the repo model's
    # initial (untrained) weights.
    init_params = common.build_model(cfg, seed=0).state_dict()
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    cap = run_reference_pipeline(
        name, ["-e", str(epochs)] + REF_SAVE_FLAGS, str(ref_dir),
        titanic_csv, transplant_params=init_params)
    assert len(cap["models"]) == 1 and len(cap["histories"]) == 1
    ref_hist = cap["histories"][0]

    _assert_history_close(repo_hist, ref_hist, counts_atol)

    ref_results = os.path.join(
        str(ref_dir), "pipelines", "titanic", "results",
        name.replace("_pipeline", "") + ".csv")
    assert os.path.exists(ref_results), ref_results
    _assert_results_csv_close(str(repo_results), ref_results, counts_atol)


def _run_missingness_pair(csv_path, tmp_path, monkeypatch, epochs):
    import multimodn_tpu.data.titanic as repo_titanic
    from pipelines.titanic import common
    from pipelines.titanic.titanic_missingness_pipeline import CONFIG

    monkeypatch.setattr(repo_titanic, "DEFAULT_DATA_PATH", csv_path)
    cfg = dataclasses.replace(CONFIG, **MISSINGNESS_OVERRIDES)
    repo_dir = tmp_path / "repo"
    repo_dir.mkdir()
    _, repo_hist = common.run(
        cfg, str(repo_dir / "titanic_missingness_pipeline.py"),
        argv=["-e", str(epochs)] + REPO_SAVE_FLAGS)
    init_params = common.build_model(cfg, seed=0).state_dict()
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    cap = run_reference_pipeline(
        "titanic_missingness_pipeline",
        ["-e", str(epochs)] + REF_SAVE_FLAGS, str(ref_dir), csv_path,
        transplant_params=init_params)
    return repo_hist, cap


def test_missingness_script_parity_dense_cabin(tmp_path, monkeypatch):
    """Full script-level parity for the missingness pipeline (batch_size=1,
    batch-granular NaN skip) on a CSV whose Cabin column is fully populated.

    The shipped feature order ends with the sparse ``Cabin_num``
    (``titanic_missingness_pipeline.py:26``); whenever the last encoder is
    NaN-skipped for some-but-not-all val batches, the reference's ``test()``
    crashes collecting final-state outputs (``multimodn.py:354-357`` — the
    pinned quirk). With Cabin dense, NaN skips still fire mid-chain (Age
    ~20% missing, 2 Embarked rows) but the last encoder always runs, so the
    reference completes and the whole 2-epoch trajectory must match."""
    from multimodn_tpu.data.synth import synthetic_titanic

    df = synthetic_titanic()
    df["Cabin"] = df["Cabin"].fillna("Z99")
    assert df["Age"].isna().any()
    csv_path = str(tmp_path / "titanic_dense_cabin.csv")
    df.to_csv(csv_path, index=False)

    repo_hist, cap = _run_missingness_pair(csv_path, tmp_path, monkeypatch,
                                           epochs=2)
    assert len(cap["histories"]) == 1
    _assert_history_close(repo_hist, cap["histories"][0], counts_atol=1.5e-2)


def test_missingness_reference_script_crashes_on_sparse_cabin(
        titanic_csv, tmp_path, monkeypatch):
    """Pin the quirk at script level: on realistic data (Cabin ~77%
    missing), the shipped reference missingness pipeline CANNOT finish its
    first val pass — ``test()`` dies collecting final-state outputs when the
    last encoder is NaN-skipped for a strict subset of batches
    (``multimodn.py:354-357``). The repo pipeline completes on the same data
    (aligned-output collection, model.py docstring)."""
    with pytest.raises((TypeError, ValueError)):
        _run_missingness_pair(titanic_csv, tmp_path, monkeypatch, epochs=1)
    # Repo side of the pair ran to completion before the reference crashed:
    # re-run it alone to assert it trains both epochs on sparse-cabin data.
    import multimodn_tpu.data.titanic as repo_titanic
    from pipelines.titanic import common
    from pipelines.titanic.titanic_missingness_pipeline import CONFIG
    monkeypatch.setattr(repo_titanic, "DEFAULT_DATA_PATH", titanic_csv)
    cfg = dataclasses.replace(CONFIG, **MISSINGNESS_OVERRIDES)
    _, hist = common.run(cfg, str(tmp_path / "repo2" / "p.py"),
                         argv=["-e", "1"] + REPO_SAVE_FLAGS)
    assert len(hist.loss["train"]) == 1 and len(hist.loss["val"]) == 1
    assert np.isfinite(hist.loss["train"][0]).all()
