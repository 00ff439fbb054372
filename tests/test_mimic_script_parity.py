"""End-to-end parity: the reference's ACTUAL MIMIC pipeline script vs ours.

Extends the Titanic script-parity loop (tests/test_pipeline_parity.py) to
the MIMIC protocol: ``/root/reference/pipelines/mimic/
mimic_single_task_pipeline.py``'s own ``main()`` executes end-to-end (fold
split geometry, per-fold model construction, 100-epoch loop capped via the
module-level ``trange``, best-val-checkpoint selection, held-out test,
results-CSV emission — all the reference's code), against the same staged
``data.csv``/``how_to_split.csv`` our pipeline reads, from the same
transplanted initial weights, and the two results CSVs must agree row by
row.

This is the assertion that pins the fold-geometry semantics the repo once
got wrong (fixed in round 3): the joint-pathologies split table for every
target's folds and the per-fold ``random_state = seed + i`` val/test split.
A divergence in either produces different patients per fold and
AUROC deltas far above the tolerances here.

Dropout is the only RNG in the training path (torch RNG vs JAX PRNG cannot
match), so both sides run with dropout forced to 0 — the reference via a
``MIMIC_MLPEncoder`` wrapper in the exec'd script namespace, ours via
``MimicConfig(dropout=0)``.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from tests.ref_pipeline_harness import run_reference_mimic_pipeline

TARGETS = ["Enlarged Cardiomediastinum", "Cardiomegaly"]
SOURCES = ["de", "vd", "n_ech", "ts_ce"]  # hardcoded in the ref script (:57)
N_PATIENTS = 40
EPOCHS = 3
NFOLD = 5  # hardcoded in the ref script (:85)

# Scalar members of the 15-tuple metric suite; fpr/tpr/precision/recall/
# thr_roc/thr_pr are curve arrays (CSV cells hold stringified lists whose
# formatting differs between numpy and list repr, so they are not compared
# here — curve semantics are covered by tests/test_metrics.py).
RATE_COLS = ["f1", "auc", "accuracy", "sensitivity", "specificity"]
COUNT_COLS = ["tn", "fp", "fn", "tp"]


def test_mimic_single_task_script_parity(tmp_path, monkeypatch):
    from multimodn_tpu.baselines.haim import HAIM, HAIMDecoder
    from multimodn_tpu.data import MIMICDataset
    from multimodn_tpu.data.mimic import build_mimic_cache
    from pipelines.mimic.common import MimicConfig, build_modn
    from pipelines.mimic.mimic_single_task_pipeline import main as repo_main

    synth = {"n_patients": N_PATIENTS}
    cache_dir = build_mimic_cache(TARGETS, SOURCES, synthetic_kwargs=synth)

    cfg = MimicConfig(epochs=EPOCHS, nfold=NFOLD,
                      synthetic_patients=N_PATIENTS, dropout=0.0,
                      nan_skip="batch")
    storage = tmp_path / "repo"
    monkeypatch.setenv("MULTIMODN_STORAGE", str(storage))
    repo_main(["-s", "0"], cfg)
    monkeypatch.delenv("MULTIMODN_STORAGE")
    ours = pd.read_csv(storage / "nips" / "results" /
                       "mimic_single_task_(auc + bac).csv")

    # Initial weights per (target, fold) in the reference's construction
    # order; per-fold seeds restart at 0 for each target (the script resets
    # its running ``seed`` inside the target loop, :97).
    ds = MIMICDataset(SOURCES, targets=[TARGETS[0]], synthetic_kwargs=synth)
    partitions = ds.partitions
    n_features = sum(partitions)
    modn_inits, haim_inits = [], []
    for target in TARGETS:
        for fold in range(NFOLD):
            modn_inits.append(
                build_modn(cfg, partitions, [target], fold).state_dict())
            haim_inits.append(
                HAIM(HAIMDecoder(n_features,
                                 (cfg.decoder_hidd_units,
                                  cfg.decoder_hidd_units)),
                     seed=fold).params)

    cap = run_reference_mimic_pipeline(
        "mimic_single_task_pipeline", str(tmp_path / "ref"), cache_dir,
        TARGETS, SOURCES, EPOCHS, modn_inits, haim_inits)
    assert len(cap["models"]) == len(TARGETS) * NFOLD
    assert len(cap["haims"]) == len(TARGETS) * NFOLD
    assert cap["modn_inits_left"] == 0 and cap["haim_inits_left"] == 0
    theirs = pd.read_csv(cap["results_csv"])

    assert len(ours) == len(theirs) == len(TARGETS) * NFOLD * 2
    # Row identity: (model, target, fold, seed) sequences equal — the
    # reference appends modn then haim per fold, as do we.
    for col in ("model", "target", "fold", "seed"):
        assert list(ours[col]) == list(theirs[col]), col
    for col in RATE_COLS:
        np.testing.assert_allclose(
            ours[col].to_numpy(np.float64),
            theirs[col].to_numpy(np.float64),
            rtol=3e-3, atol=2e-2, err_msg=f"results[{col}]")
    for col in COUNT_COLS:
        assert (np.abs(ours[col].to_numpy(np.float64)
                       - theirs[col].to_numpy(np.float64)) <= 1.01).all(), \
            (col, list(ours[col]), list(theirs[col]))


def test_mimic_mnar_script_parity(tmp_path, monkeypatch):
    """The reference MNAR script end-to-end at miss_perc=40: class-1
    vd-block NaN injection on train/val, dual clean/flipped-class degraded
    testing, the HAIM skip-last-val selection quirk
    (mnar_missingness_pipeline.py:300-303) — all against our pipeline's
    results CSV, same staged data, same transplanted initial weights."""
    from multimodn_tpu.baselines.haim import HAIM, HAIMDecoder
    from multimodn_tpu.data import MIMICDataset
    from multimodn_tpu.data.mimic import build_mimic_cache
    from pipelines.mimic.common import MimicConfig, build_modn
    from pipelines.mimic.mimic_single_task_mnar_missingness_pipeline import \
        main as repo_main

    synth = {"n_patients": N_PATIENTS}
    cache_dir = build_mimic_cache(TARGETS, SOURCES, synthetic_kwargs=synth)

    cfg = MimicConfig(epochs=EPOCHS, nfold=NFOLD,
                      synthetic_patients=N_PATIENTS, dropout=0.0,
                      nan_skip="batch")
    storage = tmp_path / "repo"
    monkeypatch.setenv("MULTIMODN_STORAGE", str(storage))
    repo_main(["-p", "40", "-s", "0"], cfg)
    monkeypatch.delenv("MULTIMODN_STORAGE")
    ours = pd.read_csv(
        storage / "nips" / "results" /
        "mimic_single_task_mnar_missingness_(auc + bac).csv")

    ds = MIMICDataset(SOURCES, targets=[TARGETS[0]], synthetic_kwargs=synth)
    partitions = ds.partitions
    n_features = sum(partitions)
    modn_inits, haim_inits = [], []
    for target in TARGETS:
        for fold in range(NFOLD):
            modn_inits.append(
                build_modn(cfg, partitions, [target], fold).state_dict())
            haim_inits.append(
                HAIM(HAIMDecoder(n_features,
                                 (cfg.decoder_hidd_units,
                                  cfg.decoder_hidd_units)),
                     seed=fold).params)

    cap = run_reference_mimic_pipeline(
        "mimic_single_task_mnar_missingness_pipeline", str(tmp_path / "ref"),
        cache_dir, TARGETS, SOURCES, EPOCHS, modn_inits, haim_inits,
        argv=["-p", "40"])
    assert cap["modn_inits_left"] == 0 and cap["haim_inits_left"] == 0
    theirs = pd.read_csv(cap["results_csv"])

    # 2 targets x 5 folds x 2 models x both in {True, False}.
    assert len(ours) == len(theirs) == len(TARGETS) * NFOLD * 2 * 2
    for col in ("model", "target", "both", "fold", "seed"):
        assert list(ours[col].astype(str)) == list(theirs[col].astype(str)), \
            col
    for col in RATE_COLS:
        np.testing.assert_allclose(
            ours[col].to_numpy(np.float64),
            theirs[col].to_numpy(np.float64),
            rtol=3e-3, atol=2e-2, err_msg=f"results[{col}]")
    for col in COUNT_COLS:
        assert (np.abs(ours[col].to_numpy(np.float64)
                       - theirs[col].to_numpy(np.float64)) <= 1.01).all(), \
            (col, list(ours[col]), list(theirs[col]))


def test_mimic_multi_task_script_parity(tmp_path, monkeypatch):
    """The reference multi-task script end-to-end: ONE model per fold with
    D=2 decoder heads, best-checkpoint selection on val AUROC+BAC SUMMED
    across targets, per-target result rows. The reference trains no HAIM
    baseline here (its haim_api import is dead code) — our pipeline's HAIM
    rows are a documented extension, so only the modn rows are compared;
    the reference's CSV also has no model/miss_perc columns."""
    from multimodn_tpu.data import MIMICDataset
    from multimodn_tpu.data.mimic import build_mimic_cache
    from pipelines.mimic.common import MimicConfig, build_modn
    from pipelines.mimic.mimic_multi_task_pipeline import main as repo_main

    synth = {"n_patients": N_PATIENTS}
    cache_dir = build_mimic_cache(TARGETS, SOURCES, synthetic_kwargs=synth)

    cfg = MimicConfig(epochs=EPOCHS, nfold=NFOLD,
                      synthetic_patients=N_PATIENTS, dropout=0.0,
                      nan_skip="batch")
    storage = tmp_path / "repo"
    monkeypatch.setenv("MULTIMODN_STORAGE", str(storage))
    repo_main(["-s", "0"], cfg)
    monkeypatch.delenv("MULTIMODN_STORAGE")
    ours = pd.read_csv(storage / "nips" / "results" /
                       "mimic_multi_task_(auc + bac).csv")
    ours = ours[ours["model"] == "modn"].reset_index(drop=True)

    ds = MIMICDataset(SOURCES, targets=TARGETS, synthetic_kwargs=synth)
    modn_inits = [build_modn(cfg, ds.partitions, TARGETS, fold).state_dict()
                  for fold in range(NFOLD)]

    cap = run_reference_mimic_pipeline(
        "mimic_multi_task_pipeline", str(tmp_path / "ref"), cache_dir,
        TARGETS, SOURCES, EPOCHS, modn_inits, haim_inits=None)
    assert len(cap["models"]) == NFOLD
    assert len(cap["haims"]) == 0      # no HAIM in the reference script
    assert cap["modn_inits_left"] == 0
    theirs = pd.read_csv(cap["results_csv"])

    assert len(ours) == len(theirs) == len(TARGETS) * NFOLD
    for col in ("target", "fold", "seed"):
        assert list(ours[col]) == list(theirs[col]), col
    for col in RATE_COLS:
        np.testing.assert_allclose(
            ours[col].to_numpy(np.float64),
            theirs[col].to_numpy(np.float64),
            rtol=3e-3, atol=2e-2, err_msg=f"results[{col}]")
    for col in COUNT_COLS:
        assert (np.abs(ours[col].to_numpy(np.float64)
                       - theirs[col].to_numpy(np.float64)) <= 1.01).all(), \
            (col, list(ours[col]), list(theirs[col]))
