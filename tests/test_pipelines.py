"""Integration tier: every shipped pipeline runs 2-3 epochs end-to-end
(mirrors the reference's test_all_pipelines.sh smoke strategy, SURVEY §4),
plus artifact emission."""
import os

import numpy as np
import pytest

FAST_FLAGS = ["-e", "2", "-m", "false", "-y", "false", "-p", "false",
              "-r", "false"]


@pytest.mark.parametrize("module_name", [
    "titanic_mlp_pipeline",
    "titanic_partitioned_pipeline",
    "titanic_featurewise_pipeline",
    "titanic_missingness_pipeline",
    "titanic_lstm_pipeline",
    "titanic_rnn_pipeline",
])
def test_titanic_pipeline_smoke(module_name):
    mod = __import__(f"pipelines.titanic.{module_name}",
                     fromlist=["main"])
    model, history = mod.main(FAST_FLAGS)
    assert len(history.loss["train"]) == 2
    assert np.isfinite(history.loss["train"][-1]).all()
    assert len(history.loss["val"]) == 2


def test_titanic_pipeline_artifacts(tmp_path, monkeypatch):
    """With persistence on, the standard artifacts appear (model/history
    pickles, plot PNG, results CSV — reference artifact set)."""
    import pickle

    import pipelines.titanic.titanic_mlp_pipeline as pipe
    monkeypatch.setattr(pipe, "__file__",
                        str(tmp_path / "titanic_mlp_pipeline.py"))
    model, history = pipe.main(["-e", "2"])
    assert (tmp_path / "models" / "titanic_mlp_model.pkl").exists()
    assert (tmp_path / "models" / "titanic_mlp_history.pkl").exists()
    assert (tmp_path / "plots" / "titanic_mlp.png").exists()
    assert (tmp_path / "results" / "titanic_mlp.csv").exists()
    # Pickled model round-trips and still predicts.
    with open(tmp_path / "models" / "titanic_mlp_model.pkl", "rb") as f:
        loaded = pickle.load(f)
    x = np.zeros((4, 6), np.float32)
    preds = loaded.predict([x])
    assert preds.shape == (2, 1, 4)


def test_mimic_single_task_small(tmp_path):
    from pipelines.mimic.common import MimicConfig
    from pipelines.mimic.mimic_single_task_pipeline import main

    cfg = MimicConfig(targets=["Cardiomegaly"], epochs=3, nfold=2,
                      synthetic_patients=40)
    cfg_cache = str(tmp_path / "cache")
    res = main(["-e", "3", "-m", "false"], cfg)
    assert len(res) == 4  # 2 folds x (modn + haim)
    for model_name, target, fold, auc in res:
        assert 0.0 <= auc <= 1.0


def test_mimic_mnar_small():
    from pipelines.mimic.common import MimicConfig
    from pipelines.mimic.mimic_single_task_mnar_missingness_pipeline import \
        main

    cfg = MimicConfig(targets=["Cardiomegaly"], epochs=2, nfold=2,
                      synthetic_patients=40)
    res = main(["-p", "50", "-e", "2"], cfg)
    # 2 folds x (modn + haim) x (both=True/False)
    assert len(res) == 8


def test_mimic_transformer_pipeline_smoke(tmp_path, monkeypatch):
    """Beyond-reference transformer-encoder MIMIC config: the full k-fold
    experiment protocol is encoder-agnostic."""
    import os

    from pipelines.mimic import mimic_transformer_pipeline

    monkeypatch.setenv("MULTIMODN_MIMIC_CACHE", str(tmp_path))
    mimic_transformer_pipeline.main(argv=["-e", "2", "-m", "false"])


def test_mimic_single_task_resumable(tmp_path):
    """resume_dir routes each fold through fit_best_resumable; re-running
    the pipeline after completion trains zero further epochs (all folds
    resume as complete) and reproduces the same AUCs."""
    from pipelines.mimic.common import MimicConfig
    from pipelines.mimic.mimic_single_task_pipeline import main

    cfg = MimicConfig(targets=["Cardiomegaly"], epochs=4, nfold=2,
                      synthetic_patients=40,
                      resume_dir=str(tmp_path / "resume"))
    res1 = main(["-e", "4", "-m", "false"], cfg)
    assert os.path.isdir(str(tmp_path / "resume"))
    res2 = main(["-e", "4", "-m", "false"], cfg)
    aucs1 = [r for r in res1 if r[0] == "modn"]
    aucs2 = [r for r in res2 if r[0] == "modn"]
    assert [a[3] for a in aucs1] == [a[3] for a in aucs2]


def test_mimic_resumable_multi_target_no_checkpoint_collision(tmp_path):
    """Regression (review finding): with two targets, each (target, fold)
    run must get its OWN checkpoint directory — previously target 2 found
    target 1's completed checkpoint (same shapes), trained zero epochs, and
    reported target 1's model as its own."""
    from pipelines.mimic.common import MimicConfig
    from pipelines.mimic.mimic_single_task_pipeline import main

    cfg = MimicConfig(targets=["Enlarged Cardiomediastinum", "Cardiomegaly"],
                      epochs=3, nfold=2, synthetic_patients=40,
                      resume_dir=str(tmp_path / "resume"))
    main(["-e", "3", "-m", "false"], cfg)
    roots = sorted(os.listdir(str(tmp_path / "resume")))
    assert len(roots) == 2 and roots[0] != roots[1], roots
    # Two folds per target -> two fold dirs under each target key.
    for r in roots:
        folds = os.listdir(str(tmp_path / "resume" / r))
        assert len(folds) == 2, (r, folds)


def test_mimic_multi_task_resumable(tmp_path):
    """resume_dir disables the vmapped path on the multi-task pipeline too
    and resumes completed runs with zero further training."""
    from pipelines.mimic.common import MimicConfig
    from pipelines.mimic.mimic_multi_task_pipeline import main

    cfg = MimicConfig(targets=["Enlarged Cardiomediastinum", "Cardiomegaly"],
                      epochs=3, nfold=2, synthetic_patients=40,
                      resume_dir=str(tmp_path / "resume"))
    res1 = main(["-e", "3", "-m", "false"], cfg)
    res2 = main(["-e", "3", "-m", "false"], cfg)
    m1 = [r for r in res1 if r[0] == "modn"]
    m2 = [r for r in res2 if r[0] == "modn"]
    assert [r[3] for r in m1] == [r[3] for r in m2]


def test_patient_kfold_matches_reference_fold_geometry(tmp_path):
    """Fold geometry vs an independent mirror of the reference fold loop
    (``mimic_single_task_pipeline.py:97-116``): StratifiedKFold built once
    on the JOINT pathologies split table (multi-target Agg majority label),
    per-fold val/test patient split at ``random_state = seed + i`` (the
    reference increments its running seed at the end of each fold body,
    line 246). Also pins that the per-target split table — the old repo
    behavior — produces DIFFERENT folds, i.e. the table choice matters."""
    import numpy as np
    from sklearn.model_selection import StratifiedKFold, train_test_split

    from multimodn_tpu.data import MIMICDataset
    from pipelines.mimic.common import (
        MimicConfig,
        joint_split_table,
        patient_kfold_splits,
    )

    cfg = MimicConfig(sources=["de", "ts_ce"], synthetic_patients=40,
                      nfold=3)
    synth = {"n_patients": cfg.synthetic_patients}
    dataset = MIMICDataset(cfg.sources, targets=[cfg.targets[0]],
                           synthetic_kwargs=synth)
    table = joint_split_table(cfg)
    folds = list(patient_kfold_splits(dataset, cfg.nfold, 0, patient=table))

    haim_id = table["haim_id"].values
    labels = table["label"].values
    rows = dataset.haim_ids()
    skf = StratifiedKFold(n_splits=cfg.nfold, shuffle=True, random_state=0)
    for i, (id_train, id_tv) in enumerate(skf.split(haim_id, labels)):
        id_test, id_val = train_test_split(
            haim_id[id_tv], test_size=0.5, stratify=labels[id_tv],
            random_state=0 + i)[:2]
        np.testing.assert_array_equal(
            folds[i][0], np.where(np.isin(rows, haim_id[id_train]))[0])
        np.testing.assert_array_equal(
            folds[i][1], np.where(np.isin(rows, id_val))[0])
        np.testing.assert_array_equal(
            folds[i][2], np.where(np.isin(rows, id_test))[0])

    per_target = dataset.patient_split_table()
    assert (per_target["label"].values != labels).any(), \
        "synthetic labels degenerate: joint Agg == per-target labels"
    folds_pt = list(patient_kfold_splits(dataset, cfg.nfold, 0))
    assert any(not np.array_equal(a[0], b[0])
               for a, b in zip(folds, folds_pt))


def test_mimic_single_task_streamed_equals_fused():
    """cfg.stream_folds runs the IDENTICAL north-star protocol with fold
    batches streamed host->device (experiments_stream / fit_best_streaming)
    — pipeline-level results equal the fused run on both the vmapped and
    the sequential per-fold paths."""
    from pipelines.mimic.common import MimicConfig
    from pipelines.mimic.mimic_single_task_pipeline import main

    runs = {}
    for name, kw in {
        "fused_vmap": dict(vmap_folds=True),
        "stream_vmap": dict(vmap_folds=True, stream_folds=True),
        "stream_seq": dict(vmap_folds=False, stream_folds=True),
    }.items():
        cfg = MimicConfig(targets=["Cardiomegaly"], epochs=3, nfold=2,
                          synthetic_patients=40, **kw)
        runs[name] = main(["-e", "3", "-m", "false"], cfg)
    for name in ("stream_vmap", "stream_seq"):
        assert len(runs[name]) == len(runs["fused_vmap"])
        for (m_a, t_a, f_a, auc_a), (m_b, t_b, f_b, auc_b) in zip(
                runs["fused_vmap"], runs[name]):
            assert (m_a, t_a, f_a) == (m_b, t_b, f_b)
            np.testing.assert_allclose(auc_a, auc_b, rtol=1e-6, atol=1e-7)


def test_mimic_streamed_resume_smoke(tmp_path):
    """stream_folds + resume_dir: the streamed sequential fold path trains
    through fit_best_streaming's checkpoints (previously a loud error)."""
    from pipelines.mimic.common import MimicConfig
    from pipelines.mimic.mimic_single_task_pipeline import main

    cfg = MimicConfig(targets=["Cardiomegaly"], epochs=3, nfold=2,
                      synthetic_patients=30, vmap_folds=False,
                      stream_folds=True, resume_dir=str(tmp_path / "ck"))
    res = main(["-e", "3", "-m", "false"], cfg)
    assert len(res) == 4
    # checkpoints landed per (target, fold)
    import glob
    found = glob.glob(str(tmp_path / "ck" / "**" / "resume_stream_latest.pkl"),
                      recursive=True)
    assert len(found) == 2, found
    # re-running resumes instantly from the completed checkpoints and
    # reproduces the same rows
    res2 = main(["-e", "3", "-m", "false"], cfg)
    for (m1, t1, f1, a1), (m2, t2, f2, a2) in zip(res, res2):
        if m1 == "modn":
            np.testing.assert_allclose(a1, a2, rtol=1e-6, atol=1e-7)
