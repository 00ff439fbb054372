"""Shared MIMIC experiment harness.

Reproduces the reference experiment protocol (``pipelines/mimic/
mimic_single_task_pipeline.py:44-246``): patient-level 5-fold StratifiedKFold
over ``haim_id``/aggregated label, held-out fold split 50/50 into val/test,
fresh model per fold, best-checkpoint selection on validation AUROC+BAC,
reload best, held-out test, append a hyperparameter+metric row to a shared
results CSV — then the same folds for the HAIM parallel-fusion baseline.

TPU-native difference: the 100-epoch train/val/select loop runs as ONE fused
device program per fold (``MultiModN.fit_best``), with the best parameters
carried on device instead of torch.saved per improvement.
"""
from __future__ import annotations

import os
import pickle
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import pandas as pd

from multimodn_tpu import Adam, MultiModN, MultiModNHistory
from multimodn_tpu.baselines.haim import HAIM, HAIMDecoder
from multimodn_tpu.checkpoint import save_checkpoint
from multimodn_tpu.core.metrics import performance_metrics
from multimodn_tpu.data import ArrayLoader, MIMICDataset
from multimodn_tpu.data.dataset import Subset
from multimodn_tpu.decoders import MLPDecoder
from multimodn_tpu.encoders import MIMICMLPEncoder

HYPERPARAMETERS = ["model", "target", "fold", "miss_perc", "seed",
                   "state_size", "batch_size", "encoder_hidd_units",
                   "decoder_hidd_units", "dropout", "epochs"]
SAVE_LOGS = HYPERPARAMETERS + performance_metrics


@dataclass
class MimicConfig:
    sources: List[str] = field(default_factory=lambda: ["de", "vd", "n_ech", "ts_ce"])
    targets: List[str] = field(default_factory=lambda: ["Enlarged Cardiomediastinum",
                                                        "Cardiomegaly"])
    state_size: int = 50
    learning_rate: float = 1e-3
    epochs: int = 100
    decoder_hidd_units: int = 32
    encoder_hidd_units: int = 32
    err_penalty: float = 1.0
    state_change_penalty: float = 0.0
    dropout: float = 0.2
    batch_size: int = 16
    nfold: int = 5
    miss_perc: float = 0.0
    # NaN-skip granularity for the MultiModN models ('sample' generalizes;
    # 'batch' is the reference's exact semantics — quirk #2. The MNAR
    # protocol's published robustness curves use 'batch': under it, any
    # realistic missingness rate means nearly every batch of 16 contains a
    # missing row, so the degraded modality is skipped for ALL batches —
    # the mechanism behind the paper's flat MultiModN curve. 'sample'
    # exposes a per-row presence channel that MNAR training can exploit;
    # see RESULTS.md.)
    nan_skip: str = "sample"
    # Opt-in MNAR mitigation for nan_skip='sample': missingness-weighted
    # state-change damping on present rows (MultiModN(presence_penalty=);
    # measured at protocol scale in RESULTS.md — rescues the flipped-class
    # test the bare 'sample' mode fails).
    presence_penalty: float = 0.0
    # Synthetic data size when no real embeddings CSV is configured.
    synthetic_patients: int = 120
    # Train all folds of a target simultaneously via jax.vmap (one device
    # dispatch for the whole cross-validation; bit-identical results).
    vmap_folds: bool = True
    # Stream fold batches host->device per step instead of uploading whole
    # fold epoch stacks (experiments_stream.py / data/streaming.py): the
    # same protocol when the stacks don't fit device memory; results equal
    # the fused path on data that fits (tests/test_experiments_stream.py,
    # tests/test_pipelines.py). Measured trade: fused ~4.4x faster at
    # batch 512 when data fits (RESULTS.md, bench_streaming.json).
    stream_folds: bool = False
    # 'mimic_mlp' (reference parity) or 'transformer' (the beyond-reference
    # attention encoder for wide modalities, encoders/attention.py).
    encoder_type: str = "mimic_mlp"
    # Preemption-safe training: when set, each fold trains through
    # checkpoint.fit_best_resumable with atomic full-state checkpoints under
    # this directory (re-running the pipeline resumes unfinished folds).
    # Forces the sequential per-fold path (vmap_folds is ignored).
    resume_dir: str = None
    transformer_embed: int = 128
    transformer_heads: int = 4
    transformer_layers: int = 2
    transformer_chunk: int = 64


def storage_root() -> str:
    """Root directory for pipeline artifacts (``nips/results`` CSVs, saved
    models). Defaults to the repo root — where the PUBLISHED protocol CSVs
    live (``nips/results/*.csv``, tracked in git). The results files are
    append-only across runs (reference ``save_results`` semantics), so tests
    and smoke runs MUST NOT use the default: they set ``MULTIMODN_STORAGE``
    to a scratch dir (tests/conftest.py does this for the whole suite,
    pipelines/test_all_pipelines.sh per run) or they would append junk rows
    to the tracked deliverables."""
    return os.environ.get("MULTIMODN_STORAGE") or os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", ".."))


def _metric_scalars(metrics_tuple):
    """15-tuple -> CSV-writable values (curves become lists, like the
    reference's .numpy() conversion leaves arrays)."""
    out = []
    for v in metrics_tuple:
        arr = np.asarray(v)
        out.append(float(arr) if arr.ndim == 0 else arr.tolist())
    return out


def append_result_row(results_file_path: str, row: list, columns=None):
    df = pd.DataFrame([row], columns=columns or SAVE_LOGS)
    if os.path.isfile(results_file_path):
        df.to_csv(results_file_path, mode="a", index=False, header=False)
    else:
        df.to_csv(results_file_path, mode="w", index=False)


def joint_split_table(cfg: MimicConfig) -> pd.DataFrame:
    """Patient split table of the JOINT pathologies cache.

    Every reference MIMIC pipeline stratifies its folds on the how_to_split
    table of ``datasets/mimic/<'_'.join(targets)>/<sources>/`` with targets
    = the FULL experiment target list — even the per-target loops of the
    single-task and MNAR pipelines (``mimic_single_task_pipeline.py:88-94``,
    ``mnar_missingness_pipeline.py:108-113``). Its patient label is the
    multi-target Agg majority vote, NOT the per-target label, so per-target
    datasets' own split tables must not be used for fold geometry."""
    from multimodn_tpu.data.mimic import build_mimic_cache
    cache_dir = build_mimic_cache(
        list(cfg.targets), list(cfg.sources),
        synthetic_kwargs={"n_patients": cfg.synthetic_patients})
    return pd.read_csv(os.path.join(cache_dir, "how_to_split.csv"))


def patient_kfold_splits(dataset: MIMICDataset, nfold: int, seed: int,
                         patient: pd.DataFrame = None):
    """Yield (train_ind, val_ind, test_ind) row-index arrays with patient-level
    stratified folds (reference ``mimic_single_task_pipeline.py:98-116``).

    ``patient``: the how_to_split table to stratify on. Reference-protocol
    callers pass ``joint_split_table(cfg)`` (see its docstring); the default
    is the dataset's own table."""
    from sklearn.model_selection import StratifiedKFold, train_test_split

    if patient is None:
        patient = dataset.patient_split_table()
    haim_id = patient["haim_id"].values
    labels = patient["label"].values
    rows_haim = dataset.haim_ids()
    skf = StratifiedKFold(n_splits=nfold, shuffle=True, random_state=seed)
    for i, (id_train, id_test_val) in enumerate(skf.split(haim_id, labels)):
        train_patients = set(haim_id[id_train])
        test_val_patients = haim_id[id_test_val]
        labels_tv = labels[id_test_val]
        # The reference increments its running ``seed`` at the END of each
        # fold body (``mimic_single_task_pipeline.py:97,114,246``), so fold
        # i's val/test patient split uses random_state = seed + i — NOT the
        # fixed fold-0 seed (the StratifiedKFold itself is built once from
        # the base seed before the loop).
        id_test, id_val = train_test_split(
            test_val_patients, test_size=0.5, stratify=labels_tv,
            random_state=seed + i)[:2]
        val_p, test_p = set(id_val), set(id_test)
        train_ind = np.where(np.isin(rows_haim, list(train_patients)))[0]
        val_ind = np.where(np.isin(rows_haim, list(val_p)))[0]
        test_ind = np.where(np.isin(rows_haim, list(test_p)))[0]
        yield train_ind, val_ind, test_ind


def build_modn(cfg: MimicConfig, partitions: List[int], targets: List[str],
               seed: int) -> MultiModN:
    if cfg.encoder_type == "transformer":
        from multimodn_tpu.encoders import TransformerEncoder
        encoders = [TransformerEncoder(cfg.state_size, p,
                                       embed_dim=cfg.transformer_embed,
                                       n_heads=cfg.transformer_heads,
                                       n_layers=cfg.transformer_layers,
                                       chunk=min(cfg.transformer_chunk, p),
                                       dropout_rate=cfg.dropout)
                    for p in partitions]
    else:
        encoders = [MIMICMLPEncoder(cfg.state_size, p,
                                    (cfg.encoder_hidd_units,
                                     cfg.encoder_hidd_units),
                                    dropout=cfg.dropout)
                    for p in partitions]
    decoders = [MLPDecoder(cfg.state_size,
                           (cfg.decoder_hidd_units, cfg.decoder_hidd_units), 2)
                for _ in targets]
    return MultiModN(cfg.state_size, encoders, decoders, cfg.err_penalty,
                     cfg.state_change_penalty, nan_skip=cfg.nan_skip,
                     presence_penalty=cfg.presence_penalty, seed=seed)


def run_fold_modn(cfg: MimicConfig, dataset_modn, partitions, targets,
                  train_ind, val_ind, test_ind, seed, artifacts_dir=None,
                  fold_tag=""):
    """Train MultiModN on one fold with fused best-selection; return the
    held-out-test 15-tuples (one per decoder) and the fit info."""
    if cfg.stream_folds:
        return _run_fold_modn_streamed(cfg, dataset_modn, partitions,
                                       targets, train_ind, val_ind,
                                       test_ind, seed, artifacts_dir,
                                       fold_tag)
    train_loader = ArrayLoader(Subset(dataset_modn, train_ind), cfg.batch_size)
    val_loader = ArrayLoader(Subset(dataset_modn, val_ind), cfg.batch_size)
    test_loader = ArrayLoader(Subset(dataset_modn, test_ind), cfg.batch_size)

    model = build_modn(cfg, partitions, targets, seed)
    history = MultiModNHistory(targets)
    if cfg.resume_dir:
        from multimodn_tpu.checkpoint import fit_best_resumable
        if not fold_tag:
            raise ValueError(
                "resume_dir requires a unique fold_tag per (target, fold) "
                "run: checkpoint dirs must not collide across runs or a "
                "later run silently adopts an earlier run's completed "
                "checkpoint and trains zero epochs.")
        # Run identity = targets + missingness + fold tag: two different
        # experiments must never share a checkpoint directory (same-shape
        # payloads load silently).
        run_key = "_".join(t.replace(" ", "-") for t in targets)
        if cfg.miss_perc:
            run_key += f"_miss{cfg.miss_perc:g}"
        info = fit_best_resumable(
            model, train_loader, Adam(cfg.learning_rate), "cross_entropy",
            epochs=cfg.epochs, val_loader=val_loader, history=history,
            checkpoint_dir=os.path.join(cfg.resume_dir, run_key, fold_tag),
            chunk_epochs=max(1, cfg.epochs // 10))
        history = info["history"] or history
    else:
        info = model.fit_best(train_loader, Adam(cfg.learning_rate),
                              "cross_entropy", epochs=cfg.epochs,
                              val_loader=val_loader, history=history,
                              restore_best=True)
    _save_fold_artifacts(artifacts_dir, fold_tag, model, info, history)
    test_metrics = model.test(test_loader, "cross_entropy")
    return model, history, info, test_metrics


def _save_fold_artifacts(artifacts_dir, fold_tag, model, info, history):
    """One place for the per-fold checkpoint/history artifact set — shared
    by the fused and streamed fold runners so filenames/payloads can never
    diverge between cfg.stream_folds paths."""
    if not artifacts_dir:
        return
    os.makedirs(artifacts_dir, exist_ok=True)
    save_checkpoint(os.path.join(artifacts_dir, f"modn_best_{fold_tag}.pkl"),
                    model, info["best_epoch"], info["best_score"])
    with open(os.path.join(artifacts_dir,
                           f"modn_history_{fold_tag}.pkl"), "wb") as f:
        pickle.dump(history, f)


def _run_fold_modn_streamed(cfg, dataset_modn, partitions, targets,
                            train_ind, val_ind, test_ind, seed,
                            artifacts_dir, fold_tag):
    """``run_fold_modn`` over StreamingLoaders (``cfg.stream_folds``):
    batches stream host->device per step, so the fold's epoch stacks never
    need to fit device memory. Same protocol, bit-equal on data that fits
    (tests/test_streaming.py)."""
    from multimodn_tpu.data.streaming import (StreamingLoader,
                                              fit_best_streaming,
                                              test_epoch_streaming)

    ckpt_kw = {}
    if cfg.resume_dir:
        if not fold_tag:
            raise ValueError(
                "resume_dir requires a unique fold_tag per (target, fold) "
                "run (same contract as the fused path).")
        run_key = "_".join(t.replace(" ", "-") for t in targets)
        if cfg.miss_perc:
            run_key += f"_miss{cfg.miss_perc:g}"
        ckpt_kw = {"checkpoint_dir": os.path.join(cfg.resume_dir, run_key,
                                                  fold_tag + "_stream"),
                   "checkpoint_every": max(1, cfg.epochs // 10)}
    model = build_modn(cfg, partitions, targets, seed)
    history = MultiModNHistory(targets)
    info = fit_best_streaming(
        model, StreamingLoader(Subset(dataset_modn, train_ind),
                               cfg.batch_size),
        Adam(cfg.learning_rate), "cross_entropy", epochs=cfg.epochs,
        val_loader=StreamingLoader(Subset(dataset_modn, val_ind),
                                   cfg.batch_size),
        history=history, **ckpt_kw)
    _save_fold_artifacts(artifacts_dir, fold_tag, model, info, history)
    test_metrics = test_epoch_streaming(
        model, StreamingLoader(Subset(dataset_modn, test_ind),
                               cfg.batch_size), "cross_entropy")
    return model, history, info, test_metrics


def run_all_folds_modn(cfg: MimicConfig, dataset_modn, partitions, targets,
                       fold_indices, base_seed: int):
    """All folds of one target trained simultaneously (vmapped select-fit;
    see multimodn_tpu.experiments.kfold_fit_best). Returns per-fold
    (model, info, test_metrics) with the same per-fold seeds the sequential
    path uses."""
    from multimodn_tpu.experiments import kfold_fit_best

    if cfg.stream_folds:
        from multimodn_tpu.data.streaming import StreamingLoader
        loader_cls = StreamingLoader
    else:
        loader_cls = ArrayLoader
    folds = [(loader_cls(Subset(dataset_modn, tr), cfg.batch_size),
              loader_cls(Subset(dataset_modn, va), cfg.batch_size))
             for tr, va, _te in fold_indices]
    seeds = [base_seed + i for i in range(len(fold_indices))]
    results = kfold_fit_best(
        lambda s: build_modn(cfg, partitions, targets, s),
        folds, Adam(cfg.learning_rate), "cross_entropy",
        epochs=cfg.epochs, seeds=seeds)
    out = []
    for res, (_tr, _va, te) in zip(results, fold_indices):
        if cfg.stream_folds:
            from multimodn_tpu.data.streaming import test_epoch_streaming
            test_metrics = test_epoch_streaming(
                res["model"],
                StreamingLoader(Subset(dataset_modn, te), cfg.batch_size),
                "cross_entropy")
        else:
            test_loader = ArrayLoader(Subset(dataset_modn, te),
                                      cfg.batch_size)
            test_metrics = res["model"].test(test_loader, "cross_entropy")
        out.append((res["model"], res, test_metrics))
    return out


def run_fold_haim(cfg: MimicConfig, dataset_haim, train_ind, val_ind,
                  test_ind, seed, skip_last_val: bool = False):
    """Train the HAIM baseline on the same fold with the same best-epoch
    selection rule (host loop — HAIM epochs are one matmul stack, cheap).

    ``dataset_haim``: a single-partition PartitionDataset over the zero-filled
    (nanfill) feature matrix — the reference feeds HAIM the raw concatenated
    features (``mimic_single_task_pipeline.py:200-204``).

    ``skip_last_val``: the MNAR pipeline passes True — the reference MNAR
    script never evaluates HAIM's last epoch on val (see HAIM.fit_best).
    """
    train_loader = ArrayLoader(Subset(dataset_haim, train_ind), cfg.batch_size)
    val_loader = ArrayLoader(Subset(dataset_haim, val_ind), cfg.batch_size)
    test_loader = ArrayLoader(Subset(dataset_haim, test_ind), cfg.batch_size)

    n_features = sum(dataset_haim.partitions)
    model = HAIM(HAIMDecoder(
        n_features, (cfg.decoder_hidd_units, cfg.decoder_hidd_units)),
        seed=seed)
    model.fit_best(train_loader, Adam(cfg.learning_rate), "cross_entropy",
                   epochs=cfg.epochs, val_loader=val_loader,
                   restore_best=True, skip_last_val=skip_last_val)
    return model, model.test(test_loader, "cross_entropy")
