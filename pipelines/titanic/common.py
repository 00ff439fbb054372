"""Shared Titanic pipeline runner.

The reference ships six ~130-line near-identical Titanic pipelines
(``pipelines/titanic/*_pipeline.py``); each differs only in features,
encoder construction, batch size, and epochs. Here each pipeline file is a
config + encoder factory over this common runner, which reproduces the
reference flow: dataset -> seeded balanced split -> loaders -> model ->
per-epoch train+val -> pickle model/history, plot PNG, results CSV, with the
same artifact locations (models/ plots/ results/ next to the pipeline).

Training runs through the fused multi-epoch ``fit`` program (one device
dispatch for the whole run) — history contents are identical to the
reference's per-epoch loop.
"""
from __future__ import annotations

import os
import pickle
import sys
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Tuple

from multimodn_tpu import Adam, MultiModN, MultiModNHistory
from multimodn_tpu.data import ArrayLoader, TitanicDataset
from multimodn_tpu.decoders import LogisticDecoder
from pipelines import utils


@dataclass
class TitanicConfig:
    features: List[str]
    make_encoders: Callable[[int, List[str]], list]
    targets: List[str] = field(default_factory=lambda: ["Survived"])
    datasplit: Tuple[float, float, float] = (0.8, 0.2, 0)
    balance_target_idx: int = 0
    batch_size: int = 32
    state_size: int = 1
    learning_rate: float = 0.01
    epochs: int = 300
    err_penalty: float = 0.7
    state_change_penalty: float = 0.3
    dropna: bool = True
    featurewise: bool = False
    partitions: Optional[List[int]] = None
    dropna_columns: List[str] = field(default_factory=list)
    # 'sample' removes the reference's batch_size=1 requirement for
    # missingness runs; 'batch' reproduces it exactly (quirk #2).
    nan_skip: str = "sample"


def build_model(cfg: TitanicConfig, seed: int) -> MultiModN:
    """Construct the pipeline's model exactly as ``run()`` does — exposed so
    parity tests can capture the seed-deterministic initial weights."""
    encoders = cfg.make_encoders(cfg.state_size, cfg.features)
    decoders = [LogisticDecoder(cfg.state_size) for _ in cfg.targets]
    return MultiModN(cfg.state_size, encoders, decoders, cfg.err_penalty,
                     cfg.state_change_penalty, nan_skip=cfg.nan_skip,
                     seed=seed)


def run(cfg: TitanicConfig, pipeline_file: str, argv=None):
    name = utils.extract_pipeline_name(pipeline_file)
    print("Running {}...".format(utils.get_display_name(name)))
    args = utils.parse_args(argv=argv)
    epochs = args.epoch if args.epoch else cfg.epochs

    dataset = TitanicDataset(cfg.features, cfg.targets, dropna=cfg.dropna,
                             dropna_columns=cfg.dropna_columns, std=True)
    base = (dataset.featurewise_dataset() if cfg.featurewise
            else dataset.partition_dataset(cfg.partitions))
    train_data, val_data, test_data = base.random_split(
        cfg.datasplit, args.seed, cfg.balance_target_idx)

    bs = cfg.batch_size
    train_loader = ArrayLoader(train_data, bs if bs else len(train_data))
    val_loader = ArrayLoader(val_data, bs if bs else len(val_data))

    model = build_model(cfg, args.seed)
    optimizer = Adam(cfg.learning_rate)
    history = MultiModNHistory(cfg.targets)

    model.fit(train_loader, optimizer, "cross_entropy", epochs=epochs,
              history=history, val_loader=val_loader, val_tag="val")

    base_dir = os.path.dirname(os.path.realpath(pipeline_file))
    models_dir = os.path.join(base_dir, "models")
    if args.save_model:
        os.makedirs(models_dir, exist_ok=True)
        with open(os.path.join(models_dir, name + "_model.pkl"), "wb") as f:
            pickle.dump(model, f)
    if args.save_history:
        os.makedirs(models_dir, exist_ok=True)
        with open(os.path.join(models_dir, name + "_history.pkl"), "wb") as f:
            pickle.dump(history, f)
    if args.save_plot:
        plots_dir = os.path.join(base_dir, "plots")
        os.makedirs(plots_dir, exist_ok=True)
        history.plot(os.path.join(plots_dir, name + ".png"), cfg.targets)
    if args.save_results:
        results_dir = os.path.join(base_dir, "results")
        os.makedirs(results_dir, exist_ok=True)
        history.print_results()
        history.save_results(os.path.join(results_dir, name + ".csv"))
    return model, history
