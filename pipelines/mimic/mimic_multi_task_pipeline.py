"""MIMIC multi-task pipeline (reference ``mimic_multi_task_pipeline.py``):
ONE model with D=2 decoder heads over both pathologies; best-checkpoint
selection on validation AUROC+BAC summed across targets; per-target result
rows; HAIM baseline trained per-target on the same folds."""
import os
import sys
from os import path as o

sys.path.append(o.abspath(o.join(o.dirname(__file__), "../..")))

from multimodn_tpu.data import MIMICDataset
from pipelines import utils
from pipelines.mimic.common import (
    storage_root,
    MimicConfig,
    _metric_scalars,
    append_result_row,
    joint_split_table,
    patient_kfold_splits,
    run_all_folds_modn,
    run_fold_haim,
    run_fold_modn,
)



def main(argv=None, cfg: MimicConfig = None):
    name = utils.extract_pipeline_name(__file__)
    args = utils.parse_args(argv=argv)
    cfg = cfg or MimicConfig()
    if args.epoch:
        cfg.epochs = args.epoch

    results_dir = os.path.join(storage_root(), "nips", "results")
    os.makedirs(results_dir, exist_ok=True)
    results_file = os.path.join(results_dir, name + "_(auc + bac).csv")

    dataset_modn = MIMICDataset(
        cfg.sources, targets=cfg.targets,
        synthetic_kwargs={"n_patients": cfg.synthetic_patients})
    partitions = dataset_modn.partitions
    part_modn = dataset_modn.partition_dataset(partitions)

    fold_indices = list(
        patient_kfold_splits(dataset_modn, cfg.nfold, args.seed,
                             patient=joint_split_table(cfg)))
    fold_runs = None
    if cfg.vmap_folds and not cfg.resume_dir:
        fold_runs = run_all_folds_modn(cfg, part_modn, partitions,
                                       cfg.targets, fold_indices, args.seed)

    all_results = []
    seed = args.seed
    for fold, (tr, va, te) in enumerate(fold_indices):
        if fold_runs is not None:
            _, info, test_modn = fold_runs[fold]
        else:
            artifacts = None
            if args.save_model:
                artifacts = os.path.join(storage_root(), "models", "multi_task",
                                         "_".join(cfg.sources))
            _, _, info, test_modn = run_fold_modn(
                cfg, part_modn, partitions, cfg.targets, tr, va, te, seed,
                artifacts_dir=artifacts, fold_tag=f"fold{fold}_seed{seed}")
        for t_idx, target in enumerate(cfg.targets):
            hp = [target, fold, cfg.miss_perc, seed, cfg.state_size,
                  cfg.batch_size, cfg.encoder_hidd_units,
                  cfg.decoder_hidd_units, cfg.dropout, cfg.epochs]
            row = ["modn"] + hp + _metric_scalars(test_modn[t_idx])
            append_result_row(results_file, row)
            all_results.append(("modn", target, fold,
                                float(test_modn[t_idx][1])))
            print(f"[multi:{target}] fold {fold}: best epoch "
                  f"{info['best_epoch']} test auc "
                  f"{float(test_modn[t_idx][1]):.4f}")

        # HAIM stays single-task: one baseline per target on the same folds
        # (reference mimic_multi_task_pipeline.py HAIM section).
        for target in cfg.targets:
            dataset_haim = MIMICDataset(
                cfg.sources, targets=[target], nanfill=True,
                synthetic_kwargs={"n_patients": cfg.synthetic_patients})
            part_haim = dataset_haim.partition_dataset()
            _, test_haim = run_fold_haim(cfg, part_haim, tr, va, te, seed)
            hp = [target, fold, cfg.miss_perc, seed, cfg.state_size,
                  cfg.batch_size, cfg.encoder_hidd_units,
                  cfg.decoder_hidd_units, cfg.dropout, cfg.epochs]
            row = ["haim"] + hp + _metric_scalars(test_haim)
            append_result_row(results_file, row)
            all_results.append(("haim", target, fold, float(test_haim[1])))
        seed += 1
    return all_results


if __name__ == "__main__":
    main()
