"""Production-path tour: preemption-safe training, experiment-axis
sharding, and ahead-of-time serving artifacts.

Runs on CPU anywhere (MULTIMODN_PLATFORM=cpu python
examples/production_features.py); the same code scales to TPU meshes.
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))
os.environ.setdefault("MULTIMODN_PLATFORM", "cpu")

import numpy as np

from multimodn_tpu import (Adam, MultiModN, export_compiled, load_compiled)
from multimodn_tpu.checkpoint import fit_best_resumable
from multimodn_tpu.data import ArrayLoader, PartitionDataset
from multimodn_tpu.decoders import LogisticDecoder
from multimodn_tpu.encoders import MLPEncoder


def build(seed=0):
    return MultiModN(4, [MLPEncoder(4, 4, (8,)), MLPEncoder(4, 2, (8,))],
                     [LogisticDecoder(4)], 0.7, 0.3, seed=seed)


def main():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(120, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [4, 2])
    tr, va, _ = ds.random_split((0.7, 0.3, 0), seed=0)

    with tempfile.TemporaryDirectory() as tmp:
        # 1. Preemption-safe best-checkpoint training: kill this process at
        #    any point and re-run — it resumes from the last atomic
        #    checkpoint and ends bit-identical to an uninterrupted run.
        model = build()
        res = fit_best_resumable(
            model, ArrayLoader(tr, 16), Adam(0.01), "cross_entropy",
            epochs=20, chunk_epochs=5, val_loader=ArrayLoader(va, 16),
            checkpoint_dir=os.path.join(tmp, "ckpt"))
        print(f"resumable fit_best: best epoch {res['best_epoch']} "
              f"score {res['best_score']:.4f} ({res['epochs_run']} epochs)")

        # 2. Ahead-of-time serving artifact: the full fused forward with
        #    parameters baked in, one StableHLO blob lowered for cpu+tpu,
        #    symbolic batch dimension. The serving side needs no model
        #    code, no params file, no tracing.
        path = export_compiled(model, os.path.join(tmp, "model.stablehlo"))
        run = load_compiled(path)
        for batch in (1, 32):
            probs = run(X[:batch, :4], X[:batch, 4:])[0]   # (E+1, b, 2)
            print(f"AOT artifact @batch {batch}: final-step p(+) = "
                  f"{np.asarray(probs)[-1, :3, 1].round(3)}")

    # 3. Whole experiments as one program: every cross-validation fold
    #    trains simultaneously under jax.vmap; pass mesh=/fold_axis= to
    #    shard the fold dimension over devices (zero cross-fold
    #    collectives). See experiments.kfold_fit_best and docs/SCALING.md.
    from multimodn_tpu.experiments import kfold_fit_best
    folds = []
    for k in range(2):
        ftr, fva, _ = ds.random_split((0.7, 0.3, 0), seed=k)
        folds.append((ArrayLoader(ftr, 16), ArrayLoader(fva, 16)))
    results = kfold_fit_best(build, folds, Adam(0.01), "cross_entropy",
                             epochs=5)
    for f, r in enumerate(results):
        print(f"fold {f}: best epoch {r['best_epoch']} "
              f"score {r['best_score']:.4f}")


if __name__ == "__main__":
    main()
