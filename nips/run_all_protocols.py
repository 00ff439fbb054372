#!/usr/bin/env python
"""Regenerate ALL published MIMIC protocol CSVs under nips/results/.

One python process (the TPU tunnel claim is paid once — CLAUDE.md), four
stages, all at full protocol scale (reference experiment loops,
``mimic_single_task_pipeline.py:44-246`` / ``mnar_missingness_pipeline.py``):

1. single-task:  2 targets x 5 patient-stratified folds x 100 epochs,
   MultiModN vs HAIM on identical folds, best-epoch selection on val
   AUROC+BAC -> ``mimic_single_task_(auc + bac).csv``
2. multi-task:   same protocol, D=2 joint decoders ->
   ``mimic_multi_task_(auc + bac).csv``
3. MNAR batch:   the full robustness grid (6 miss levels, dual clean/flipped
   tests) at the reference's batch-granular NaN skip ->
   ``mimic_single_task_mnar_missingness_(auc + bac).csv`` +
   ``mnar_robustness_summary_batch.csv`` / ``mnar_protocol_rows_batch.csv``
4. MNAR sample:  the per-sample-skip variant (mechanism study, RESULTS.md);
   its pipeline rows are diverted to a scratch storage root and copied to
   ``..._(auc + bac)__nan_skip_sample.csv`` so the two variants' shared
   CSVs never mix.

Existing shared CSVs are DELETED first: the pipelines' results files are
append-only across runs (reference ``save_results`` semantics), so a regen
must start from empty files or stale/smoke rows survive.

Synthetic cohort: 300 patients (~600 stays), the scale used by the round-3
MNAR protocol. ``nan_skip='batch'`` everywhere (the reference's exact skip
granularity — quirk #2).
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")
SHARED = [
    "mimic_single_task_(auc + bac).csv",
    "mimic_multi_task_(auc + bac).csv",
    "mimic_single_task_mnar_missingness_(auc + bac).csv",
]


def main(patients: int = 300, epochs: int = 100, nfold: int = 5):
    # Fail fast if a stale env redirect would silently send stage 1-3 rows
    # to a scratch dir instead of the tracked deliverables.
    if os.environ.get("MULTIMODN_STORAGE"):
        raise SystemExit("unset MULTIMODN_STORAGE: this script must write "
                         "the real nips/results deliverables")

    from pipelines.mimic.common import MimicConfig

    os.makedirs(RESULTS, exist_ok=True)
    for f in SHARED:
        p = os.path.join(RESULTS, f)
        if os.path.isfile(p):
            os.remove(p)
            print(f"removed stale {f}")

    # TPU probe: a tiny matmul up front so a wedged tunnel claim surfaces
    # here, not 10 minutes into stage 1 (CLAUDE.md).
    import jax
    import jax.numpy as jnp
    t0 = time.time()
    x = jnp.ones((8, 8))
    float((x @ x).sum())
    print(f"[probe] {jax.devices()} matmul ok in {time.time() - t0:.1f}s",
          flush=True)

    def cfg():
        return MimicConfig(epochs=epochs, nfold=nfold,
                           synthetic_patients=patients, nan_skip="batch")

    from pipelines.mimic.mimic_single_task_pipeline import main as single_main
    t0 = time.time()
    single_main(["-s", "0"], cfg())
    print(f"[single-task] done in {time.time() - t0:.1f}s", flush=True)

    from pipelines.mimic.mimic_multi_task_pipeline import main as multi_main
    t0 = time.time()
    multi_main(["-s", "0"], cfg())
    print(f"[multi-task] done in {time.time() - t0:.1f}s", flush=True)

    from nips.run_mnar_protocol import main as mnar_main
    t0 = time.time()
    mnar_main(patients=patients, epochs=epochs, nfold=nfold,
              nan_skip="batch")
    print(f"[mnar batch] done in {time.time() - t0:.1f}s", flush=True)

    # Sample-skip variant: divert the pipeline's shared CSV to scratch, keep
    # the runner's summary/rows outputs (they are tag-suffixed already).
    scratch = tempfile.mkdtemp(prefix="mnar_sample_storage_")
    os.environ["MULTIMODN_STORAGE"] = scratch
    try:
        t0 = time.time()
        mnar_main(patients=patients, epochs=epochs, nfold=nfold,
                  nan_skip="sample")
        print(f"[mnar sample] done in {time.time() - t0:.1f}s", flush=True)
    finally:
        del os.environ["MULTIMODN_STORAGE"]
    diverted = os.path.join(scratch, "nips", "results", SHARED[2])
    shutil.copy(diverted, os.path.join(
        RESULTS,
        "mimic_single_task_mnar_missingness_(auc + bac)"
        "__nan_skip_sample.csv"))
    shutil.rmtree(scratch)
    print("all protocols regenerated", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
