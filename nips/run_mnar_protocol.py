#!/usr/bin/env python
"""Full MNAR robustness protocol (VERDICT r2 next-#2).

Runs the complete paper protocol from the reference's MNAR experiment
(``mimic_single_task_mnar_missingness_pipeline.py:218-242``): 2 targets x
5 folds x 100 epochs x miss_perc in {0, 20, 40, 60, 80, 100}, MultiModN vs
HAIM, each MNAR level tested both on clean data (both=False) and on the
flipped-class degraded data (both=True — the catastrophic-failure test,
reference README.md:9).

Data is the synthetic HAIM-shaped MIMIC stand-in (the real embeddings CSV
is private), so the result is the paper's qualitative claim reproduced
DIRECTIONALLY: MultiModN's degraded-test AUROC should stay roughly flat as
missingness grows while HAIM's collapses.

Outputs:
- per-run rows appended by the pipeline to
  ``nips/results/mimic_single_task_mnar_missingness_(auc + bac).csv``
- ``nips/results/mnar_robustness_summary.csv``: mean/std test AUROC by
  (model, both, miss_perc) over targets x folds
- a printed markdown table for RESULTS.md

Runtime: minutes on one TPU v5e chip (each target's 5-fold x 100-epoch
cross-validation is ONE vmapped dispatch).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import pandas as pd

MISS_PERCS = (0.0, 20.0, 40.0, 60.0, 80.0, 100.0)


def main(patients: int = 300, epochs: int = 100, nfold: int = 5,
         nan_skip: str = "batch", presence_penalty: float = 0.0):
    """``nan_skip='batch'`` is the reference's exact skip granularity and
    the protocol's headline setting (see MimicConfig.nan_skip); pass
    'sample' to measure the per-sample-skip variant, and
    ``presence_penalty>0`` with it for the round-4 mitigation variant
    (summary tagged ``sample_pp<lambda>``)."""
    from pipelines.mimic.common import MimicConfig
    from pipelines.mimic.mimic_single_task_mnar_missingness_pipeline import \
        main as mnar_main

    rows = []
    t_total = time.time()
    for mp in MISS_PERCS:
        cfg = MimicConfig(epochs=epochs, nfold=nfold,
                          synthetic_patients=patients, nan_skip=nan_skip,
                          presence_penalty=presence_penalty)
        t0 = time.time()
        res = mnar_main(["-p", str(mp), "-s", "0"], cfg)
        dt = time.time() - t0
        for model, target, fold, both, auc in res:
            rows.append({"model": model, "target": target, "fold": fold,
                         "both": both, "miss_perc": mp, "test_auc": auc})
        print(f"miss_perc={mp:5.1f}: {len(res)} rows in {dt:.1f}s",
              flush=True)
    print(f"protocol total: {time.time() - t_total:.1f}s")

    df = pd.DataFrame(rows)
    # both=None (miss_perc=0 clean-only runs) -> label as clean.
    df["both"] = df["both"].map({True: True, False: False, None: False})
    summary = (df.groupby(["model", "both", "miss_perc"])["test_auc"]
               .agg(["mean", "std", "count"]).reset_index())
    # Guard the protocol artifacts: runs below protocol scale (smoke tests,
    # debugging) write to a "_smoke" filename so they can never clobber the
    # published full-protocol summaries.
    variant = nan_skip if not presence_penalty \
        else f"{nan_skip}_pp{presence_penalty:g}"
    tag = variant if (patients >= 300 and epochs >= 100 and nfold >= 5) \
        else f"{variant}_smoke"
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", f"mnar_robustness_summary_{tag}.csv")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    summary.to_csv(out, index=False)
    print(f"wrote {out}")
    # Self-contained per-run record for this variant (the pipeline's shared
    # "(auc + bac)" CSV is append-only across ALL runs, reference-style, so
    # it cannot distinguish nan_skip variants).
    rows_out = out.replace("mnar_robustness_summary_",
                           "mnar_protocol_rows_")
    df.to_csv(rows_out, index=False)
    print(f"wrote {rows_out}")

    # Markdown robustness table: degraded-test (both=True) AUROC per level.
    print(f"\n### MNAR robustness, variant={variant} (flipped-class "
          "degraded test, mean AUROC over targets x folds)\n")
    header = "| model | " + " | ".join(f"{int(mp)}%" for mp in MISS_PERCS) \
        + " |"
    print(header)
    print("|---" * (len(MISS_PERCS) + 1) + "|")
    for model in ("modn", "haim"):
        cells = []
        for mp in MISS_PERCS:
            sel = summary[(summary["model"] == model)
                          & (summary["miss_perc"] == mp)
                          & (summary["both"] == (True if mp > 0 else False))]
            cells.append(f"{float(sel['mean'].iloc[0]):.3f}"
                         if len(sel) else "—")
        print(f"| {model} | " + " | ".join(cells) + " |")
    print("\n(clean-test rows in the summary CSV under both=False)")
    return summary


if __name__ == "__main__":
    # First three args are ints (patients, epochs, nfold); the optional
    # fourth is the nan_skip string ('batch'|'sample') — int()-coercing all
    # argv made the documented 'sample' variant unreachable from the CLI —
    # and the optional fifth is presence_penalty (float).
    _a = sys.argv[1:]
    main(*([int(x) for x in _a[:3]] + _a[3:4]
           + [float(x) for x in _a[4:5]]))
