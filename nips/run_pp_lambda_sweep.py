#!/usr/bin/env python
"""presence_penalty lambda-sensitivity sweep (VERDICT r4 next-#1).

Runs the FULL MNAR protocol (run_mnar_protocol.main: 2 targets x 5 folds x
100 epochs x 6 miss levels, MultiModN vs HAIM, clean + flipped-class tests)
under ``nan_skip='sample'`` for each ``presence_penalty`` lambda given on
the command line (default: 5 10 50 100 — lambda=0 and 25 already published
as mnar_robustness_summary_sample{,_pp25}.csv).

Each lambda writes its own ``mnar_robustness_summary_sample_pp<λ>.csv`` +
per-run rows CSV via run_mnar_protocol's artifact guard. All lambdas run
in ONE process so the TPU claim + compile cache are paid once
(CLAUDE.md: batch all TPU work for a session into one process).

Experiment being swept:
/root/reference/pipelines/mimic/mimic_single_task_mnar_missingness_pipeline.py:218-242
"""
from __future__ import annotations

import os
import sys
import time

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from nips.run_mnar_protocol import main as protocol_main


def main(lambdas=(5.0, 10.0, 50.0, 100.0), patients: int = 300,
         epochs: int = 100, nfold: int = 5):
    t0 = time.time()
    for lam in lambdas:
        t = time.time()
        print(f"=== lambda={lam:g} ===", flush=True)
        protocol_main(patients=patients, epochs=epochs, nfold=nfold,
                      nan_skip="sample", presence_penalty=float(lam))
        print(f"lambda={lam:g} done in {time.time() - t:.1f}s", flush=True)
    print(f"sweep total: {time.time() - t0:.1f}s")


if __name__ == "__main__":
    _a = [float(x) for x in sys.argv[1:]]
    main(lambdas=_a or (5.0, 10.0, 50.0, 100.0))
