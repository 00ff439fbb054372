#!/usr/bin/env bash
# Smoke-run every pipeline for 5 epochs with persistence off — mirrors the
# reference's only automated test (reference pipelines/test_all_pipelines.sh).
# MIMIC pipelines run too (synthetic embeddings make them hermetic here,
# unlike the reference which requires the private HAIM CSV).
set -e
cd "$(dirname "$0")/.."
# Smoke runs must never append rows to the tracked protocol CSVs under
# nips/results/ — redirect pipeline artifact writes to a scratch root.
export MULTIMODN_STORAGE="${MULTIMODN_STORAGE:-$(mktemp -d)}"
for pipeline in pipelines/titanic/*_pipeline.py; do
    echo "=== $pipeline ==="
    python "$pipeline" -e 5 -m false -y false -p false -r false
done
for pipeline in pipelines/mimic/mimic_single_task_pipeline.py \
                pipelines/mimic/mimic_multi_task_pipeline.py \
                pipelines/mimic/mimic_transformer_pipeline.py; do
    echo "=== $pipeline ==="
    python "$pipeline" -e 5 -m false
done
echo "=== pipelines/mimic/mimic_single_task_mnar_missingness_pipeline.py ==="
python pipelines/mimic/mimic_single_task_mnar_missingness_pipeline.py -p 20 -e 5
echo "ALL PIPELINES PASSED"
