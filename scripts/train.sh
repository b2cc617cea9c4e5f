#!/bin/bash
# Train the flagship SymNet (equivalent of the reference SLURM script).
set -e
CFG=${CFG:-configs/WBC-SPH.yml}
python run_pipeline.py --cfg_file "$CFG" \
    ${DATASET_PATH:+--dataset_path "$DATASET_PATH"} \
    --pipeline.version "${VERSION:-2d}" --split train "$@"
