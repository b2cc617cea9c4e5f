#!/bin/bash
# Test rollouts + hdf5 dumps (equivalent of the reference test script).
set -e
CFG=${CFG:-configs/WBC-SPH.yml}
python run_pipeline.py --cfg_file "$CFG" \
    ${DATASET_PATH:+--dataset_path "$DATASET_PATH"} --split test "$@"
