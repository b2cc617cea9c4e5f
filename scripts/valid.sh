#!/bin/bash
# Validation sweep over evaluation datasets (complex scenes, tank, and the
# momentum / momentum_g conservation scenes used to demonstrate the ASCC
# guarantee), mirroring the reference validation protocol.
set -e
CFG=${CFG:-configs/WBC-SPH.yml}
VERSION=${VERSION:-2d}
ROOT=${DATASET_ROOT:-datasets/valid}

python run_pipeline.py --cfg_file "$CFG" --dataset_path "$ROOT/complex2" \
    --split valid --pipeline.version "$VERSION" \
    --pipeline.data_generator.valid.time_end 800 \
    --pipeline.data_generator.valid.random_start 0
python run_pipeline.py --cfg_file "$CFG" --dataset_path "$ROOT/tank" \
    --split valid --pipeline.version "$VERSION" \
    --pipeline.data_generator.valid.time_end 400 \
    --pipeline.data_generator.valid.random_start 0
python run_pipeline.py --cfg_file "$CFG" --dataset_path "$ROOT/momentum" \
    --split valid --pipeline.version "$VERSION" \
    --pipeline.data_generator.valid.time_end 200 \
    --pipeline.data_generator.valid.random_start 0
python run_pipeline.py --cfg_file "$CFG" --dataset_path "$ROOT/momentum_g" \
    --split valid --pipeline.version "$VERSION" \
    --pipeline.data_generator.valid.time_end 200 \
    --pipeline.data_generator.valid.random_start 0
