#!/bin/bash
# Voxelizer launcher (reference-compatible invocation surface).
SCENE=glass
EXPERIMENT=refractive-nerf-tpu
TRAIN_DIR=${TRAIN_DIR:-./logs/$EXPERIMENT/${SCENE}}
DATA_DIR=${DATA_DIR:-./data/real/${SCENE}}

python -m voxelize_mesh \
  --data_dir=$DATA_DIR \
  --train_dir=$TRAIN_DIR \
  --config=configs/"${SCENE}" \
  --gin_file=configs/${SCENE}.gin \
  --num_samples=4 --num_voxels=128 --extent=1.5 --threshold=1.165
