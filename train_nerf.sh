#!/bin/bash
# Train launcher (reference-compatible invocation surface).
SCENE=ship_skydome-bkgd_no-partial-reflect_cycles
EXPERIMENT=refractive-nerf-tpu
TRAIN_DIR=${TRAIN_DIR:-./logs/$EXPERIMENT/${SCENE}}
DATA_DIR=${DATA_DIR:-./data/synthetic/nerf/${SCENE}}

python -m train \
  --data_dir=$DATA_DIR \
  --train_dir=$TRAIN_DIR \
  --config=configs/"${SCENE}" \
  --gin_file=configs/${SCENE}.gin \
  --stage="radiance_pe-bkgd_bg-smooth-l2-1.0-ps-128_wo-U"
