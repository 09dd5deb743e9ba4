#!/bin/bash
# Train launcher (reference-compatible invocation surface).
SCENE=glass
EXPERIMENT=refractive-nerf-tpu
TRAIN_DIR=${TRAIN_DIR:-./logs/$EXPERIMENT/${SCENE}}
DATA_DIR=${DATA_DIR:-./data/real/${SCENE}}

python -m train \
  --data_dir=$DATA_DIR \
  --train_dir=$TRAIN_DIR \
  --config=configs/"${SCENE}" \
  --gin_file=configs/${SCENE}.gin \
  --stage="radiance_pe-bkgd_bg-smooth-l2-1.0-ps-128_w-mod-bd-0.05_blur-5-3.0_uni384"
