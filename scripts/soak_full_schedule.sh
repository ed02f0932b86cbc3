#!/bin/sh
# Full production-schedule soak (VERDICT r3 item 4): traverse the ENTIRE
# 150-epoch 1cycle schedule — including the final-10% anneal to lr_max/1e4
# and the momentum swap back (reference: src/margipose/hyperparam_scheduler.py:6-21)
# — at miniature scale on the real chip, with the flagship mixed
# mpi3d+mpii recipe shape and device-aug crop-ship.
#
# Results recorded in BASELINE.md "Full-schedule soak".
set -e
cd "$(dirname "$0")/.."

DATA=${SOAK_DATA:-/tmp/soak_data}
OUT=${SOAK_OUT:-/tmp/soak_out}

# shared idempotent corpus recipe — see scripts/make_soak_corpus.py
SOAK_DATA="$DATA" python scripts/make_soak_corpus.py

rm -rf "$OUT"
MARGIPOSE_BASE_DATA_DIR="$DATA" ./run.sh train with margipose_model 1cycle \
  "model_desc={'type':'margipose','version':'6.0.1','settings':{'n_stages':2,'axis_permutation':True,'feature_extractor':'resnet18','pixelwise_loss':'jsd','input_size':128}}" \
  epochs=150 batch_size=8 train_examples=64 val_examples=0 \
  'train_datasets=["mpi3d-trainval","mpii-trainval"]' 'val_datasets=[]' \
  lr=0.2 num_workers=2 metrics_every=4 checkpoint_every=1 \
  device_aug=True device_aug_canvas=192 use_aug=True \
  experiment_id=soak150 out_dir="$OUT"
echo "soak done: $OUT/soak150"
