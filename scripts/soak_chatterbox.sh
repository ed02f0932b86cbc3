#!/bin/sh
# Chatterbox convergence soak (VERDICT r4 weak #5): the SECOND model family
# trained for real on the chip — production recipe shape (1cycle, bf16 on
# TPU, full host augmentation, per-epoch checkpoints) on the fake mpi3d
# corpus, followed by a restore-verified eval of the saved checkpoint.
# Chatterbox hardcodes 256px input (its down/up head geometry fixes 32x32
# heatmaps — reference: src/margipose/models/chatterbox_model.py:86-220),
# so unlike soak_full_schedule.sh the input cannot be miniaturised.
#
# Results recorded in BASELINE.md "Chatterbox convergence soak (round 5)".
set -e
cd "$(dirname "$0")/.."

DATA=${SOAK_DATA:-/tmp/soak_data}
OUT=${SOAK_OUT:-/tmp/soak_cb_out}

# shared idempotent corpus recipe — see scripts/make_soak_corpus.py
SOAK_DATA="$DATA" python scripts/make_soak_corpus.py

rm -rf "$OUT"
MARGIPOSE_BASE_DATA_DIR="$DATA" ./run.sh train with chatterbox_model 1cycle \
  epochs=${SOAK_EPOCHS:-6} batch_size=16 train_examples=320 val_examples=0 \
  'train_datasets=["mpi3d-train"]' 'val_datasets=[]' \
  lr=0.1 num_workers=2 metrics_every=4 checkpoint_every=1 use_aug=True \
  experiment_id=soakcb out_dir="$OUT"

# restore-verify: the saved checkpoint must strict-load and evaluate
MARGIPOSE_BASE_DATA_DIR="$DATA" ./run.sh eval \
  --model "$OUT/soakcb/model-latest" --dataset mpi3d-val --batch-size 4
echo "chatterbox soak done: $OUT/soakcb"
