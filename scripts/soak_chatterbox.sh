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

if [ ! -d "$DATA/mpi3d/train" ]; then
  python - <<'EOF'
import os
from margipose_tpu.data.fake_mpi3d import generate_fake_mpi3d
from margipose_tpu.data.fakes import generate_fake_mpii

base = os.environ.get('SOAK_DATA', '/tmp/soak_data')
generate_fake_mpi3d(os.path.join(base, 'mpi3d', 'train'),
                    seqs=((1, 1), (2, 1)), camera_ids=(0, 2), n_frames=6)
generate_fake_mpi3d(os.path.join(base, 'mpi3d', 'val'),
                    seqs=((3, 1),), camera_ids=(0,), n_frames=4, seed=1)
generate_fake_mpii(os.path.join(base, 'mpii'), n_train=16, n_val=4,
                   img_size=512)
print('soak corpus at', base)
EOF
fi

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
