#!/usr/bin/env python3
"""Generate the shared miniature soak corpus (fake mpi3d + mpii).

One recipe for every soak script (soak_full_schedule.sh,
soak_chatterbox.sh): both guard on the same $SOAK_DATA directory, so the
recipe MUST live in one place — divergent per-script copies would silently
reuse whichever corpus was generated first. Idempotent: exits 0 without
touching anything if the corpus already exists.
"""

import os
import sys

# script execution puts scripts/ (not the repo root) at sys.path[0] and
# margipose_tpu is not pip-installed here
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

base = os.environ.get('SOAK_DATA', '/tmp/soak_data')
if os.path.isdir(os.path.join(base, 'mpi3d', 'train')):
    print(f'soak corpus already at {base}')
    sys.exit(0)

from margipose_tpu.data.fake_mpi3d import generate_fake_mpi3d
from margipose_tpu.data.fakes import generate_fake_mpii

# larger than the test fakes so long soaks see some variety
generate_fake_mpi3d(os.path.join(base, 'mpi3d', 'train'),
                    seqs=((1, 1), (2, 1)), camera_ids=(0, 2), n_frames=6)
generate_fake_mpi3d(os.path.join(base, 'mpi3d', 'val'),
                    seqs=((3, 1),), camera_ids=(0,), n_frames=4, seed=1)
generate_fake_mpii(os.path.join(base, 'mpii'), n_train=16, n_val=4,
                   img_size=512)
print(f'soak corpus at {base}')
