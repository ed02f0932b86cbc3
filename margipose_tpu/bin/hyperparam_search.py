#!/usr/bin/env python3
"""Leslie-Smith LR range test (reference: src/margipose/bin/hyperparam_search.py).

Sweeps learning rate geometrically from lr_min to lr_max over at most 1000
iterations, tracking EMA-smoothed loss; stops when the loss diverges to 4x
its observed minimum. Writes a loss-vs-lr curve (PNG + CSV).

    margipose hyperparams with margipose_model synthetic lr_min=1e-5 lr_max=10
"""

from __future__ import annotations

import datetime
from os import makedirs, path

import jax
import numpy as np
import optax

from margipose_tpu.cli import Subcommand
from margipose_tpu.config import Experiment
from margipose_tpu.data.loader import device_prefetch
from margipose_tpu.models import (
    Default_Chatterbox_Desc,
    Default_MargiPose_Desc,
    create_model,
    default_data_specs,
)
from margipose_tpu.train.helpers import create_train_dataloader
from margipose_tpu.train.steps import create_train_state, make_train_step
from margipose_tpu.utils import seed_all

ex = Experiment()
ex.add_named_config('margipose_model', model_desc=Default_MargiPose_Desc)
ex.add_named_config('chatterbox_model', model_desc=Default_Chatterbox_Desc)
# dataset presets are an extension (the reference hyperparams bin has only
# the model presets); 'mpi3d' matches the reference's default dataset pair
ex.add_named_config('mpi3d', train_datasets=['mpi3d-train', 'mpii-train'])
ex.add_named_config('h36m', train_datasets=['h36m-trainval', 'mpii-trainval'])
ex.add_named_config('synthetic', train_datasets=['synthetic-512'])

# defaults pinned against the reference's executed config block
# (reference: src/margipose/bin/hyperparam_search.py:58-69;
# tests/test_reference_bins.py); model_desc/seed/out_dir/use_aug/num_workers
# are extensions (the reference requires `with <model>` and seeds via sacred)
ex.add_config(
    seed=12345,
    model_desc=Default_MargiPose_Desc,
    train_datasets=['mpi3d-train', 'mpii-train'],
    batch_size=32,
    lr_min=1e-1,
    lr_max=1e2,
    max_iters=1000,
    ema_beta=0.99,
    weight_decay=0.0,
    momentum=0.9,
    out_dir='out',
    use_aug=True,
    num_workers=4,
)


class LRCurveAccumulator:
    """EMA smoothing + divergence stop of the Leslie-Smith range test,
    exactly as the reference's search loop applies them (reference:
    src/margipose/bin/hyperparam_search.py:137-148; executed-reference
    trajectory pin in tests/test_reference_bins.py): bias-corrected EMA by
    iteration count, divergence checked against the PREVIOUS minimum
    (guarded on it being positive), and a diverging point neither recorded
    in the curve nor allowed to update the minimum."""

    def __init__(self, beta: float):
        self.beta = beta
        self.avg_loss = 0.0
        self.min_loss = float('inf')
        self.smoothed = []  # recorded curve (excludes the diverging point)
        self.stopped = False

    def add(self, i: int, loss: float) -> bool:
        """Fold in the raw loss of iteration ``i`` (0-based); returns True
        when the sweep should stop (divergence or non-finite loss)."""
        if not np.isfinite(loss):
            self.stopped = True
            return True
        self.avg_loss = self.beta * self.avg_loss + (1 - self.beta) * loss
        smoothed = self.avg_loss / (1 - self.beta ** (i + 1))
        if self.min_loss > 0 and smoothed > 4 * self.min_loss:
            self.stopped = True
            return True
        self.min_loss = min(smoothed, self.min_loss)
        self.smoothed.append(smoothed)
        return False


def run_lr_range_test(cfg: dict) -> dict:
    seed_all(cfg['seed'])
    model = create_model(cfg['model_desc'])
    data_specs = default_data_specs()

    loader = create_train_dataloader(
        cfg['train_datasets'], data_specs, cfg['batch_size'],
        cfg['max_iters'] * cfg['batch_size'], cfg['use_aug'],
        num_workers=cfg['num_workers'], seed=cfg['seed'])

    lrs = np.geomspace(cfg['lr_min'], cfg['lr_max'], cfg['max_iters'])
    lr_schedule = lambda count: jax.numpy.asarray(lrs)[
        jax.numpy.clip(count, 0, len(lrs) - 1).astype(int)]

    def sgd(learning_rate):
        # torch.optim.SGD semantics (the reference's optimiser, reference:
        # src/margipose/bin/hyperparam_search.py:105): weight decay added
        # to the gradient BEFORE the momentum buffer
        opt = optax.sgd(learning_rate, momentum=cfg['momentum'])
        if cfg.get('weight_decay'):
            opt = optax.chain(
                optax.add_decayed_weights(cfg['weight_decay']), opt)
        return opt

    optimiser = optax.inject_hyperparams(sgd)(learning_rate=lr_schedule)

    h, w = data_specs.input_specs.height, data_specs.input_specs.width
    state = create_train_state(model, jax.random.PRNGKey(cfg['seed']), optimiser,
                               input_shape=(1, h, w, 3))
    train_step = make_train_step(
        model, optimiser, cfg['model_desc']['settings'].get('pixelwise_loss', 'jsd'),
        donate=False)

    used_lrs = []
    curve = LRCurveAccumulator(cfg['ema_beta'])
    losses = curve.smoothed

    # Device->host loss reads cost a full relay round-trip on remote TPU
    # runtimes; keep losses on device and drain them in batches of 8, so
    # the divergence check lags by at most 7 iterations.
    pending = []
    drained_upto = 0  # iteration index of the first un-drained loss
    stop = False

    def process_pending():
        nonlocal stop, drained_upto
        vals = np.asarray(jnp.stack(pending))
        pending.clear()
        base_i = drained_upto
        drained_upto += len(vals)
        for k, loss in enumerate(vals):
            i = base_i + k
            loss = float(loss)
            if curve.add(i, loss):
                reason = ('non-finite loss' if not np.isfinite(loss) else
                          f'loss diverged (> 4x {curve.min_loss:.4g})')
                print(f'stopping at iter {i}: {reason}')
                stop = True
                return
            used_lrs.append(float(lrs[i]))
            if i % 25 == 0:
                print(f'iter {i:4d}  lr={lrs[i]:.3e}  '
                      f'loss={curve.smoothed[-1]:.5f}', flush=True)

    import jax.numpy as jnp

    for i, batch in enumerate(device_prefetch(iter(loader))):
        if i >= cfg['max_iters'] or stop:
            break
        device_batch = {
            'input': batch['input'], 'target': batch['target'],
            'joint_mask': batch['joint_mask'],
            'valid_depth': batch['valid_depth'],
        }
        state, metrics = train_step(state, device_batch)
        pending.append(metrics['loss'])
        if len(pending) >= 8:
            process_pending()
    if pending and not stop:
        process_pending()

    out = {'lrs': used_lrs, 'losses': losses}
    if cfg['out_dir']:
        exp_dir = path.join(
            cfg['out_dir'],
            'lrfind-' + datetime.datetime.now().strftime('%Y%m%d-%H%M%S'))
        makedirs(exp_dir, exist_ok=True)
        np.savetxt(path.join(exp_dir, 'lr_curve.csv'),
                   np.stack([used_lrs, losses], 1), delimiter=',',
                   header='lr,loss')
        try:
            import matplotlib

            matplotlib.use('Agg')
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots()
            ax.plot(used_lrs, losses)
            ax.set_xscale('log')
            ax.set_xlabel('learning rate')
            ax.set_ylabel('smoothed loss')
            fig.savefig(path.join(exp_dir, 'lr_curve.png'), dpi=100)
            print(f'wrote {exp_dir}/lr_curve.png')
        except Exception as e:  # plotting is best-effort
            print(f'plotting failed: {e}')
    return out


def main(argv, common_opts):
    cfg = ex.parse(argv[1:])
    return run_lr_range_test(cfg)


Hyperparams_Subcommand = Subcommand(
    name='hyperparams', func=main, help='run hyperparameter search')

if __name__ == '__main__':
    Hyperparams_Subcommand.run()
