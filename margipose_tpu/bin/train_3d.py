#!/usr/bin/env python3
"""Train a 3D pose model (reference: src/margipose/bin/train_3d.py).

Usage mirrors the reference preset names:

    margipose train with margipose_model mpi3d
    margipose train with chatterbox_model h36m 1cycle quick
    margipose train with margipose_model synthetic epochs=2 batch_size=8
"""

from __future__ import annotations

import datetime
import json
import sys
import traceback
from os import makedirs, path

import jax
import numpy as np

from margipose_tpu.cli import Subcommand
from margipose_tpu.config import Experiment
from margipose_tpu.data.loader import device_prefetch
from margipose_tpu.geometry.coords import ensure_homogeneous
from margipose_tpu.models import (
    Default_Chatterbox_Desc,
    Default_MargiPose_Desc,
    create_model,
    data_specs_for_desc,
)
from margipose_tpu.parallel import batch_sharding, make_mesh, shard_variables
from margipose_tpu.train import checkpoint as ckpt
from margipose_tpu.train.helpers import (
    create_train_dataloader,
    create_val_dataloader,
    save_image_grid,
    visualise_predictions,
)
from margipose_tpu.train.meters import generator_timer, make_train_reporter, timer
from margipose_tpu.train.schedules import make_optimiser
from margipose_tpu.train.steps import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from margipose_tpu.utils import init_algorithms, seed_all

ex = Experiment()

# Model presets (reference: src/margipose/bin/train_3d.py:230-231)
ex.add_named_config('margipose_model', model_desc=Default_MargiPose_Desc)
ex.add_named_config('chatterbox_model', model_desc=Default_Chatterbox_Desc)

# Optimiser presets (reference: src/margipose/bin/train_3d.py:234-239)
ex.add_named_config('rmsprop', optim_algorithm='rmsprop', epochs=150, lr=2.5e-3,
                    lr_milestones=[80, 140], lr_gamma=0.1)
ex.add_named_config('1cycle', optim_algorithm='1cycle', epochs=150, lr=1.0,
                    lr_milestones=None, lr_gamma=None)
ex.add_named_config('sgd_simple', optim_algorithm='sgd_simple', epochs=150, lr=0.2,
                    lr_milestones=None, lr_gamma=None)

# Dataset presets (reference: src/margipose/bin/train_3d.py:242-243)
ex.add_named_config('mpi3d', train_datasets=['mpi3d-trainval', 'mpii-trainval'],
                    val_datasets=[])
ex.add_named_config('h36m', train_datasets=['h36m-trainval', 'mpii-trainval'],
                    val_datasets=[])
ex.add_named_config('synthetic', train_datasets=['synthetic-512'],
                    val_datasets=['synthetic-64@1'])

# Debug preset (reference: src/margipose/bin/train_3d.py:246-247)
ex.add_named_config('quick', out_dir='', epochs=10, tags=['quick'], quick=True,
                    train_examples=256, val_examples=128)

ex.add_config(
    seed=12345,
    model_desc=Default_MargiPose_Desc,
    optim_algorithm='1cycle', epochs=150, lr=1.0, lr_milestones=None, lr_gamma=None,
    train_datasets=['mpi3d-trainval', 'mpii-trainval'], val_datasets=[],
    out_dir='out',
    batch_size=32,
    tags=[],
    quick=False,
    experiment_id=None,
    weights=None,             # warm-start model weights only (reference semantics)
    pretrained_stem=None,     # path to an ImageNet backbone state_dict .pth
                              # (pretrainedmodels inceptionv4 / torchvision
                              # resnet); initialises in_cnn like the
                              # reference's pretrained=True stems (reference:
                              # src/margipose/models/margipose_model.py:104-138)
    resume=None,              # checkpoint dir: restore FULL train state
                              # (params, optimiser, step, epoch) and continue
    deterministic=False,
    train_examples=32000,
    val_examples=1600,
    use_aug=True,
    preserve_root_joint_at_univ_scale=False,
    num_workers=4,
    metrics_every=10,          # batches between host-side mpjpe/pck evals
    checkpoint_every=1,        # epochs between checkpoint saves
    precision=None,            # mixed-precision compute dtype; None resolves
                               # lazily to bfloat16 on TPU / float32 elsewhere
                               # (must NOT touch jax at import time — that
                               # would initialise the backend before the
                               # --device flag is applied). Master weights and
                               # BN stats stay float32 either way
                               # (margipose_tpu/parallel/precision.py)
    profile_steps=0,           # >0: capture a jax.profiler trace of that many
                               # batches in epoch 0 to <out_dir>/profile
    device_aug=False,          # apply the geometric/colour augmentation ON
                               # DEVICE as one fused XLA program over the
                               # batch (ops/image.py device_augment): the
                               # host loader ships raw uint8 frames +
                               # composed affines + colour params instead of
                               # warped tensors. Variable-size datasets
                               # (mpii, h36m) are letterboxed onto a shared
                               # canvas. BASELINE.md north-star item.
    device_aug_canvas=0,       # >0: crop-ship mode — ship only each
                               # example's affine source region letterboxed
                               # onto an NxN canvas (fewer host->device
                               # bytes than even host-side warping; the
                               # production setting, e.g. 384). 0: ship
                               # full frames (pixel-exact for fixed-size
                               # sources).
    prefetch_depth=2,          # host->device transfers kept in flight by
                               # device_prefetch; 1 paces transfers to
                               # reduce HBM/link contention with the
                               # running step, larger overlaps more
                               # (BASELINE.md train-step attribution
                               # experiment)
    ship='uint8',              # host-aug input transfer encoding: 'uint8'
                               # re-quantises the normalised input back to
                               # its exact source pixels before the
                               # host->device transfer (lossless — every
                               # host path rounds to uint8 right before
                               # normalising; ImageSpecs.requantize) and
                               # re-normalises on device, moving 4x fewer
                               # bytes per batch; 'float32' ships the
                               # host-normalised tensor as-is. Ignored
                               # under device_aug (raw frames already ship
                               # as uint8).
)


def run_training(cfg: dict) -> dict:
    import os

    # Multi-host TPU slice (e.g. the GKE manifest from deploy/tpu_vm.py):
    # the TPU runtime injects TPU_WORKER_HOSTNAMES; form the global mesh
    # before any other jax call.
    if ',' in os.environ.get('TPU_WORKER_HOSTNAMES', ''):
        try:
            jax.distributed.initialize()
            print(f'jax.distributed: process {jax.process_index()}'
                  f'/{jax.process_count()}')
        except Exception as e:  # already initialised, or single-host
            print(f'jax.distributed.initialize skipped: {e}')

    seed_all(cfg['seed'])
    init_algorithms(deterministic=cfg['deterministic'])
    cfg = dict(cfg)
    if cfg.get('precision') is None:
        cfg['precision'] = ('bfloat16' if jax.default_backend() == 'tpu'
                            else 'float32')

    experiment_id = cfg['experiment_id'] or datetime.datetime.now().strftime(
        '%Y%m%d-%H%M%S%f')
    if not cfg['experiment_id'] and jax.process_count() > 1:
        # Each process just generated its OWN microsecond timestamp, but
        # exp_out_dir must be shared: checkpoint saves are collective (the
        # orbax multi-host branch in train/checkpoint.py writes one shard
        # per process into ONE directory) — divergent ids would strand the
        # non-primary shards in directories nobody swaps or restores. Take
        # process 0's id everywhere.
        from jax.experimental import multihost_utils

        buf = np.frombuffer(experiment_id.encode().ljust(32), np.uint8)
        buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
        experiment_id = bytes(buf).decode().strip()
    exp_out_dir = None
    if cfg['out_dir']:
        exp_out_dir = path.join(cfg['out_dir'], experiment_id)
        makedirs(exp_out_dir, exist_ok=True)
    print(f'Experiment ID: {experiment_id}')

    # ---- Model ----
    model_desc = cfg['model_desc']
    init_variables = None
    resume_meta = None
    if cfg['resume'] is not None:
        # Full-state resume — fixes the reference's asymmetry of saving but
        # never restoring optimiser state and epoch
        # (reference: src/margipose/bin/train_3d.py:285-291,374-382).
        resume_meta = ckpt.load_meta(cfg['resume'])
        model_desc = resume_meta['model_desc']
    elif cfg['weights'] is not None:
        _, init_variables, model_desc = ckpt.load_model(cfg['weights'])
    model = create_model(model_desc)
    print(json.dumps(model_desc, sort_keys=True, indent=2))

    # ---- Data ----
    from margipose_tpu.data.mpi_inf_3dhp import MpiInf3dDataset

    MpiInf3dDataset.preserve_root_joint_at_univ_scale = \
        cfg['preserve_root_joint_at_univ_scale']

    data_specs = data_specs_for_desc(model_desc)
    # Per-host input sharding (SURVEY §5.8): each process loads
    # batch_size / process_count examples with an independently-seeded
    # sampler; device_prefetch assembles the global batch array via
    # jax.make_array_from_process_local_data.
    n_proc = jax.process_count()
    assert cfg['batch_size'] % n_proc == 0, (
        f"batch_size {cfg['batch_size']} must divide over {n_proc} processes")
    local_batch = cfg['batch_size'] // n_proc
    loader_seed = cfg['seed'] + 1021 * jax.process_index()
    train_loader = create_train_dataloader(
        cfg['train_datasets'], data_specs, local_batch,
        cfg['train_examples'] // n_proc, cfg['use_aug'],
        num_workers=cfg['num_workers'], seed=loader_seed,
        device_aug=cfg.get('device_aug', False),
        device_aug_canvas=cfg.get('device_aug_canvas', 0))
    val_loader = None
    if cfg['val_datasets']:
        val_loader = create_val_dataloader(
            cfg['val_datasets'], data_specs, local_batch,
            cfg['val_examples'] // n_proc,
            num_workers=cfg['num_workers'], seed=loader_seed)

    # ---- Mesh & optimiser ----
    mesh = make_mesh()
    n_devices = mesh.devices.size
    assert cfg['batch_size'] % n_devices == 0, (
        f"batch_size {cfg['batch_size']} must divide over {n_devices} devices")

    steps_per_epoch = len(train_loader)
    max_iters = cfg['epochs'] * steps_per_epoch
    optimiser = make_optimiser(
        cfg['optim_algorithm'], cfg['lr'], max_iters=max_iters,
        milestones=cfg['lr_milestones'], gamma=cfg['lr_gamma'],
        steps_per_epoch=steps_per_epoch)

    h = data_specs.input_specs.height
    w = data_specs.input_specs.width
    if (cfg.get('pretrained_stem') and init_variables is None
            and cfg['resume'] is None):
        import jax.numpy as jnp

        from margipose_tpu.train.torch_import import load_pretrained_stem

        variables = jax.jit(model.init)(
            jax.random.PRNGKey(cfg['seed']), jnp.zeros((1, h, w, 3), jnp.float32))
        init_variables = load_pretrained_stem(
            dict(variables), cfg['pretrained_stem'],
            model_desc['settings'].get('feature_extractor', 'inceptionv4'))
        print(f"initialised {model_desc['settings'].get('feature_extractor')} "
              f"stem from {cfg['pretrained_stem']}")
    state = create_train_state(
        model, jax.random.PRNGKey(cfg['seed']), optimiser,
        input_shape=(1, h, w, 3), variables=init_variables and dict(init_variables))
    if cfg['resume'] is not None:
        state = ckpt.restore_checkpoint(cfg['resume'], state)
    state = TrainState(
        step=state.step,
        params=shard_variables(state.params, mesh),
        batch_stats=shard_variables(state.batch_stats, mesh),
        opt_state=jax.device_put(state.opt_state),
    )
    # mesh passed through: pure-DP meshes run the steps under jax.shard_map
    # (see train.steps.shard_map_axis — the GSPMD partitioner replicates the
    # stacked columns' grouped convolutions instead of batch-sharding them)
    train_step = make_train_step(model, optimiser,
                                 model_desc['settings'].get('pixelwise_loss', 'jsd'),
                                 compute_dtype=cfg['precision'], mesh=mesh)
    eval_step = (make_eval_step(model,
                                model_desc['settings'].get('pixelwise_loss', 'jsd'),
                                compute_dtype=cfg['precision'], mesh=mesh)
                 if val_loader else None)
    data_sharding = batch_sharding(mesh)

    aug_step = None
    if cfg.get('device_aug'):
        import jax.numpy as jnp

        from margipose_tpu.ops.image import device_augment

        ispec = data_specs.input_specs
        aug_mean = tuple(ispec.mean) if ispec.mean is not None else (0., 0., 0.)
        aug_std = tuple(ispec.stddev) if ispec.stddev is not None else (1., 1., 1.)

        @jax.jit
        def aug_step(raw, affine, colour):
            # raw uint8 [B,H,W,3] (batch-sharded) -> normalised input
            # [B,h,w,3]; GSPMD keeps the output batch-sharded.
            x = raw.astype(jnp.float32) / 255.0
            return device_augment(x, affine, h, w, colour[:, 0], colour[:, 1],
                                  colour[:, 2], colour[:, 3], aug_mean, aug_std)

    ship_specs = None
    renorm_step = None
    if not cfg.get('device_aug') and cfg.get('ship', 'uint8') == 'uint8':
        # Host-aug inputs ship as their exact source uint8 pixels (lossless
        # — ImageSpecs.requantize) and are re-normalised on device: 4x
        # fewer host->device bytes per batch. device_aug mode already ships
        # raw uint8 frames, so this applies to the host-warped path only.
        from margipose_tpu.data.specs import device_renormalize

        ship_specs = data_specs.input_specs

        @jax.jit
        def renorm_step(u8):
            # uint8 [B,H,W,3] (batch-sharded) -> normalised float32 input;
            # GSPMD keeps the output batch-sharded.
            return device_renormalize(u8, ship_specs)

    # ---- Reporting ----
    # Multi-process runs share exp_out_dir (checkpoint saves are collective
    # — orbax coordinates per-shard writes across processes), but the file
    # sinks (metrics.jsonl, TensorBoard events), config.json, profiler
    # traces and example-image grids are written by process 0 only: they
    # carry no per-shard data and concurrent writers to the same files on a
    # shared filesystem would corrupt them.
    file_out_dir = exp_out_dir if jax.process_index() == 0 else None
    tel = make_train_reporter(with_val=val_loader is not None, out_dir=file_out_dir)
    if file_out_dir:
        with open(path.join(file_out_dir, 'config.json'), 'w') as f:
            json.dump({k: v for k, v in cfg.items()}, f, indent=2, sort_keys=True,
                      default=str)

    start_epoch = int(resume_meta.get('epoch', 0)) if resume_meta else 0
    if start_epoch:
        print(f'Resuming from epoch {start_epoch} (step {int(state.step)})')

    result = {}
    save_thread = None
    try:
        for epoch in range(start_epoch, cfg['epochs']):
            tel.epoch = epoch  # keep sink labels aligned when resuming
            tel['epoch'].set_value(epoch)
            print(f'> Epoch {epoch + 1:3d}/{cfg["epochs"]:3d}', flush=True)
            # pin per-example augmentation ordinals to the true epoch so a
            # resumed run draws the same augmentations as an uninterrupted
            # one (data/loader.py set_epoch; base.py example_rng)
            train_loader.set_epoch(epoch)
            if val_loader is not None:
                val_loader.set_epoch(epoch)

            state = do_training_pass(cfg, model, state, train_step, tel, train_loader,
                                     data_sharding, file_out_dir, aug_step=aug_step,
                                     ship_specs=ship_specs, renorm_step=renorm_step)
            if val_loader is not None:
                do_validation_pass(cfg, state, eval_step, tel, val_loader, data_sharding,
                                   ship_specs=ship_specs, renorm_step=renorm_step)

            # record the schedule values the epoch's LAST update applied
            # (update N reads the counter at N-1) so the metrics stream
            # carries the full 1cycle trajectory, endpoints included
            from margipose_tpu.train.schedules import schedule_values

            lr_now, mom_now = schedule_values(
                cfg['optim_algorithm'], cfg['lr'], max(int(state.step) - 1, 0),
                max_iters=max_iters, milestones=cfg['lr_milestones'],
                gamma=cfg['lr_gamma'], steps_per_epoch=steps_per_epoch)
            tel['lr'].set_value(lr_now)
            tel['momentum'].set_value(mom_now)

            result = {
                'train_pck': tel['train_pck'].value(),
                'train_mpjpe': tel['train_mpjpe'].value(),
            }
            if exp_out_dir and (epoch + 1) % cfg['checkpoint_every'] == 0:
                if save_thread is not None:
                    save_thread.join()  # one in-flight save per directory
                # the device->host fetch is synchronous (the state's buffers
                # are donated to the next epoch's steps); the disk
                # serialisation overlaps the next epoch's compute
                save_thread = ckpt.save_checkpoint(
                    path.join(exp_out_dir, 'model-latest'), state, model_desc,
                    extra={'epoch': epoch + 1,
                           'train_datasets': cfg['train_datasets']},
                    background=True)
            tel.step()
    except BaseException:
        _join_final_save(save_thread, in_flight=True)
        raise
    _join_final_save(save_thread, in_flight=False)

    result['experiment_id'] = experiment_id
    return result


def _join_final_save(save_thread, *, in_flight):
    """Join the last in-flight background checkpoint save. A failed save
    must not REPLACE an in-flight training exception (``join()`` re-raises;
    see checkpoint._BackgroundSave) — the primary crash is what the user
    needs to see. With no exception propagating, the save failure IS the
    primary error: re-raise it.

    ``in_flight`` is passed explicitly by the caller's except/else
    structure: sys.exc_info() cannot distinguish the training loop's own
    propagating exception from one being handled in an ENCLOSING frame
    (e.g. run_training invoked inside a caller's ``except`` block), which
    would silently demote a save failure on a successful run."""
    if save_thread is None:
        return
    try:
        save_thread.join()
    # BaseException: _BackgroundSave.join() re-raises whatever the save
    # thread captured, which may be e.g. SystemExit — that too must defer
    # to an in-flight training error.
    except BaseException:
        if not in_flight:
            raise
        traceback.print_exc()
        print('warning: background checkpoint save failed (traceback '
              'above); the original training error follows',
              file=sys.stderr, flush=True)


def _host_metrics_np(batch, dataset, host_preds, tel, prefix):
    # Each process scores its own rows of the (possibly multi-host) batch —
    # the host-side fields in `batch` are local to this process already.
    norm_preds = ensure_homogeneous(host_preds.astype(np.float64), d=3)
    metrics = dataset.evaluate_3d_batch(batch, norm_preds)
    for m in metrics:
        tel[f'{prefix}_mpjpe'].add(m['mpjpe'])
        tel[f'{prefix}_pck'].add(m['pck'])


def _host_metrics(batch, dataset, preds, tel, prefix):
    from margipose_tpu.parallel import host_local_values

    _host_metrics_np(batch, dataset, host_local_values(preds), tel, prefix)


def do_training_pass(cfg, model, state, train_step, tel, loader, data_sharding,
                     exp_out_dir, aug_step=None, ship_specs=None,
                     renorm_step=None):
    import time

    import jax.numpy as jnp

    vis_done = False
    batch_iter = device_prefetch(iter(loader), sharding=data_sharding,
                                 depth=cfg.get('prefetch_depth', 2),
                                 requantize=ship_specs)
    i = 0
    profile_steps = cfg.get('profile_steps', 0)
    profiling = False
    if profile_steps and exp_out_dir and int(state.step) == 0:
        # Idiomatic upgrade over the reference's wall-clock-only phase meters
        # (reference: src/margipose/utils.py:218-234): a real device trace,
        # viewable with tensorboard or xprof.
        jax.profiler.start_trace(path.join(exp_out_dir, 'profile'))
        profiling = True

    # Device->host reads are expensive (a full relay round-trip on remote
    # TPU runtimes); reading the loss scalar every step would serialise the
    # pipeline. Losses stay on device and are drained in one batched
    # transfer every `metrics_every` steps. step_time/images_per_sec are
    # window averages with data-load stalls subtracted; the first window
    # (XLA compile) is excluded from the timing meters.
    pending_losses = []
    window_t0 = time.perf_counter()
    window_images = 0
    window_load_s = 0.0
    first_window = True

    def drain_window():
        nonlocal window_t0, window_images, window_load_s, first_window
        if not pending_losses:
            return
        losses = np.asarray(jnp.stack(pending_losses))  # one transfer
        dt = time.perf_counter() - window_t0 - window_load_s
        # weight by window length: the epoch value must be the mean over
        # BATCHES (reference adds one loss per batch —
        # reference: src/margipose/bin/train_3d.py:167), and windows are
        # ragged (the i % metrics_every == 0 drain and the tail)
        tel['train_loss'].add(float(losses.mean()), len(losses))
        if not first_window:
            # window-length weighting makes step_time total-time/total-steps
            # and DURATION weighting makes images_per_sec a ratio-of-sums
            # (sum(rate*dt)/sum(dt) = total images / total time) — a
            # step-weighted mean of rates would overstate epoch throughput
            # whenever windows are ragged (stalls, tails)
            tel['step_time'].add(dt / len(pending_losses), len(pending_losses))
            tel['train_images_per_sec'].add(window_images / max(dt, 1e-9),
                                            max(dt, 1e-9))
        first_window = False
        pending_losses.clear()
        window_t0 = time.perf_counter()
        window_images = 0
        window_load_s = 0.0

    while True:
        t_load = time.perf_counter()
        batch = next(batch_iter, None)
        load_s = time.perf_counter() - t_load
        if batch is None:
            break
        tel['data_load_time'].add(load_s)
        window_load_s += load_s
        if aug_step is not None:
            # On-device warp+colour+normalise (enqueued async; overlaps with
            # the previous train step like any other device work).
            batch['input'] = aug_step(batch['raw_image'], batch['aug_affine'],
                                      batch['aug_colour'])
        elif renorm_step is not None:
            # uint8-shipped input -> normalised float32 (enqueued async).
            batch['input'] = renorm_step(batch['input'])
        device_batch = {
            'input': batch['input'],
            'target': batch['target'],
            'joint_mask': batch['joint_mask'],
            'valid_depth': batch['valid_depth'],  # int32 device array (loader)
        }
        state, metrics = train_step(state, device_batch)
        pending_losses.append(metrics['loss'])
        window_images += len(batch['valid_depth'])

        if i % cfg['metrics_every'] == 0:
            drain_window()  # before host metrics: keep eval out of step_time
            with timer(tel['eval_time']):
                _host_metrics(batch, loader.dataset, metrics['pred'], tel, 'train')
            if not vis_done and exp_out_dir:
                from margipose_tpu.parallel import host_local_values

                vis_batch = dict(batch)
                vis_batch['input'] = host_local_values(batch['input'])
                images = visualise_predictions(
                    host_local_values(metrics['pred']).astype(np.float64),
                    vis_batch, loader.dataset)
                save_image_grid(images,
                                path.join(exp_out_dir, 'train_examples.png'))
                vis_done = True
            window_t0 = time.perf_counter()  # restart after host work
        i += 1
        if profiling and i >= profile_steps:
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
            profiling = False
    drain_window()
    if profiling:
        jax.profiler.stop_trace()
    return state


def do_validation_pass(cfg, state, eval_step, tel, loader, data_sharding,
                       ship_specs=None, renorm_step=None):
    """Validation epoch with windowed device->host drains.

    Mirrors do_training_pass's drain machinery: losses AND predictions stay
    on device while eval steps are enqueued back-to-back, then each
    ``metrics_every``-batch window is drained in two stacked transfers (one
    for losses, one for predictions) instead of one ~29 ms relay round-trip
    per batch (BASELINE.md device->host read latency). Host metrics run on
    every example either way — validation scores the full epoch, unlike the
    sampled train-pass metrics. (reference: src/margipose/bin/train_3d.py:
    199-226 reads every batch synchronously; it runs on a local GPU where
    that costs nothing.)
    """
    import jax.numpy as jnp

    from margipose_tpu.parallel import host_local_values

    batch_iter = device_prefetch(iter(loader), sharding=data_sharding,
                                 depth=cfg.get('prefetch_depth', 2),
                                 requantize=ship_specs)
    pending = []  # [(loss_dev, pred_dev, host_batch)] for the open window

    def drain_window():
        if not pending:
            return
        losses = np.asarray(jnp.stack([l for l, _, _ in pending]))  # 1 read
        for loss in losses:
            tel['val_loss'].add(float(loss))
        preds = [p for _, p, _ in pending]
        if (len({p.shape for p in preds}) == 1
                and all(getattr(p, 'is_fully_addressable', True) for p in preds)):
            host_preds = list(np.asarray(jnp.stack(preds)))  # 1 read
        else:
            # Ragged tail batch, or multi-process (each host must read only
            # its own rows): per-batch reads for this window only.
            host_preds = [host_local_values(p) for p in preds]
        for (_, _, batch), hp in zip(pending, host_preds):
            _host_metrics_np(batch, loader.dataset, hp, tel, 'val')
        pending.clear()

    for batch in batch_iter:
        if renorm_step is not None:
            batch['input'] = renorm_step(batch['input'])
        device_batch = {
            'input': batch['input'],
            'target': batch['target'],
            'joint_mask': batch['joint_mask'],
            'valid_depth': batch['valid_depth'],  # int32 device array (loader)
        }
        metrics = eval_step(state.params, state.batch_stats, device_batch)
        # keep only the host-side metadata the drained metrics need — holding
        # the full batch would pin the device input/target arrays in HBM for
        # the whole metrics_every window (~25 MB/batch at 32x256px)
        host_keep = ('index', 'original_skel', 'camera_intrinsic',
                     'transform_opts', 'valid_depth_host')
        host_batch = {k: batch[k] for k in host_keep if k in batch}
        if 'valid_depth_host' not in host_batch:
            host_batch['valid_depth'] = batch['valid_depth']
        pending.append((metrics['loss'], metrics['pred'], host_batch))
        if len(pending) >= cfg['metrics_every']:
            drain_window()
    drain_window()


def main(argv, common_opts):
    cfg = ex.parse(argv[1:])
    return run_training(cfg)


Train_Subcommand = Subcommand(name='train', func=main, help='train a model')

if __name__ == '__main__':
    Train_Subcommand.run()
