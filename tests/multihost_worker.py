"""Worker process for the REAL 2-process multi-host tests.

Not a test module — spawned by tests/test_multihost_real.py as

    python tests/multihost_worker.py --process-id I --num-processes 2 \
        --port P --out DIR --mode {recipe,bin}

Each worker initialises ``jax.distributed`` on the CPU backend (gloo
collectives) with 4 virtual devices, forming a REAL 2-process / 8-device
global mesh. ``run_recipe`` holds the shared training recipe: the test
process runs the identical function single-process on its 8-device mesh and
asserts parity, so every multi-process branch — ``host_local_slice`` row
ownership, ``jax.make_array_from_process_local_data`` batch assembly, the
orbax multi-host checkpoint save/restore branch
(margipose_tpu/train/checkpoint.py), ``host_local_values`` on
non-fully-addressable arrays — runs with real process boundaries instead of
the single-process emulation in tests/test_multihost.py.

The reference has no analogue to any of this: it is strictly single-process
(reference: src/margipose/bin/train_3d.py; SURVEY.md §5.8).
"""

import argparse
import json
import os
import sys

N_STEPS = 3  # two steps, checkpoint, restore into a fresh state, one more
GLOBAL_BATCH = 16
SEED = 0
MODEL_DESC = {'type': 'margipose', 'version': '6.0.1',
              'settings': {'n_stages': 1, 'feature_extractor': 'resnet18'}}


def make_global_batch(step: int) -> dict:
    """Deterministic GLOBAL batch for ``step`` — both the 2-process run
    (each process slicing its host_local_slice rows) and the single-process
    run draw from this, so their device-side inputs are identical."""
    import numpy as np

    rng = np.random.RandomState(1234 + step)
    return {
        'input': rng.randn(GLOBAL_BATCH, 32, 32, 3).astype(np.float32),
        'target': rng.uniform(-0.9, 0.9, (GLOBAL_BATCH, 17, 3)).astype(np.float32),
        'joint_mask': np.ones((GLOBAL_BATCH, 17), np.float32),
        'valid_depth': (np.arange(GLOBAL_BATCH) % 2).astype(np.int32),
    }


def run_recipe(ckpt_dir: str) -> dict:
    """Train N_STEPS on the global mesh with a mid-run checkpoint
    save + restore-into-a-fresh-state, mirroring the state placement of
    bin/train_3d.run_training exactly (create state -> [restore] ->
    shard_variables / device_put -> shard_map step). Returns the per-step
    losses and the final params as host numpy."""
    import numpy as np

    import jax
    from margipose_tpu.models.margipose import MargiPoseModel
    from margipose_tpu.parallel import (
        host_local_slice,
        host_local_values,
        make_mesh,
        shard_batch,
        shard_variables,
    )
    from margipose_tpu.train import checkpoint as ckpt
    from margipose_tpu.train.schedules import make_optimiser
    from margipose_tpu.train.steps import (
        TrainState,
        create_train_state,
        make_train_step,
    )

    n_proc = jax.process_count()
    mesh = make_mesh()
    assert mesh.devices.size == 8, mesh
    model = MargiPoseModel(n_joints=17, n_stages=1, feature_extractor='resnet18')
    opt = make_optimiser('1cycle', lr=0.05, max_iters=N_STEPS)

    def place(state):
        # bin/train_3d.run_training's exact placement (train_3d.py:252-257)
        return TrainState(
            step=state.step,
            params=shard_variables(state.params, mesh),
            batch_stats=shard_variables(state.batch_stats, mesh),
            opt_state=jax.device_put(state.opt_state),
        )

    state = place(create_train_state(
        model, jax.random.PRNGKey(SEED), opt, input_shape=(1, 32, 32, 3)))
    train_step = make_train_step(model, opt, donate=False, mesh=mesh)

    local = host_local_slice(GLOBAL_BATCH)
    losses = []

    def one_step(state, i):
        gb = make_global_batch(i)
        batch = shard_batch({k: v[local] for k, v in gb.items()}, mesh)
        state, metrics = train_step(state, batch)
        losses.append(float(metrics['loss']))  # replicated scalar
        preds = host_local_values(metrics['pred'])
        assert preds.shape == (GLOBAL_BATCH // n_proc, 17, 3), preds.shape
        return state

    for i in range(N_STEPS - 1):
        state = one_step(state, i)

    pre_save = jax.tree.map(np.asarray, state.params)  # fully replicated
    ckpt.save_checkpoint(ckpt_dir, state, MODEL_DESC, extra={'epoch': 1})
    # fresh, DIFFERENTLY seeded state: the final step's parity proves the
    # restore really carried the params/opt_state/step across
    fresh = create_train_state(
        model, jax.random.PRNGKey(SEED + 99), opt, input_shape=(1, 32, 32, 3))
    state = place(ckpt.restore_checkpoint(ckpt_dir, fresh))
    assert int(state.step) == N_STEPS - 1
    # the save -> restore round-trip must be BIT-exact (unlike the
    # collective-reduction-order drift between the gloo and in-process runs)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
        pre_save, state.params)
    state = one_step(state, N_STEPS - 1)

    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    params = {jax.tree_util.keystr(k): np.asarray(v)  # fully replicated
              for k, v in flat}
    return {'losses': losses, 'params': params,
            'meta_epoch': ckpt.load_meta(ckpt_dir)['epoch']}


def run_bin(out_dir: str) -> dict:
    """Drive the REAL training entry (bin/train_3d.run_training) under 2
    processes: per-process loader slices + seeds (train_3d.py:201-217),
    device_prefetch -> make_array_from_process_local_data, collective
    checkpoint saves, process-0-only file sinks — then a full-state resume
    through the multi-host orbax restore branch."""
    from margipose_tpu.bin.train_3d import ex, run_training

    base = [
        'with', 'synthetic', 'sgd_simple',
        f'out_dir={out_dir}', 'batch_size=8',
        'train_examples=16', 'val_examples=8', 'lr=0.02',
        'num_workers=0', 'metrics_every=1',
        "model_desc={'type': 'margipose', 'version': '6.0.1', "
        "'settings': {'n_stages': 1, 'feature_extractor': 'resnet18', "
        "'input_size': 96}}",
        'train_datasets=["synthetic-16"]', 'val_datasets=["synthetic-8"]',
        'use_aug=False',
    ]
    # Run 1 deliberately omits experiment_id: each process generates its own
    # timestamp and run_training must broadcast process 0's so the collective
    # checkpoint save targets ONE directory (train_3d.py experiment_id
    # broadcast). The resume run pins the id so metrics.jsonl continues in
    # the same experiment directory.
    result1 = run_training(ex.parse(base + ['epochs=1']))
    exp_id = result1['experiment_id']
    ckpt_dir = os.path.join(out_dir, exp_id, 'model-latest')
    result2 = run_training(ex.parse(
        base + ['epochs=2', f'resume={ckpt_dir}', f'experiment_id={exp_id}']))
    return {'result1': result1, 'result2': result2, 'ckpt_dir': ckpt_dir}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--process-id', type=int, required=True)
    ap.add_argument('--num-processes', type=int, default=2)
    ap.add_argument('--port', type=int, required=True)
    ap.add_argument('--out', required=True)
    ap.add_argument('--mode', choices=('recipe', 'bin'), default='recipe')
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_cpu_collectives_implementation', 'gloo')
    jax.distributed.initialize(
        coordinator_address=f'localhost:{args.port}',
        num_processes=args.num_processes, process_id=args.process_id)
    assert jax.process_count() == args.num_processes
    assert jax.device_count() == 8 and jax.local_device_count() == 4

    import numpy as np

    if args.mode == 'recipe':
        out = run_recipe(os.path.join(args.out, 'ckpt'))
        if jax.process_index() == 0:
            np.savez(os.path.join(args.out, 'params.npz'), **out['params'])
        with open(os.path.join(args.out, f'proc{args.process_id}.json'), 'w') as f:
            json.dump({'losses': out['losses'],
                       'meta_epoch': out['meta_epoch']}, f)
    else:
        out = run_bin(os.path.join(args.out, 'train_out'))
        with open(os.path.join(args.out, f'proc{args.process_id}.json'), 'w') as f:
            json.dump({'result1': out['result1'], 'result2': out['result2'],
                       'ckpt_dir': out['ckpt_dir']}, f)


if __name__ == '__main__':
    sys.exit(main())
