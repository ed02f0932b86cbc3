"""Multi-host per-host batch assembly (SURVEY.md §5.8).

The reference is strictly single-process (no torch.distributed anywhere;
reference: src/margipose/bin/train_3d.py); this is the TPU-native multi-host
input path it lacks. Real multi-process jax can't run in a unit test, so the
assembly math is exercised by FAKING two processes on the virtual 8-device
mesh: each fake process contributes its `host_local_slice` rows, per-device
shards are placed exactly where jax.make_array_from_process_local_data would
place them, and the assembled global array must match the single-process
`shard_batch` path bit-for-bit — including through a full train step.
"""

import jax
import jax.numpy as jnp
import numpy as np

from margipose_tpu.parallel import (
    batch_sharding,
    host_local_slice,
    host_local_values,
    make_mesh,
    put_batch_array,
    shard_batch,
)


def test_host_local_slices_partition_the_batch():
    for pc in (1, 2, 4):
        rows = []
        for pi in range(pc):
            s = host_local_slice(16, process_index=pi, process_count=pc)
            rows.extend(range(16)[s])
        assert rows == list(range(16)), (pc, rows)


def _assemble_as_two_processes(full: np.ndarray, mesh) -> jax.Array:
    """Emulate jax.make_array_from_process_local_data for 2 fake processes,
    each owning half the mesh devices, from their host_local_slice rows."""
    sharding = batch_sharding(mesh)
    devices = list(mesh.devices.flat)
    n_dev = len(devices)
    per_proc_devices = n_dev // 2
    per_dev = full.shape[0] // n_dev
    single_dev_arrays = []
    for pi in range(2):
        local = full[host_local_slice(full.shape[0], pi, 2)]
        for j in range(per_proc_devices):
            dev = devices[pi * per_proc_devices + j]
            shard = local[j * per_dev:(j + 1) * per_dev]
            single_dev_arrays.append(jax.device_put(shard, dev))
    return jax.make_array_from_single_device_arrays(
        full.shape, sharding, single_dev_arrays)


def test_two_process_assembly_matches_single_process():
    mesh = make_mesh()
    rng = np.random.RandomState(0)
    full = rng.randn(16, 8, 8, 3).astype(np.float32)

    global_arr = _assemble_as_two_processes(full, mesh)
    single = shard_batch({'input': full}, mesh)['input']

    np.testing.assert_array_equal(np.asarray(global_arr), np.asarray(single))
    assert global_arr.sharding.is_equivalent_to(single.sharding, full.ndim)
    # host_local_values is the inverse on a fully-addressable host
    np.testing.assert_array_equal(host_local_values(global_arr), full)


def test_train_step_on_assembled_batch_matches_shard_batch():
    from margipose_tpu.models.margipose import MargiPoseModel
    from margipose_tpu.train.schedules import make_optimiser
    from margipose_tpu.train.steps import create_train_state, make_train_step

    mesh = make_mesh()
    model = MargiPoseModel(n_joints=17, n_stages=1, feature_extractor='resnet18')
    opt = make_optimiser('1cycle', lr=0.05, max_iters=10)
    rng = np.random.RandomState(3)
    full = {
        'input': rng.randn(8, 32, 32, 3).astype(np.float32),
        'target': rng.uniform(-0.9, 0.9, (8, 17, 3)).astype(np.float32),
        'joint_mask': np.ones((8, 17), np.float32),
        'valid_depth': (np.arange(8) % 2).astype(np.int32),
    }
    train_step = make_train_step(model, opt, donate=False)

    def run(batch):
        state = create_train_state(
            model, jax.random.PRNGKey(0), opt, input_shape=(1, 32, 32, 3))
        _, metrics = train_step(state, batch)
        return float(metrics['loss'])

    loss_single = run(shard_batch(full, mesh))
    assembled = {k: _assemble_as_two_processes(v, mesh)
                 for k, v in full.items()}
    loss_multi = run(assembled)
    assert loss_single == loss_multi, (loss_single, loss_multi)


def test_put_batch_array_single_process_is_device_put():
    mesh = make_mesh()
    sharding = batch_sharding(mesh)
    arr = np.arange(32, dtype=np.float32).reshape(8, 4)
    out = put_batch_array(arr, sharding)
    np.testing.assert_array_equal(np.asarray(out), arr)
    assert out.sharding.is_equivalent_to(sharding, arr.ndim)


def test_device_prefetch_casts_valid_depth_and_places_batches():
    from margipose_tpu.data.loader import device_prefetch

    mesh = make_mesh()
    sharding = batch_sharding(mesh)
    batches = [{
        'input': np.zeros((8, 4, 4, 3), np.float32),
        'valid_depth': np.ones((8,), np.float64),
        'index': list(range(8)),  # host-side field stays host-side
    }]
    out = list(device_prefetch(iter(batches), sharding=sharding))
    assert len(out) == 1
    assert isinstance(out[0]['input'], jax.Array)
    assert out[0]['valid_depth'].dtype == jnp.int32
    assert out[0]['index'] == list(range(8))
    # the host copy rides along so evaluate_3d_batch never reads the device
    # array back (one ~29 ms relay round-trip per batch on remote runtimes)
    host_vd = out[0]['valid_depth_host']
    assert isinstance(host_vd, np.ndarray) and host_vd.dtype == np.int32
    np.testing.assert_array_equal(host_vd, np.ones(8, np.int32))


def test_evaluate_3d_batch_prefers_host_valid_depth():
    """evaluate_3d_batch must consume 'valid_depth_host' without touching
    'valid_depth' (which may be a non-addressable sharded device array)."""
    from margipose_tpu.data.synthetic import SyntheticPoseDataset

    ds = SyntheticPoseDataset(length=4, use_aug=False)
    samples = [ds[i] for i in range(4)]
    batch = {
        'index': [s['index'] for s in samples],
        'original_skel': np.stack([s['original_skel'] for s in samples]),
        'camera_intrinsic': [s['camera_intrinsic'] for s in samples],
        'transform_opts': [s['transform_opts'] for s in samples],
        'valid_depth_host': np.array([1, 0, 1, 1], np.int32),
        'valid_depth': object(),  # would explode if touched
    }
    preds = np.stack([np.asarray(s['target'])[..., :3] for s in samples])
    metrics = ds.evaluate_3d_batch(batch, preds.astype(np.float64))
    assert len(metrics) == 3  # row 1 masked out via the host copy
