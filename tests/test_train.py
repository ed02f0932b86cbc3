import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from margipose_tpu.models.margipose import MargiPoseModel
from margipose_tpu.parallel import make_mesh, shard_batch, shard_variables
from margipose_tpu.train.schedules import make_optimiser, onecycle_schedules
from margipose_tpu.train.steps import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)


def small_model():
    return MargiPoseModel(n_joints=17, n_stages=1, feature_extractor='resnet18')


def fake_batch(rng, batch=4, size=64):
    return {
        'input': np.asarray(rng.randn(batch, size, size, 3), np.float32),
        'target': np.asarray(rng.uniform(-0.9, 0.9, (batch, 17, 3)), np.float32),
        'joint_mask': np.ones((batch, 17), np.float32),
        'valid_depth': np.ones((batch,), np.int32),
    }


def test_onecycle_schedule_values():
    """Matches the reference interpolation (reference:
    src/margipose/hyperparam_scheduler.py:6-21) with batch_count = count+1."""
    lr_sched, mom_sched = onecycle_schedules(1000, lr_max=1.0, momentum=0.9)
    t2 = 0.9 * 1000
    t1 = t2 / 2
    # step 1 (count 0): lr_min
    assert float(lr_sched(0)) == pytest.approx(0.1, rel=1e-6)
    # peak at t1
    assert float(lr_sched(int(t1) - 1)) == pytest.approx(1.0, rel=1e-3)
    assert float(mom_sched(int(t1) - 1)) == pytest.approx(0.85, rel=1e-3)
    # end: lr_max/1e4... lr_nihil = lr_min*1e-3 = 1e-4
    assert float(lr_sched(999)) == pytest.approx(1e-4, rel=1e-3)
    assert float(mom_sched(999)) == pytest.approx(0.9, rel=1e-6)


def test_train_step_reduces_loss():
    model = small_model()
    opt = make_optimiser('1cycle', lr=0.05, max_iters=30)
    state = create_train_state(
        model, jax.random.PRNGKey(0), opt, input_shape=(1, 64, 64, 3))
    train_step = make_train_step(model, opt, donate=False)

    rng = np.random.RandomState(0)
    batch = fake_batch(rng)  # single fixed batch: loss must drop when memorising
    state, first = train_step(state, batch)
    losses = [float(first['loss'])]
    for _ in range(14):
        state, metrics = train_step(state, batch)
        losses.append(float(metrics['loss']))
    assert losses[-1] < losses[0] * 0.9, losses
    assert int(state.step) == 15


@pytest.mark.slow  # 55s measured (r4 durations profile)
def test_uint8_ship_training_matches_float32():
    """End-to-end run_training parity: ship='uint8' (lossless requantised
    inputs, re-normalised on device) must train identically to
    ship='float32' — same seeds, same data, same number of steps."""
    from margipose_tpu.bin.train_3d import ex, run_training

    argv = [
        'with', 'synthetic', 'sgd_simple',
        'out_dir=', 'epochs=1', 'batch_size=8', 'train_examples=16',
        'val_examples=8', 'lr=0.02', 'num_workers=0', 'metrics_every=1',
        'use_aug=True',
        "model_desc={'type': 'margipose', 'version': '6.0.1', "
        "'settings': {'n_stages': 1, 'feature_extractor': 'resnet18', "
        "'input_size': 96}}",
        'train_datasets=["synthetic-16"]', 'val_datasets=["synthetic-8"]',
    ]
    r_u8 = run_training(ex.parse(argv + ['ship=uint8']))
    r_f32 = run_training(ex.parse(argv + ['ship=float32']))
    # The uint8 round-trip is exactly lossless at the pixel level (see
    # test_device_prefetch_uint8_ship_roundtrip for the strict check); the
    # device-vs-host normalisation arithmetic differs in the last ulp and
    # two SGD steps amplify that (measured ~0.15% here), so this end-to-end
    # check only pins "trains identically to noise", not bitwise equality.
    np.testing.assert_allclose(r_u8['train_mpjpe'], r_f32['train_mpjpe'],
                               rtol=2e-2)
    np.testing.assert_allclose(r_u8['train_pck'], r_f32['train_pck'],
                               atol=2e-2)


def test_eval_step_runs():
    model = small_model()
    opt = optax.sgd(0.1)
    state = create_train_state(
        model, jax.random.PRNGKey(0), opt, input_shape=(1, 64, 64, 3))
    eval_step = make_eval_step(model)
    batch = fake_batch(np.random.RandomState(1), batch=2)
    metrics = eval_step(state.params, state.batch_stats, batch)
    assert metrics['pred'].shape == (2, 17, 3)
    assert np.isfinite(float(metrics['loss']))


def test_train_step_sharded_mesh():
    """Full train step under GSPMD on the 8-device CPU mesh with batch
    sharded over 'data' and conv channels sharded over 'model'."""
    assert len(jax.devices()) == 8, 'conftest must provide 8 CPU devices'
    mesh = make_mesh(shape=(4, 2))
    model = small_model()
    opt = make_optimiser('1cycle', lr=0.01, max_iters=10)
    state = create_train_state(
        model, jax.random.PRNGKey(0), opt, input_shape=(1, 64, 64, 3))
    state = TrainState(
        step=state.step,
        params=shard_variables(state.params, mesh),
        batch_stats=shard_variables(state.batch_stats, mesh),
        opt_state=jax.device_put(state.opt_state),
    )
    train_step = make_train_step(model, opt, donate=False)
    batch = shard_batch(fake_batch(np.random.RandomState(0), batch=8), mesh)
    state2, metrics = train_step(state, batch)
    assert np.isfinite(float(metrics['loss']))
    # params keep their shardings
    some_kernel = jax.tree.leaves(state2.params)[0]
    assert some_kernel.sharding is not None


def test_checkpoint_roundtrip(tmp_path):
    from margipose_tpu.train.checkpoint import (
        load_meta,
        load_model,
        restore_checkpoint,
        save_checkpoint,
        save_model,
    )

    model = small_model()
    opt = optax.sgd(0.1)
    state = create_train_state(
        model, jax.random.PRNGKey(0), opt, input_shape=(1, 64, 64, 3))
    desc = {'type': 'margipose', 'version': '6.0.1',
            'settings': {'n_stages': 1, 'feature_extractor': 'resnet18'}}

    ckpt_dir = str(tmp_path / 'ckpt')
    save_checkpoint(ckpt_dir, state, desc, extra={'epoch': 3})
    assert load_meta(ckpt_dir)['epoch'] == 3

    template = create_train_state(
        model, jax.random.PRNGKey(1), opt, input_shape=(1, 64, 64, 3))
    restored = restore_checkpoint(ckpt_dir, template)
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    model_dir = str(tmp_path / 'model')
    save_model(model_dir, {'params': state.params, 'batch_stats': state.batch_stats},
               desc)
    model2, variables, desc2 = load_model(model_dir)
    assert desc2 == desc
    c = jax.tree.leaves(variables['params'])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(c))
    # contract: load_model returns HOST-NUMPY leaves (multi-host-safe —
    # orbax-committed arrays cannot be re-placed across process meshes);
    # callers that pass variables as per-call jit arguments (bin/eval_3d)
    # must device_put them once or every batch re-uploads the weights
    assert all(isinstance(leaf, np.ndarray)
               for leaf in jax.tree.leaves(variables)), (
        'load_model must return host-numpy leaves')


def test_checkpoint_interrupted_save_fallback(tmp_path):
    """A save killed mid-swap must not lose the previous checkpoint: restore
    falls back to state.old, and the next save cleans up the debris."""
    import os
    import shutil

    from margipose_tpu.train.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    model = small_model()
    opt = optax.sgd(0.1)
    state = create_train_state(
        model, jax.random.PRNGKey(0), opt, input_shape=(1, 64, 64, 3))
    desc = {'type': 'margipose', 'version': '6.0.1',
            'settings': {'n_stages': 1, 'feature_extractor': 'resnet18'}}
    ckpt_dir = str(tmp_path / 'ckpt')
    save_checkpoint(ckpt_dir, state, desc, extra={'epoch': 1})

    # simulate a crash between `state -> state.old` and `state.next -> state`
    os.rename(os.path.join(ckpt_dir, 'state'), os.path.join(ckpt_dir, 'state.old'))
    os.makedirs(os.path.join(ckpt_dir, 'state.next.orbax-checkpoint-tmp-123'))

    template = create_train_state(
        model, jax.random.PRNGKey(1), opt, input_shape=(1, 64, 64, 3))
    restored = restore_checkpoint(ckpt_dir, template)
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # a subsequent save repairs the directory
    save_checkpoint(ckpt_dir, restored, desc, extra={'epoch': 2})
    assert os.path.isdir(os.path.join(ckpt_dir, 'state'))
    assert not os.path.exists(os.path.join(ckpt_dir, 'state.old'))
    assert not os.path.exists(
        os.path.join(ckpt_dir, 'state.next.orbax-checkpoint-tmp-123'))
    restored2 = restore_checkpoint(ckpt_dir, template)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored2.params)[0]), np.asarray(a))


@pytest.mark.slow  # 35s measured (r4 durations profile)
def test_sharded_step_matches_single_device():
    """Sharded steps must be numerically equivalent to the unsharded step —
    collectives change reduction order only. The pure-DP (8, 1) mesh runs
    under jax.shard_map (explicit psums; see train.steps.shard_map_axis);
    the hybrid (4, 2) mesh exercises the GSPMD tensor-parallel path."""
    model = small_model()
    opt = make_optimiser('1cycle', lr=0.01, max_iters=10)
    batch_np = fake_batch(np.random.RandomState(0), batch=8)

    def one_step(mesh=None):
        state = create_train_state(
            model, jax.random.PRNGKey(0), opt, input_shape=(1, 64, 64, 3))
        train_step = make_train_step(model, opt, donate=False, mesh=mesh)
        if mesh is None:
            batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        else:
            state = TrainState(
                step=state.step,
                params=shard_variables(state.params, mesh),
                batch_stats=shard_variables(state.batch_stats, mesh),
                opt_state=jax.device_put(state.opt_state),
            )
            batch = shard_batch(batch_np, mesh)
        new_state, metrics = train_step(state, batch)
        return (float(metrics['loss']),
                np.asarray(jax.tree.leaves(new_state.params)[0]),
                np.asarray(jax.tree.leaves(new_state.batch_stats)[0]))

    loss_ref, param_ref, bs_ref = one_step(mesh=None)
    loss_dp, param_dp, bs_dp = one_step(mesh=make_mesh(shape=(8, 1)))
    loss_tp, param_tp, bs_tp = one_step(mesh=make_mesh(shape=(4, 2)))

    assert loss_dp == pytest.approx(loss_ref, rel=1e-5)
    assert loss_tp == pytest.approx(loss_ref, rel=1e-5)
    np.testing.assert_allclose(param_dp, param_ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(param_tp, param_ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(bs_dp, bs_ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(bs_tp, bs_ref, rtol=1e-4, atol=1e-6)


def test_checkpoint_background_save(tmp_path):
    """background=True fetches the state synchronously (buffers may be
    donated to the next step) and serialises on a returned thread; after
    join(), the checkpoint restores identically to a synchronous save, and
    sequential background saves to one directory are safe when joined
    between (the train-loop contract)."""
    from margipose_tpu.train.checkpoint import (
        load_meta,
        restore_checkpoint,
        save_checkpoint,
    )

    model = small_model()
    opt = optax.sgd(0.1)
    state = create_train_state(
        model, jax.random.PRNGKey(0), opt, input_shape=(1, 64, 64, 3))
    desc = {'type': 'margipose', 'version': '6.0.1',
            'settings': {'n_stages': 1, 'feature_extractor': 'resnet18'}}
    ckpt_dir = str(tmp_path / 'ckpt')

    thread = save_checkpoint(ckpt_dir, state, desc, extra={'epoch': 1},
                             background=True)
    assert thread is not None
    thread.join()
    assert load_meta(ckpt_dir)['epoch'] == 1

    # second background save over the first (the per-epoch overwrite)
    thread = save_checkpoint(ckpt_dir, state, desc, extra={'epoch': 2},
                             background=True)
    thread.join()
    assert load_meta(ckpt_dir)['epoch'] == 2

    template = create_train_state(
        model, jax.random.PRNGKey(1), opt, input_shape=(1, 64, 64, 3))
    restored = restore_checkpoint(ckpt_dir, template)
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_checkpoint_background_save_failure_reraises(tmp_path):
    """A failed background save must NOT be silent: join() re-raises the
    save exception so the train loop exits with an error instead of
    running on with a stale (or no) checkpoint on disk."""
    import pytest

    from margipose_tpu.train.checkpoint import save_checkpoint

    model = small_model()
    opt = optax.sgd(0.1)
    state = create_train_state(
        model, jax.random.PRNGKey(0), opt, input_shape=(1, 64, 64, 3))
    desc = {'type': 'margipose', 'version': '6.0.1',
            'settings': {'n_stages': 1, 'feature_extractor': 'resnet18'}}
    # a plain FILE at the checkpoint path makes every directory write fail
    bad_dir = tmp_path / 'ckpt'
    bad_dir.write_text('not a directory')

    thread = save_checkpoint(str(bad_dir), state, desc, background=True)
    assert thread is not None
    with pytest.raises(Exception):
        thread.join()
    # the exception is delivered once; a second join is a clean no-op
    thread.join()


def test_join_final_save_exception_precedence():
    """run_training's end-of-loop join guard (train_3d._join_final_save):
    a failed background save re-raises when nothing else is propagating,
    but must NOT replace an in-flight training exception — including when
    the save thread died with a BaseException like SystemExit. The caller
    passes ``in_flight`` explicitly from its except/else structure (the
    guard must not probe sys.exc_info(): an exception being handled in an
    ENCLOSING frame — run_training invoked inside a caller's ``except``
    block — would look in-flight and demote a save failure on a clean
    run)."""
    import pytest

    from margipose_tpu.bin.train_3d import _join_final_save

    class FailingJoin:
        def __init__(self, exc):
            self.exc = exc

        def join(self, timeout=None):
            raise self.exc

    # 1. no exception in flight: the save failure IS the primary error
    with pytest.raises(ValueError, match='save blew up'):
        _join_final_save(FailingJoin(ValueError('save blew up')),
                         in_flight=False)

    # 2. training exception in flight: save failure deferred, primary wins
    _join_final_save(FailingJoin(ValueError('save blew up')), in_flight=True)

    # 3. BaseException from the save thread also defers to the primary
    _join_final_save(FailingJoin(SystemExit(3)), in_flight=True)

    # 4. even while an OUTER frame is handling an unrelated exception, a
    # clean run's save failure must still surface (the sys.exc_info()
    # approach failed exactly this case)
    try:
        raise KeyError('outer handler context')
    except KeyError:
        with pytest.raises(ValueError, match='save blew up'):
            _join_final_save(FailingJoin(ValueError('save blew up')),
                             in_flight=False)

    # 5. no save thread, no exception: plain no-op
    _join_final_save(None, in_flight=False)


def test_checkpoint_save_multihost_forces_synchronous(tmp_path, monkeypatch):
    """On multi-host runs the payload still references live device shards
    (each process writes only its addressable shards), which the next
    donated train step would delete — so background=True must degrade to a
    synchronous save there."""
    import margipose_tpu.train.checkpoint as ckpt_mod

    model = small_model()
    opt = optax.sgd(0.1)
    state = create_train_state(
        model, jax.random.PRNGKey(0), opt, input_shape=(1, 64, 64, 3))
    desc = {'type': 'margipose', 'version': '6.0.1',
            'settings': {'n_stages': 1, 'feature_extractor': 'resnet18'}}

    monkeypatch.setattr(ckpt_mod, '_is_multihost', lambda: True)
    thread = ckpt_mod.save_checkpoint(str(tmp_path / 'ckpt'), state, desc,
                                      extra={'epoch': 1}, background=True)
    assert thread is None  # synchronous: the save is already on disk
    assert ckpt_mod.load_meta(str(tmp_path / 'ckpt'))['epoch'] == 1
