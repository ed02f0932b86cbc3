"""The REAL MpiInf3dDataset driven end-to-end on a procedural miniature
dataset in the processed on-disk layout (margipose_tpu/data/fake_mpi3d.py)
— compositing augmentation, multicrop, and the 3D eval path included.
(reference: src/margipose/data/mpi_inf_3dhp/__init__.py:20-429; the real
dataset tests there skip without /datasets, reference tests/conftest.py:68-81.)
"""

import numpy as np
import pytest

from margipose_tpu.data.fake_mpi3d import generate_fake_mpi3d
from margipose_tpu.data.mpi_inf_3dhp import MpiInf3dDataset
from margipose_tpu.data.specs import DataSpecs, ImageSpecs, JointsSpecs
from margipose_tpu.geometry.coords import ensure_homogeneous
from margipose_tpu.geometry.skeleton import CanonicalSkeletonDesc

N_FRAMES = 3
CAMERAS = (0, 2)


@pytest.fixture(scope='module')
def fake_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp('fake_mpi3d'))
    # S2/Seq2 is bg/ub/lb-augmentable (mpi3d_sequence_info.json), so the
    # full compositing path is reachable.
    return generate_fake_mpi3d(out, seqs=((2, 2),), camera_ids=CAMERAS,
                               n_frames=N_FRAMES)


def canonical_specs():
    return DataSpecs(ImageSpecs(256), JointsSpecs(CanonicalSkeletonDesc, n_dims=3))


def test_dataset_scans_processed_layout(fake_dir):
    ds = MpiInf3dDataset(fake_dir, data_specs=canonical_specs())
    assert len(ds) == len(CAMERAS) * N_FRAMES
    sample = ds[0]
    assert sample['input'].shape == (256, 256, 3)
    assert sample['target'].shape[-2:] in ((17, 3), (17, 4))
    assert sample['valid_depth'] == 1
    assert np.all(np.abs(sample['target'][:, :2]) <= 1.2)


def test_compositing_augmentation_runs(fake_dir):
    ds = MpiInf3dDataset(fake_dir, data_specs=canonical_specs(),
                         use_aug=True, seed=7)
    baseline = MpiInf3dDataset(fake_dir, data_specs=canonical_specs())[0]['input']
    changed = False
    for _ in range(4):  # several epochs so bg/ub/lb compositing all trigger
        for i in range(len(ds)):
            s = ds[i]
            assert np.isfinite(s['input']).all()
            assert np.isfinite(s['target']).all()
            if i == 0 and not np.allclose(s['input'], baseline):
                changed = True
    assert changed, 'augmentation never changed example 0'


def test_multicrop_returns_ten_crop_batch(fake_dir):
    ds = MpiInf3dDataset(fake_dir, data_specs=canonical_specs())
    ds.multicrop = True
    batch = ds[0]
    assert batch['input'].shape == (10, 256, 256, 3)
    assert batch['target'].shape[:2] == (10, 17)


def test_eval_path_with_perfect_predictions(fake_dir):
    from margipose_tpu.data.loader import make_dataloader

    ds = MpiInf3dDataset(fake_dir, data_specs=canonical_specs())
    loader = make_dataloader(ds, batch_size=len(ds))
    batch = next(iter(loader))
    preds = ensure_homogeneous(np.asarray(batch['target'], np.float64), d=3)
    metrics = ds.evaluate_3d_batch(batch, preds)
    assert len(metrics) == len(ds)
    for m in metrics:
        assert np.isfinite(m['mpjpe'])
        # known_depth=False: depth is inferred via the 920mm knee-neck
        # heuristic, so even perfect normalised predictions carry a small
        # scale error — but nothing like a wrong-path blowup.
        assert m['aligned_mpjpe'] < 120, m


@pytest.fixture(scope='module')
def mpi3d_test_env(tmp_path_factory):
    """Fake mpi3d-test data + a tiny trained checkpoint for eval-CLI tests."""
    root = tmp_path_factory.mktemp('mpi3d_test_env')
    base = root / 'datasets'
    generate_fake_mpi3d(str(base / 'mpi3d' / 'test'), seqs=((1, 1),),
                        camera_ids=(0,), n_frames=2, with_activities=True)

    from margipose_tpu.bin.train_3d import ex, run_training

    out_dir = str(root / 'out')
    cfg = ex.parse([
        'with', 'synthetic', 'sgd_simple', f'out_dir={out_dir}', 'epochs=1',
        'batch_size=8', 'train_examples=8', 'val_examples=0', 'lr=0.02',
        'num_workers=0', 'metrics_every=1', 'experiment_id=t',
        "model_desc={'type': 'margipose', 'version': '6.0.1', "
        "'settings': {'n_stages': 1, 'feature_extractor': 'resnet18', "
        "'input_size': 96}}",
        'train_datasets=["synthetic-8"]', 'val_datasets=[]', 'use_aug=False',
    ])
    run_training(cfg)
    return str(base), str(root / 'out' / 't' / 'model-latest')


def test_eval_cli_on_fake_mpi3d_test(mpi3d_test_env, monkeypatch, capsys):
    """The production eval surface (gate config #2 shape): eval CLI on
    mpi3d-test with by-sequence / by-activity / overall tables
    (reference: src/margipose/bin/eval_3d.py:97-163)."""
    from margipose_tpu.bin.eval_3d import main as eval_main

    base, ckpt = mpi3d_test_env
    monkeypatch.setenv('MARGIPOSE_BASE_DATA_DIR', base)

    eval_main(['eval', '--model', ckpt, '--dataset', 'mpi3d-test'],
              {'device': 'auto'})
    out = capsys.readouterr().out
    assert 'By sequence' in out and 'By activity' in out and 'Overall' in out
    assert 'S1/Seq1' in out


def test_eval_cli_multicrop_on_fake_mpi3d_test(mpi3d_test_env, monkeypatch,
                                               capsys):
    """Multicrop eval through the CLI on the real dataset class: each example
    becomes a 10-crop batch (2 flips x 5 offsets) whose predictions are
    averaged (reference: src/margipose/data/mpi_inf_3dhp/__init__.py:332-360,
    src/margipose/bin/eval_3d.py:124-136)."""
    from margipose_tpu.bin.eval_3d import main as eval_main

    base, ckpt = mpi3d_test_env
    monkeypatch.setenv('MARGIPOSE_BASE_DATA_DIR', base)

    eval_main(['eval', '--model', ckpt, '--dataset', 'mpi3d-test',
               '--multicrop'], {'device': 'auto'})
    out = capsys.readouterr().out
    assert 'Overall' in out and 'S1/Seq1' in out


def test_loader_augmentation_deterministic_any_worker_count(fake_dir):
    """Augmentation draws are a pure function of (dataset seed, epoch,
    sampler position, index) — bit-identical batches for ANY num_workers,
    across repeat runs, with fresh draws each epoch. The reference is only
    deterministic per worker-process count (its per-worker reseeding,
    reference: src/margipose/data/__init__.py:189-190); here the contract is
    worker-count-invariant (PoseDataset.example_rng, loader set_epoch)."""
    from margipose_tpu.data.loader import DataLoader

    def collect(num_workers, epochs=2):
        ds = MpiInf3dDataset(fake_dir, data_specs=canonical_specs(),
                             use_aug=True, seed=11)
        loader = DataLoader(ds, batch_size=3, num_workers=num_workers)
        out = []
        for epoch in range(epochs):
            loader.set_epoch(epoch)
            for batch in loader:
                out.append((np.asarray(batch['input']),
                            np.asarray(batch['target'])))
        return out

    sync = collect(0)
    threaded = collect(4)
    threaded2 = collect(4)
    assert len(sync) == len(threaded) == len(threaded2) == 4
    for (i0, t0), (i1, t1), (i2, t2) in zip(sync, threaded, threaded2):
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_array_equal(t0, t1)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(t1, t2)

    # same (sequential) order both epochs, yet epoch-1 draws are fresh
    n_batches = len(sync) // 2
    assert not all(
        np.array_equal(sync[b][0], sync[n_batches + b][0])
        for b in range(n_batches)
    ), 'epoch 1 reused epoch 0 augmentation draws'


def test_loader_epoch_pinned_order_and_aug(fake_dir):
    """A FRESH loader pinned to epoch k (``set_epoch``) reproduces exactly
    the k-th epoch — sample order AND augmentation draws — of a loader that
    iterated epochs 0..k. This is what makes ``resume=`` training replay an
    uninterrupted run's remaining sample sequence: both the sampler order
    (RandomSampler.iter_epoch) and the per-example aug RNGs are pure
    functions of (seed, epoch)."""
    from margipose_tpu.data.loader import DataLoader

    def make_loader():
        ds = MpiInf3dDataset(fake_dir, data_specs=canonical_specs(),
                             use_aug=True, seed=11)
        return DataLoader(ds, batch_size=3,
                          sampler=ds.sampler(examples_per_epoch=6, seed=5),
                          num_workers=0)

    full = make_loader()
    epochs = []
    for e in range(3):
        full.set_epoch(e)
        epochs.append([(np.asarray(b['index']), np.asarray(b['input']))
                       for b in full])

    resumed = make_loader()
    resumed.set_epoch(2)
    third = [(np.asarray(b['index']), np.asarray(b['input']))
             for b in resumed]

    assert len(third) == len(epochs[2]) == 2
    for (idx_a, in_a), (idx_b, in_b) in zip(epochs[2], third):
        np.testing.assert_array_equal(idx_a, idx_b)
        np.testing.assert_array_equal(in_a, in_b)
    # tripwire: the three epochs must not all share one order, or the
    # epoch pinning is vacuous
    assert not all(
        np.array_equal(epochs[0][b][0], epochs[1][b][0]) for b in range(2))
