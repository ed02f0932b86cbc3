"""The REAL H36MDataset and MpiiDataset driven on procedural miniature
datasets in their processed layouts (margipose_tpu/data/fakes.py).
(reference: src/margipose/data/h36m/__init__.py, src/margipose/data/mpii/__init__.py —
the reference has NO tests for these at all.)
"""

from os import path

import numpy as np
import pytest

from margipose_tpu.data.fakes import generate_fake_h36m, generate_fake_mpii
from margipose_tpu.data.specs import DataSpecs, ImageSpecs, JointsSpecs
from margipose_tpu.geometry.coords import ensure_homogeneous
from margipose_tpu.geometry.skeleton import CanonicalSkeletonDesc


def canonical_specs():
    return DataSpecs(ImageSpecs(256), JointsSpecs(CanonicalSkeletonDesc, n_dims=3))


@pytest.fixture(scope='module')
def h36m_dir(tmp_path_factory):
    return generate_fake_h36m(str(tmp_path_factory.mktemp('fake_h36m')),
                              subjects=(1, 9), camera_ids=(1, 2), n_frames=3)


@pytest.fixture(scope='module')
def mpii_dir(tmp_path_factory):
    return generate_fake_mpii(str(tmp_path_factory.mktemp('fake_mpii')),
                              n_train=4, n_val=2)


def test_h36m_protocol2_split(h36m_dir):
    from margipose_tpu.data.h36m import H36MDataset

    train = H36MDataset(h36m_dir, data_specs=canonical_specs(), subset='trainval')
    test = H36MDataset(h36m_dir, data_specs=canonical_specs(), subset='test')
    # subjects (1,) train / (9,) test, 2 cameras x 3 frames each
    assert len(train) == 6
    assert len(test) == 6
    s = train[0]
    assert s['input'].shape == (256, 256, 3)
    assert s['target'].shape[-2] == 17
    assert s['valid_depth'] == 1


def test_h36m_known_depth_eval(h36m_dir):
    from margipose_tpu.data.h36m import H36MDataset
    from margipose_tpu.data.loader import make_dataloader

    ds = H36MDataset(h36m_dir, data_specs=canonical_specs(), subset='test')
    loader = make_dataloader(ds, batch_size=len(ds))
    batch = next(iter(loader))
    preds = ensure_homogeneous(np.asarray(batch['target'], np.float64), d=3)
    metrics = ds.evaluate_3d_batch(batch, preds)
    # known root depth (reference: src/margipose/data/h36m/__init__.py:212-217):
    # perfect predictions denormalise exactly -> ~0 MPJPE
    for m in metrics:
        assert m['mpjpe'] < 1e-3, m


def test_h36m_augmentation_and_multicrop(h36m_dir):
    from margipose_tpu.data.h36m import H36MDataset

    ds = H36MDataset(h36m_dir, data_specs=canonical_specs(), subset='trainval',
                     use_aug=True, seed=5)
    for i in range(len(ds)):
        s = ds[i]
        assert np.isfinite(s['input']).all()
    ds.multicrop = True
    batch = ds[0]
    assert batch['input'].shape == (10, 256, 256, 3)


def test_mpii_2d_dataset(mpii_dir):
    from margipose_tpu.data.mpii import MpiiDataset

    ds = MpiiDataset(mpii_dir, data_specs=canonical_specs(), subset='train',
                     use_aug=False)
    assert len(ds) == 4
    s = ds[0]
    assert s['input'].shape == (256, 256, 3)
    assert s['valid_depth'] == 0  # 2D-only supervision
    assert s['joint_mask'].shape == (17,)
    # interpolated head + moved spine joints are inside the mask where visible
    assert s['joint_mask'].max() == 1.0


def test_mpii_trainval_split_and_aug(mpii_dir):
    from margipose_tpu.data.mpii import MpiiDataset

    ds = MpiiDataset(mpii_dir, data_specs=canonical_specs(), subset='trainval',
                     use_aug=True, seed=3)
    assert len(ds) == 6
    for i in range(len(ds)):
        s = ds[i]
        assert np.isfinite(s['input']).all()
        assert np.isfinite(s['target']).all()


def test_mixed_mpi3d_mpii_loader(mpii_dir, tmp_path_factory):
    """The production mixed 2D/3D batch shape: mpi3d + mpii round-robin."""
    from margipose_tpu.data.fake_mpi3d import generate_fake_mpi3d
    from margipose_tpu.data.loader import make_dataloader
    from margipose_tpu.data.mixed import MixedPoseDataset
    from margipose_tpu.data.mpi_inf_3dhp import MpiInf3dDataset
    from margipose_tpu.data.mpii import MpiiDataset

    mpi_dir = generate_fake_mpi3d(str(tmp_path_factory.mktemp('mpi3d')),
                                  seqs=((2, 2),), camera_ids=(0,), n_frames=4)
    specs = canonical_specs()
    mixed = MixedPoseDataset([
        MpiInf3dDataset(mpi_dir, data_specs=specs),
        MpiiDataset(mpii_dir, data_specs=specs, subset='train'),
    ])
    loader = make_dataloader(mixed, batch_size=4,
                             sampler=mixed.sampler(examples_per_epoch=8, seed=0))
    batch = next(iter(loader))
    vd = np.asarray(batch['valid_depth'])
    assert batch['input'].shape == (4, 256, 256, 3)
    assert set(vd.tolist()) == {0, 1}, vd  # both 3D and 2D examples present

    # odd batch size: every second batch STARTS with an mpii example, whose
    # dataset-specific sample keys (eg. 'normalize') must not leak into the
    # collated key set (collate takes keys from the first sample)
    odd_loader = make_dataloader(
        mixed, batch_size=3,
        sampler=mixed.sampler(examples_per_epoch=6, seed=0))
    for b in odd_loader:
        assert b['input'].shape[1:] == (256, 256, 3)
        assert 'normalize' not in b


def test_eval_cli_on_fake_h36m_test(tmp_path, monkeypatch, capsys):
    """The production eval surface for h36m (gate config #3 shape): known
    root-joint depth, all 17 canonical joints
    (reference: src/margipose/bin/eval_3d.py:121-146)."""
    from margipose_tpu.bin.eval_3d import main as eval_main
    from margipose_tpu.bin.train_3d import ex, run_training

    base = tmp_path / 'datasets'
    generate_fake_h36m(str(base / 'h36m'), subjects=(9,), camera_ids=(1,),
                       n_frames=2)
    monkeypatch.setenv('MARGIPOSE_BASE_DATA_DIR', str(base))

    out_dir = str(tmp_path / 'out')
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
    ckpt = str(tmp_path / 'out' / 't' / 'model-latest')

    eval_main(['eval', '--model', ckpt, '--dataset', 'h36m-test'],
              {'device': 'auto'})
    out = capsys.readouterr().out
    assert 'Use ground truth root joint depth? True' in out
    assert 'Number of joints in evaluation: 17' in out
    assert 'Overall' in out


def test_train_cli_mixed_mpi3d_mpii_with_aug(tmp_path, monkeypatch):
    """Gate config #5 shape through the production trainer: mixed 2D/3D
    round-robin training on real dataset classes (fake miniature data) with
    FULL augmentation — compositing (backgrounds + clothing masks), affine
    warp, colour jitter — and the vectorised per-example 3D/2D loss switch
    (reference: src/margipose/bin/train_3d.py:126-142,229-264)."""
    from margipose_tpu.bin.train_3d import ex, run_training
    from margipose_tpu.data.fake_mpi3d import generate_fake_mpi3d

    base = tmp_path / 'datasets'
    generate_fake_mpi3d(str(base / 'mpi3d' / 'train'), seqs=((1, 1),),
                        camera_ids=(0,), n_frames=3)
    generate_fake_mpi3d(str(base / 'mpi3d' / 'val'), seqs=((2, 1),),
                        camera_ids=(0,), n_frames=3, seed=1)
    generate_fake_mpii(str(base / 'mpii'), n_train=4, n_val=2)
    monkeypatch.setenv('MARGIPOSE_BASE_DATA_DIR', str(base))

    out_dir = str(tmp_path / 'out')
    cfg = ex.parse([
        'with', 'mpi3d', 'sgd_simple', f'out_dir={out_dir}', 'epochs=1',
        'batch_size=8', 'train_examples=16', 'val_examples=0', 'lr=0.02',
        'num_workers=0', 'metrics_every=1', 'experiment_id=t', 'use_aug=True',
        "model_desc={'type': 'margipose', 'version': '6.0.1', "
        "'settings': {'n_stages': 1, 'feature_extractor': 'resnet18', "
        "'input_size': 96}}",
    ])
    assert cfg['train_datasets'] == ['mpi3d-trainval', 'mpii-trainval']
    result = run_training(cfg)
    assert result['train_pck'] is not None
    assert path.isdir(path.join(out_dir, 't', 'model-latest'))


def test_install_mpii_dataset_is_idempotent(tmp_path):
    """install_mpii_dataset must not re-download anything when the layout is
    already in place (the offline-testable half of the torchdata
    ``install_mpii_dataset`` surface; reference: README.md:53-54)."""
    from margipose_tpu.data.mpii import install_mpii_dataset

    d = generate_fake_mpii(str(tmp_path / 'mpii'), n_train=2, n_val=1)
    # the fake layout carries train/valid only; stand in for test.h5 so the
    # fully-installed state is represented
    open(path.join(d, 'annot', 'test.h5'), 'wb').close()
    downloaded = install_mpii_dataset(d, skip_images=True)
    assert downloaded == []


def test_get_dataset_mpii_trainval_includes_val(tmp_path, monkeypatch):
    """Regression: 'mpii-trainval' must select the trainval subset — a
    prefix-match bug parsed it as 'train' and silently dropped the val
    annotations from the default training mix."""
    from margipose_tpu.data.get_dataset import get_dataset

    base = tmp_path / 'datasets'
    generate_fake_mpii(str(base / 'mpii'), n_train=4, n_val=2)
    monkeypatch.setenv('MARGIPOSE_BASE_DATA_DIR', str(base))

    ds = get_dataset('mpii-trainval', canonical_specs())
    assert ds.subset == 'trainval'
    assert len(ds) == 6  # 4 train + 2 val
    assert len(get_dataset('mpii-train', canonical_specs())) == 4
