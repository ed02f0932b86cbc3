import numpy as np
import pytest
from numpy.testing import assert_allclose

from margipose_tpu.data.base import collate
from margipose_tpu.data.get_dataset import get_dataset
from margipose_tpu.data.loader import DataLoader, make_unbatched_dataloader
from margipose_tpu.data.mixed import MixedPoseDataset, RoundRobinSampler
from margipose_tpu.data.synthetic import SyntheticPoseDataset
from margipose_tpu.geometry.coords import ensure_homogeneous
from margipose_tpu.geometry.skeleton import CanonicalSkeletonDesc


def test_synthetic_sample_fields():
    ds = SyntheticPoseDataset(length=4)
    s = ds[0]
    assert s['input'].shape == (256, 256, 3)
    assert s['input'].dtype == np.float32
    assert s['target'].shape == (17, 4)
    assert s['joint_mask'].shape == (17,)
    assert s['valid_depth'] == 1
    # target x/y roughly inside the crop
    assert np.abs(s['target'][:, :2]).max() < 1.5


def test_synthetic_deterministic():
    ds = SyntheticPoseDataset(length=4)
    s1, s2 = ds[1], ds[1]
    assert_allclose(s1['input'], s2['input'])
    assert_allclose(s1['target'], s2['target'])


def test_synthetic_eval_path_with_perfect_predictions():
    """Feeding the ground-truth normalised target through the full
    evaluation path (depth inference via 920mm knee-neck heuristic +
    untransform + Procrustes) must give a small MPJPE.

    The residual error comes only from the 920mm skeleton-height assumption;
    aligned MPJPE absorbs global scale and should be ~0.
    """
    ds = SyntheticPoseDataset(length=2)
    s = ds[0]
    metrics = ds._evaluate_3d(
        s['index'], s['original_skel'], s['target'].astype(np.float64),
        s['camera_intrinsic'], s['transform_opts'],
    )
    assert metrics['aligned_mpjpe'] < 5.0, metrics
    assert metrics['aligned_pck'] == 1.0
    # unaligned error is bounded by the height-assumption scale error
    assert metrics['mpjpe'] < 120.0, metrics


def test_synthetic_eval_with_augmentation():
    ds = SyntheticPoseDataset(length=2, use_aug=True, seed=3)
    s = ds[1]
    metrics = ds._evaluate_3d(
        s['index'], s['original_skel'], s['target'].astype(np.float64),
        s['camera_intrinsic'], s['transform_opts'],
    )
    assert metrics['aligned_mpjpe'] < 5.0, metrics


def test_multicrop_collated():
    ds = SyntheticPoseDataset(length=2)
    ds.multicrop = True
    batch = ds[0]
    assert batch['input'].shape == (10, 256, 256, 3)
    assert batch['target'].shape == (10, 17, 4)
    loader = make_unbatched_dataloader(ds)
    assert len(loader) == 2


def test_unbatched_loader_worker_prefetch_preserves_order():
    """Threaded multicrop prefetch must yield the same items, in dataset
    order, as the synchronous path."""
    ds = SyntheticPoseDataset(length=5)
    ds.multicrop = True
    sync_items = list(make_unbatched_dataloader(ds, num_workers=0))
    threaded_items = list(make_unbatched_dataloader(ds, num_workers=3))
    assert len(threaded_items) == len(sync_items) == 5
    for a, b in zip(sync_items, threaded_items):
        np.testing.assert_array_equal(a['input'], b['input'])
        np.testing.assert_array_equal(a['target'], b['target'])


def test_round_robin_sampler_alternates():
    sampler = RoundRobinSampler([[0, 1, 2], [10, 11, 12]], 6, seed=0)
    indices = list(sampler)
    assert len(indices) == 6
    assert all(i < 3 for i in indices[0::2])
    assert all(i >= 10 for i in indices[1::2])
    # without-replacement coverage within one epoch
    assert sorted(indices[0::2]) == [0, 1, 2]
    assert sorted(indices[1::2]) == [10, 11, 12]


def test_mixed_dataset():
    a = SyntheticPoseDataset(length=3, seed=1)
    b = SyntheticPoseDataset(length=5, seed=2)
    mixed = MixedPoseDataset([a, b])
    assert len(mixed) == 8
    s = mixed[4]  # index 1 in dataset b
    assert s['transform_opts']['dataset_index'] == 1
    # untransform routes through the right source dataset
    denorm = ensure_homogeneous(np.asarray(s['original_skel'], np.float64), 3)
    rec = mixed.untransform_skeleton(denorm, s['transform_opts'])
    assert rec.shape == denorm.shape
    # round-robin sampler alternates sources
    indices = list(mixed.sampler(6, seed=0))
    assert all(i < 3 for i in indices[0::2])
    assert all(i >= 3 for i in indices[1::2])


def test_dataloader_batching():
    ds = SyntheticPoseDataset(length=6)
    loader = DataLoader(ds, batch_size=4, drop_last=False, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]['input'].shape == (4, 256, 256, 3)
    assert batches[1]['input'].shape == (2, 256, 256, 3)
    assert len(batches[0]['camera_intrinsic']) == 4

    loader2 = DataLoader(ds, batch_size=4, drop_last=True)
    assert len(loader2) == 1


def test_get_dataset_synthetic_and_unknown():
    ds = get_dataset('synthetic-8')
    assert len(ds) == 8
    with pytest.raises(ValueError):
        get_dataset('nonexistent-dataset')


def test_collate_passthrough():
    samples = [
        {'a': np.ones(3), 'b': 1, 'c': 'x', 'd': {'k': 1}},
        {'a': np.zeros(3), 'b': 2, 'c': 'y', 'd': {'k': 2}},
    ]
    batch = collate(samples)
    assert batch['a'].shape == (2, 3)
    assert list(batch['b']) == [1, 2]
    assert batch['c'] == ['x', 'y']
    assert isinstance(batch['d'], list) and batch['d'][0] == {'k': 1}


def test_dataset_names_match_exactly():
    """Dataset names must parse exactly: 'mpii-trainval' is trainval (NOT a
    prefix-match on 'train', which silently dropped the val annotations),
    and junk suffixes are rejected (reference: src/margipose/data/get_dataset.py:17-58)."""
    import pytest

    from margipose_tpu.data.get_dataset import get_dataset

    # registry must select the right subset before touching the filesystem:
    # a wrong prefix parse would pick 'train'; the correct parse reaches the
    # data-dir check for trainval
    for name in ['mpii-trainval-x', 'h36m-testfoo', 'mpi3d-trainx']:
        with pytest.raises(ValueError):
            get_dataset(name)
