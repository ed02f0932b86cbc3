"""On-device augmentation path (BASELINE north star): datasets emit raw
frames + composed affines + colour params, and ops.image.device_augment
applies warp + colour + normalise as one fused XLA program over the batch.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from margipose_tpu.data.loader import device_prefetch, make_dataloader
from margipose_tpu.data.synthetic import SyntheticPoseDataset
from margipose_tpu.ops.image import device_augment


def _aug_input(batch, out_h, out_w, mean, std):
    raw = jnp.asarray(batch['raw_image']).astype(jnp.float32) / 255.0
    colour = jnp.asarray(batch['aug_colour'])
    return device_augment(raw, jnp.asarray(batch['aug_affine']), out_h, out_w,
                          colour[:, 0], colour[:, 1], colour[:, 2],
                          colour[:, 3], mean, std)


def test_device_aug_sample_fields():
    ds = SyntheticPoseDataset(length=4, use_aug=True, seed=3, image_size=128)
    ds.device_aug = True
    s = ds[0]
    assert 'input' not in s
    assert s['raw_image'].shape == (128, 128, 3) and s['raw_image'].dtype == np.uint8
    assert s['aug_affine'].shape == (3, 3)
    assert s['aug_colour'].shape == (4,)
    # geometry fields unchanged by the mode
    assert s['target'].shape[-2] == 17


def test_device_aug_matches_host_pipeline():
    """Same example, same seed: the fused on-device warp+colour+normalise
    must match the host path's 'input' (which quantises to uint8 between
    colour and normalise, hence the tolerance)."""
    host = SyntheticPoseDataset(length=2, use_aug=True, seed=11, image_size=128)
    dev = SyntheticPoseDataset(length=2, use_aug=True, seed=11, image_size=128)
    dev.device_aug = True

    spec = host.data_specs.input_specs
    for i in range(2):
        h_sample = host[i]
        d_sample = dev[i]
        np.testing.assert_allclose(h_sample['target'], d_sample['target'],
                                   atol=1e-6)
        batch = {k: np.asarray(v)[None] for k, v in d_sample.items()
                 if k in ('raw_image', 'aug_affine', 'aug_colour')}
        out = np.asarray(_aug_input(batch, spec.height, spec.width,
                                    tuple(spec.mean), tuple(spec.stddev)))[0]
        assert out.shape == h_sample['input'].shape
        err = np.abs(out - h_sample['input'])
        # normalised units; 0.05 ~= 2.5 grey levels
        assert np.percentile(err, 99) < 0.06, float(np.percentile(err, 99))
        assert err.mean() < 0.02, float(err.mean())


@pytest.mark.slow  # 27s measured (r4 durations profile)
def test_device_aug_end_to_end_training():
    """run_training with device_aug=True on the synthetic dataset."""
    from margipose_tpu.bin.train_3d import ex, run_training

    cfg = ex.parse([
        'with', 'synthetic', 'sgd_simple',
        'out_dir=', 'epochs=1', 'batch_size=8', 'train_examples=16',
        'val_examples=0', 'lr=0.02', 'num_workers=0', 'metrics_every=1',
        'device_aug=True', 'use_aug=True',
        "model_desc={'type': 'margipose', 'version': '6.0.1', "
        "'settings': {'n_stages': 1, 'feature_extractor': 'resnet18', "
        "'input_size': 96}}",
        'train_datasets=["synthetic-16"]', 'val_datasets=[]',
    ])
    result = run_training(cfg)
    assert np.isfinite(result['train_mpjpe'])


def test_device_prefetch_ships_raw_fields():
    ds = SyntheticPoseDataset(length=4, use_aug=True, seed=0, image_size=64)
    ds.device_aug = True
    loader = make_dataloader(ds, batch_size=2)
    batch = next(iter(device_prefetch(iter(loader))))
    import jax

    assert isinstance(batch['raw_image'], jax.Array)
    assert isinstance(batch['aug_affine'], jax.Array)


def test_device_prefetch_uint8_ship_roundtrip():
    """device_prefetch(requantize=specs) ships host-warped inputs as their
    exact source uint8 pixels, and device-side re-normalisation reproduces
    the float32 input (lossless: the host pipeline rounds to uint8
    immediately before normalising — ImageSpecs.requantize)."""
    ds = SyntheticPoseDataset(length=4, use_aug=True, seed=7, image_size=64)
    loader = make_dataloader(ds, batch_size=2)
    spec = ds.data_specs.input_specs
    batches = list(loader)
    ref = np.asarray(batches[0]['input'], np.float32).copy()

    out = next(device_prefetch(iter(batches), requantize=spec))
    assert out['input'].dtype == jnp.uint8
    mean = np.asarray(spec.mean if spec.mean is not None else 0.0, np.float32)
    std = np.asarray(spec.stddev if spec.stddev is not None else 1.0,
                     np.float32)
    renorm = (np.asarray(out['input'], np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(renorm, ref, atol=3e-6)


def test_device_aug_mpii_letterbox_pad_matches_host(tmp_path):
    """Variable-size source SMALLER than the canvas: pad-only letterboxing is
    parity-exact with the host warp (the pad zeros equal the host warp's
    out-of-bounds fill), same tolerance as the fixed-size parity test."""
    from margipose_tpu.data.fakes import generate_fake_mpii
    from margipose_tpu.data.mpii import MpiiDataset
    from margipose_tpu.models import default_data_specs

    data_dir = generate_fake_mpii(str(tmp_path / 'mpii'), n_train=2, n_val=0,
                                  img_size=512)
    specs = default_data_specs()
    host = MpiiDataset(data_dir, specs, subset='train', use_aug=True, seed=5)
    dev = MpiiDataset(data_dir, specs, subset='train', use_aug=True, seed=5)
    dev.device_aug = True
    dev.device_aug_canvas = (768, 768)

    spec = specs.input_specs
    for i in range(2):
        h_sample = host[i]
        d_sample = dev[i]
        np.testing.assert_allclose(h_sample['target'], d_sample['target'],
                                   atol=1e-6)
        assert 'input' not in d_sample
        assert d_sample['raw_image'].shape == (768, 768, 3)
        batch = {k: np.asarray(v)[None] for k, v in d_sample.items()
                 if k in ('raw_image', 'aug_affine', 'aug_colour')}
        out = np.asarray(_aug_input(batch, spec.height, spec.width,
                                    tuple(spec.mean), tuple(spec.stddev)))[0]
        err = np.abs(out - h_sample['input'])
        assert np.percentile(err, 99) < 0.06, float(np.percentile(err, 99))
        assert err.mean() < 0.02, float(err.mean())


def test_device_aug_mpii_letterbox_downscale_matches_host(tmp_path):
    """Source LARGER than the canvas: the frame is bilinearly downscaled to
    fit and the placement scale folded into the affine. The device path
    resamples twice (downscale, then warp) so the tolerance is looser than
    the pad-only case, but geometry must still line up."""
    from margipose_tpu.data.fakes import generate_fake_mpii
    from margipose_tpu.data.mpii import MpiiDataset
    from margipose_tpu.models import default_data_specs

    data_dir = generate_fake_mpii(str(tmp_path / 'mpii'), n_train=2, n_val=0,
                                  img_size=1024)
    specs = default_data_specs()
    host = MpiiDataset(data_dir, specs, subset='train', use_aug=True, seed=7)
    dev = MpiiDataset(data_dir, specs, subset='train', use_aug=True, seed=7)
    dev.device_aug = True
    dev.device_aug_canvas = (768, 768)

    spec = specs.input_specs
    for i in range(2):
        h_sample = host[i]
        d_sample = dev[i]
        np.testing.assert_allclose(h_sample['target'], d_sample['target'],
                                   atol=1e-6)
        assert d_sample['raw_image'].shape == (768, 768, 3)
        batch = {k: np.asarray(v)[None] for k, v in d_sample.items()
                 if k in ('raw_image', 'aug_affine', 'aug_colour')}
        out = np.asarray(_aug_input(batch, spec.height, spec.width,
                                    tuple(spec.mean), tuple(spec.stddev)))[0]
        err = np.abs(out - h_sample['input'])
        assert err.mean() < 0.08, float(err.mean())
        assert np.median(err) < 0.05, float(np.median(err))


def test_device_aug_crop_ship_matches_host():
    """Crop-ship mode: shipping only the affine's source region (letterboxed
    onto a small canvas, offset folded into the affine) must match the host
    warp to the same tolerance as full-frame mode whenever the crop fits the
    canvas without downscaling (pure memcpy + translation fold)."""
    host = SyntheticPoseDataset(length=3, use_aug=True, seed=21, image_size=256)
    dev = SyntheticPoseDataset(length=3, use_aug=True, seed=21, image_size=256)
    dev.device_aug = True
    dev.device_aug_crop = True
    dev.device_aug_canvas = (384, 384)  # >= any crop of a 256px frame

    spec = host.data_specs.input_specs
    for i in range(3):
        h_sample = host[i]
        d_sample = dev[i]
        np.testing.assert_allclose(h_sample['target'], d_sample['target'],
                                   atol=1e-6)
        assert d_sample['raw_image'].shape == (384, 384, 3)
        batch = {k: np.asarray(v)[None] for k, v in d_sample.items()
                 if k in ('raw_image', 'aug_affine', 'aug_colour')}
        out = np.asarray(_aug_input(batch, spec.height, spec.width,
                                    tuple(spec.mean), tuple(spec.stddev)))[0]
        err = np.abs(out - h_sample['input'])
        assert np.percentile(err, 99) < 0.06, float(np.percentile(err, 99))
        assert err.mean() < 0.02, float(err.mean())


def test_device_aug_crop_ship_mpii_large_frames(tmp_path):
    """Crop-ship on large variable-size MPII frames: crops larger than the
    canvas downscale (one extra resample), smaller ones fold exactly."""
    from margipose_tpu.data.fakes import generate_fake_mpii
    from margipose_tpu.data.mpii import MpiiDataset
    from margipose_tpu.models import default_data_specs

    data_dir = generate_fake_mpii(str(tmp_path / 'mpii'), n_train=2, n_val=0,
                                  img_size=1024)
    specs = default_data_specs()
    host = MpiiDataset(data_dir, specs, subset='train', use_aug=True, seed=9)
    dev = MpiiDataset(data_dir, specs, subset='train', use_aug=True, seed=9)
    dev.device_aug = True
    dev.device_aug_crop = True
    dev.device_aug_canvas = (384, 384)

    spec = specs.input_specs
    for i in range(2):
        h_sample = host[i]
        d_sample = dev[i]
        np.testing.assert_allclose(h_sample['target'], d_sample['target'],
                                   atol=1e-6)
        assert d_sample['raw_image'].shape == (384, 384, 3)
        batch = {k: np.asarray(v)[None] for k, v in d_sample.items()
                 if k in ('raw_image', 'aug_affine', 'aug_colour')}
        out = np.asarray(_aug_input(batch, spec.height, spec.width,
                                    tuple(spec.mean), tuple(spec.stddev)))[0]
        err = np.abs(out - h_sample['input'])
        assert err.mean() < 0.08, float(err.mean())
        assert np.median(err) < 0.05, float(np.median(err))


def test_device_aug_flagship_mixed_mpi3d_mpii_loader(tmp_path, monkeypatch):
    """The FLAGSHIP production recipe shape — mixed mpi3d-trainval +
    mpii-trainval — with device_aug=True: every batch ships one static
    (768, 768) raw canvas regardless of source frame size
    (reference recipe: src/margipose/bin/train_3d.py:242-243)."""
    from margipose_tpu.data.fake_mpi3d import generate_fake_mpi3d
    from margipose_tpu.data.fakes import generate_fake_mpii
    from margipose_tpu.models import default_data_specs
    from margipose_tpu.train.helpers import create_train_dataloader

    base = tmp_path / 'datasets'
    generate_fake_mpi3d(str(base / 'mpi3d' / 'train'), seqs=((1, 1),),
                        camera_ids=(0,), n_frames=3)
    generate_fake_mpi3d(str(base / 'mpi3d' / 'val'), seqs=((2, 1),),
                        camera_ids=(0,), n_frames=3, seed=1)
    generate_fake_mpii(str(base / 'mpii'), n_train=4, n_val=2, img_size=512)
    monkeypatch.setenv('MARGIPOSE_BASE_DATA_DIR', str(base))

    loader = create_train_dataloader(
        ['mpi3d-trainval', 'mpii-trainval'], default_data_specs(), batch_size=4,
        examples_per_epoch=4, use_aug=True, num_workers=0, seed=0,
        device_aug=True)
    batch = next(iter(loader))
    assert batch['raw_image'].shape == (4, 768, 768, 3)
    assert batch['aug_affine'].shape == (4, 3, 3)
    assert batch['aug_colour'].shape == (4, 4)
    assert 'input' not in batch
    assert np.isfinite(batch['aug_affine']).all()
    # round-robin: both 3D (valid_depth=1) and 2D (valid_depth=0) present
    vd = np.asarray(batch['valid_depth'])
    assert set(vd.tolist()) == {0, 1}


def test_device_aug_end_to_end_training_mixed_mpi3d_mpii(tmp_path, monkeypatch):
    """run_training with device_aug=True on the flagship mixed recipe shape
    (fake mpi3d + fake mpii, mixed 2D/3D supervision, letterboxed canvas)."""
    from margipose_tpu.bin.train_3d import ex, run_training
    from margipose_tpu.data.fake_mpi3d import generate_fake_mpi3d
    from margipose_tpu.data.fakes import generate_fake_mpii

    base = tmp_path / 'datasets'
    generate_fake_mpi3d(str(base / 'mpi3d' / 'train'), seqs=((1, 1),),
                        camera_ids=(0,), n_frames=3)
    generate_fake_mpi3d(str(base / 'mpi3d' / 'val'), seqs=((2, 1),),
                        camera_ids=(0,), n_frames=3, seed=1)
    generate_fake_mpii(str(base / 'mpii'), n_train=4, n_val=2, img_size=512)
    monkeypatch.setenv('MARGIPOSE_BASE_DATA_DIR', str(base))

    cfg = ex.parse([
        'with', 'sgd_simple',
        'out_dir=', 'epochs=1', 'batch_size=8', 'train_examples=8',
        'val_examples=0', 'lr=0.02', 'num_workers=0', 'metrics_every=1',
        'device_aug=True', 'use_aug=True',
        "model_desc={'type': 'margipose', 'version': '6.0.1', "
        "'settings': {'n_stages': 1, 'feature_extractor': 'resnet18', "
        "'input_size': 96}}",
        'train_datasets=["mpi3d-trainval", "mpii-trainval"]', 'val_datasets=[]',
    ])
    result = run_training(cfg)
    assert np.isfinite(result['train_mpjpe'])


def test_device_aug_through_mixed_mpi3d_trainval(tmp_path, monkeypatch):
    """The stock `mpi3d-trainval` name (a MixedPoseDataset) must support the
    on-device augmentation path: raw_size is inherited from the children and
    device_aug propagates to them, with raw_image/aug_* fields passed
    through batching."""
    import numpy as np

    from margipose_tpu.data.fake_mpi3d import generate_fake_mpi3d
    from margipose_tpu.models import default_data_specs
    from margipose_tpu.train.helpers import create_train_dataloader

    base = tmp_path / 'datasets'
    generate_fake_mpi3d(str(base / 'mpi3d' / 'train'), seqs=((1, 1),),
                        camera_ids=(0,), n_frames=3)
    generate_fake_mpi3d(str(base / 'mpi3d' / 'val'), seqs=((2, 1),),
                        camera_ids=(0,), n_frames=3, seed=1)
    monkeypatch.setenv('MARGIPOSE_BASE_DATA_DIR', str(base))

    loader = create_train_dataloader(
        ['mpi3d-trainval'], default_data_specs(), batch_size=4,
        examples_per_epoch=4, use_aug=True, num_workers=0, seed=0,
        device_aug=True)
    batch = next(iter(loader))
    assert batch['raw_image'].shape == (4, 768, 768, 3)
    assert batch['aug_affine'].shape == (4, 3, 3)
    assert batch['aug_colour'].shape == (4, 4)
    assert 'input' not in batch
    assert np.isfinite(batch['aug_affine']).all()
