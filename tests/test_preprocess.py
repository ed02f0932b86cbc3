"""Unit tests for the MPI-INF-3DHP preprocessor's pure-python numerics
(margipose_tpu/data/mpi3d_preprocess.py; reference:
src/margipose/data/mpi_inf_3dhp/preprocess.py). The ffmpeg frame-extraction
subprocess is exercised only when ffmpeg exists on the host."""

import io
from os import path

import numpy as np
import PIL.Image
import pytest

from margipose_tpu.data.mpi3d_preprocess import (
    Annotations,
    calculate_univ_scale_factor,
    infer_test_intrinsics,
    interesting_frame_indices,
    is_image_ok,
)
from margipose_tpu.data.mpi_inf_3dhp import MpiInf3dhpSkeletonDesc


def _fake_annot(n_frames=10, n_cameras=14, seed=0):
    """Build a synthetic .mat-style annotation dict (cell arrays of
    [n_frames, 28*d] matrices, one per camera)."""
    rng = np.random.RandomState(seed)
    base = rng.uniform(-500, 500, (n_frames, 28, 3)) + [0, 0, 3000]
    annot3 = np.empty((n_cameras, 1), object)
    univ = np.empty((n_cameras, 1), object)
    annot2 = np.empty((n_cameras, 1), object)
    scale = 1.13
    for c in range(n_cameras):
        a3 = base + c  # slight per-camera offset
        root = a3[:, 14:15, :]
        u3 = (a3 - root) / scale + root
        a2 = a3[..., :2] / a3[..., 2:] * 1000 + 1024
        annot3[c, 0] = a3.reshape(n_frames, -1)
        univ[c, 0] = u3.reshape(n_frames, -1)
        annot2[c, 0] = a2.reshape(n_frames, -1)
    return {
        'cameras': np.arange(n_cameras).reshape(-1, 1),
        'frames': np.arange(n_frames).reshape(-1, 1),
        'annot3': annot3,
        'univ_annot3': univ,
        'annot2': annot2,
    }


def test_annotations_reshape():
    annot = Annotations(_fake_annot())
    assert annot.annot3.shape == (14, 10, 28, 3)
    assert annot.annot2.shape == (14, 10, 28, 2)


def test_interesting_frame_indices_movement_threshold():
    raw = _fake_annot(n_frames=6)
    annot = Annotations(raw)
    # make frames 1..2 nearly static relative to frame 0, frame 3 a jump,
    # frame 4 out of 2D bounds, frame 5 another jump
    u = annot.univ_annot3
    u[0, 1] = u[0, 0] + 1.0
    u[0, 2] = u[0, 0] + 5.0
    u[0, 3] = u[0, 0] + 300.0
    u[0, 4] = u[0, 0] + 600.0
    u[0, 5] = u[0, 0] + 900.0
    annot.annot2[0, 4, 0] = [-5.0, 10.0]  # out of bounds
    idx = interesting_frame_indices(annot, 0, 6)
    assert idx == [0, 3, 5]


def test_univ_scale_factor_recovered():
    """The synthetic universal skeleton was built with a single 1.13 factor
    around the root joint; the median-ratio estimator must recover it."""
    raw = _fake_annot()
    annot = Annotations(raw)
    scale = calculate_univ_scale_factor(
        annot.annot3[0], annot.univ_annot3[0], MpiInf3dhpSkeletonDesc)
    assert scale == pytest.approx(1.13, rel=1e-6)


def test_infer_test_intrinsics_recovers_pinhole():
    rng = np.random.RandomState(1)
    fx, fy, cx, cy = 1500.0, 1495.0, 1024.0, 768.0
    x3d = rng.uniform(-800, 800, (50, 28, 3)) + [0, 0, 4000]
    annot2 = np.stack([
        x3d[..., 0] / x3d[..., 2] * fx + cx,
        x3d[..., 1] / x3d[..., 2] * fy + cy,
    ], axis=-1)
    got = infer_test_intrinsics(annot2, x3d)
    assert np.allclose(got, (fx, fy, cx, cy), rtol=1e-6)


def test_is_image_ok_rejects_flash_frames(tmp_path):
    normal = PIL.Image.fromarray(
        np.full((32, 32, 3), 128, np.uint8))
    flash = PIL.Image.fromarray(
        np.full((32, 32, 3), 255, np.uint8))
    p1, p2 = tmp_path / 'ok.jpg', tmp_path / 'flash.png'
    normal.save(p1)
    flash.save(p2)
    assert is_image_ok(str(p1))
    assert not is_image_ok(str(p2))


def test_preprocess_cli_test_set_end_to_end(tmp_path):
    """Drive the preprocess CLI's test-set path (the only one that needs no
    ffmpeg) on a fake RAW test set, then load the output with the REAL
    MpiInf3dDataset (reference: src/margipose/bin/preprocess_mpi3d.py:40-88,
    src/margipose/data/mpi_inf_3dhp/preprocess.py:190-243)."""
    import h5py

    from margipose_tpu.bin.preprocess_mpi3d import main as preprocess_main
    from margipose_tpu.data.fake_mpi3d import generate_fake_raw_mpi3d_test
    from margipose_tpu.data.mpi_inf_3dhp import MpiInf3dDataset
    from margipose_tpu.data.specs import DataSpecs, ImageSpecs, JointsSpecs
    from margipose_tpu.geometry.skeleton import CanonicalSkeletonDesc

    raw_dir = str(tmp_path / 'raw')
    out_dir = str(tmp_path / 'processed')
    generate_fake_raw_mpi3d_test(raw_dir, n_frames=3, img_size=512)

    preprocess_main(['preprocess', '-t', raw_dir, '-o', out_dir])

    # Processed layout: resized frames, inferred-intrinsics calibration,
    # metadata.h5 with 17-joint annotations and valid-frame selection.
    seq_dir = path.join(out_dir, 'test', 'S1', 'Seq1')
    with h5py.File(path.join(seq_dir, 'metadata.h5'), 'r') as f:
        assert f['joints3d'].shape == (1, 3, 17, 3)
        assert abs(float(f['scale'][0]) - 1.05) < 1e-9
        # last frame was marked invalid
        assert list(f['interesting_frames/camera0']) == [0, 1]
    # inferred pinhole intrinsics recover the generator's camera (f=512,
    # c=256 at the raw 512px size)
    calib = open(path.join(seq_dir, 'camera.calibration')).read()
    intr = [float(v) for v in
            [line for line in calib.splitlines() if 'intrinsic' in line][0].split()[1:]]
    assert abs(intr[0] - 512) < 1.0 and abs(intr[2] - 256) < 1.0
    img = PIL.Image.open(path.join(seq_dir, 'imageSequence', 'video_0',
                                   'img_000001.jpg'))
    assert img.height == 768

    # The REAL dataset class consumes the preprocessed output end-to-end.
    specs = DataSpecs(ImageSpecs(96), JointsSpecs(CanonicalSkeletonDesc, n_dims=3))
    ds = MpiInf3dDataset(path.join(out_dir, 'test'), data_specs=specs)
    assert len(ds) == 6 * 2  # 6 sequences x 2 valid frames
    example = ds[0]
    assert example['input'].shape == (96, 96, 3)
    assert example['target'].shape == (17, 4)  # homogeneous
    assert ds.frame_refs[0].activity_id == 1


def test_preprocess_train_sequence_and_masks_end_to_end(tmp_path):
    """The train/val preprocessing path end-to-end WITHOUT ffmpeg, via the
    resume path (frames already extracted): annot.mat ingestion, metadata.h5
    with interesting frames + universal scale, then full mask generation
    (invert, person isolation, chair merge, min/max filtering), and finally
    the REAL MpiInf3dDataset consuming the output with compositing
    augmentation enabled (reference: preprocess.py:39-76,128-187,246-336)."""
    import h5py

    from margipose_tpu.data.fake_mpi3d import generate_fake_raw_mpi3d_train
    from margipose_tpu.data.mpi3d_preprocess import (
        preprocess_masks,
        process_sequence,
    )
    from margipose_tpu.data.mpi_inf_3dhp import MpiInf3dDataset
    from margipose_tpu.data.specs import DataSpecs, ImageSpecs, JointsSpecs
    from margipose_tpu.geometry.skeleton import CanonicalSkeletonDesc

    raw_dir = str(tmp_path / 'raw')
    proc_dir = str(tmp_path / 'processed')
    raw_seq, proc_seq = generate_fake_raw_mpi3d_train(
        raw_dir, proc_dir, subj_id=2, seq_id=2, n_frames=3)

    process_sequence(raw_seq, proc_seq, n_frames=3, blacklist=[])

    with h5py.File(path.join(proc_seq, 'metadata.h5'), 'r') as f:
        assert f['joints3d'].shape == (14, 3, 28, 3)
        assert abs(float(f['scale'][0]) - 1.05) < 1e-9
        # every frame moves >=260mm, so all are interesting, on every camera
        for cid in (0, 1, 2, 4, 5, 6, 7, 8):
            assert list(f[f'interesting_frames/camera{cid}']) == [0, 1, 2]
    assert path.isfile(path.join(proc_seq, 'camera.calibration'))
    assert path.isfile(path.join(proc_seq, 'annot.mat'))

    preprocess_masks(proc_dir, 2, 2)
    for kind in ('foreground_mask', 'up_body_mask', 'low_body_mask'):
        mask_file = path.join(proc_seq, kind, 'video_0', 'img_000001.png')
        assert path.isfile(mask_file), mask_file
        mask = np.asarray(PIL.Image.open(mask_file))
        assert mask.max() > 200 and mask.min() < 50  # person + background

    specs = DataSpecs(ImageSpecs(96), JointsSpecs(CanonicalSkeletonDesc, n_dims=3))
    ds = MpiInf3dDataset(proc_dir, data_specs=specs, use_aug=True, seed=3)
    assert len(ds) == 8 * 3  # 8 VNect cameras x 3 interesting frames
    example = ds[0]
    assert example['input'].shape == (96, 96, 3)
    assert np.isfinite(example['input']).all()
