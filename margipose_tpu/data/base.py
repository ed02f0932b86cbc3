"""Pose dataset base class, samplers, and batch collation.

TPU-native re-design of the reference's dataset layer
(reference: src/margipose/data/__init__.py:23-232). Datasets are plain
Python classes producing numpy sample dicts; batching is done by a
thread-based loader (see ``margipose_tpu.data.loader``) producing
fixed-shape NHWC numpy batches for device prefetch.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np

from margipose_tpu.data.specs import DataSpecs
from margipose_tpu.geometry.camera import CameraIntrinsics
from margipose_tpu.geometry.coords import ensure_homogeneous
from margipose_tpu.geometry.normaliser import SkeletonNormaliser
from margipose_tpu.geometry.skeleton import (
    SkeletonDesc,
    make_eval_scale_bone_lengths,
    make_eval_scale_skeleton_height,
)
from margipose_tpu.geometry.transforms import TransformerContext


def as_rgb_array(img) -> np.ndarray:
    """HWC uint8 view/copy of a PIL RGB image or passthrough for arrays."""
    if isinstance(img, np.ndarray):
        return img
    return np.asarray(img.convert('RGB') if img.mode != 'RGB' else img)


class PoseDataset(ABC):
    # On-device augmentation (BASELINE north star): when ``device_aug`` is
    # set on a dataset with a fixed raw source size (``raw_size``), samples
    # carry the raw uint8 frame + the composed affine + colour params instead
    # of a host-warped 'input'; the trainer applies
    # ops.image.device_augment as one fused XLA program over the batch.
    device_aug = False
    raw_size = None  # (height, width) of raw frames, when fixed

    def __init__(self, data_specs: DataSpecs):
        self.data_specs = data_specs
        self.skeleton_normaliser = SkeletonNormaliser()

    def device_aug_fields(self, ctx: "TransformerContext", orig_image) -> dict:
        """Sample fields for the on-device augmentation path."""
        arr = as_rgb_array(orig_image)
        assert self.raw_size is not None and arr.shape[:2] == tuple(self.raw_size), (
            f'device_aug needs fixed {self.raw_size} raw frames, got {arr.shape}')
        affine = np.eye(3, dtype=np.float32)
        a = np.asarray(ctx.affine, np.float32)
        affine[:a.shape[0]] = a
        o = ctx.opts
        colour = np.asarray([o.get('brightness', 1.0), o.get('contrast', 1.0),
                             o.get('saturation', 1.0), o.get('hue', 0.0)],
                            np.float32)
        return {'raw_image': np.ascontiguousarray(arr),
                'aug_affine': affine, 'aug_colour': colour}

    # ------------------------------------------------------------------ #
    # Sampling
    # ------------------------------------------------------------------ #

    def sampler(self, examples_per_epoch=None, seed=None):
        """Uniform random sampler; with replacement only when
        examples_per_epoch exceeds the dataset size
        (reference: src/margipose/data/__init__.py:28-40)."""
        return RandomSampler(len(self), examples_per_epoch, seed=seed)

    # ------------------------------------------------------------------ #
    # Conversions
    # ------------------------------------------------------------------ #

    def input_to_pil_image(self, arr):
        return self.data_specs.input_specs.unconvert(arr)

    def input_to_tensor(self, img):
        return self.data_specs.input_specs.convert(img)

    @property
    def skeleton_desc(self) -> SkeletonDesc:
        return self.data_specs.output_specs.skeleton_desc

    # ------------------------------------------------------------------ #
    # Normalisation (reference: src/margipose/data/__init__.py:52-95)
    # ------------------------------------------------------------------ #

    def denormalise_with_depth(self, normalised_skel, z_ref, intrinsics):
        return self.skeleton_normaliser.denormalise_skeleton(
            ensure_homogeneous(np.asarray(normalised_skel, np.float64), d=3),
            z_ref,
            intrinsics,
            self.data_specs.input_specs.height,
            self.data_specs.input_specs.width,
        )

    def denormalise(self, normalised_skel, eval_scale, intrinsics):
        normalised_skel = ensure_homogeneous(
            np.asarray(normalised_skel, np.float64), d=3
        )
        z_ref = self.skeleton_normaliser.infer_depth(
            normalised_skel,
            eval_scale,
            intrinsics,
            self.data_specs.input_specs.height,
            self.data_specs.input_specs.width,
        )
        return self.denormalise_with_depth(normalised_skel, z_ref, intrinsics)

    def denormalise_with_reference(self, normalised_skel, ref_skel, intrinsics, trans_opts):
        untransform = lambda skel: self.untransform_skeleton(skel, trans_opts)
        eval_scale = make_eval_scale_bone_lengths(self.skeleton_desc, untransform, ref_skel)
        return self.denormalise(normalised_skel, eval_scale, intrinsics)

    def denormalise_with_skeleton_height(self, normalised_skel, intrinsics, trans_opts):
        untransform = lambda skel: self.untransform_skeleton(skel, trans_opts)
        eval_scale = make_eval_scale_skeleton_height(self.skeleton_desc, untransform)
        return self.denormalise(normalised_skel, eval_scale, intrinsics)

    def to_image_space(self, index, normalised, intrinsics):
        z_ref = 100  # depth is irrelevant for a 2D projection
        denormalised = self.denormalise_with_depth(normalised, z_ref, intrinsics)
        return intrinsics.project_cartesian(denormalised)

    # ------------------------------------------------------------------ #
    # Transforms (reference: src/margipose/data/__init__.py:97-115)
    # ------------------------------------------------------------------ #

    @staticmethod
    def create_transformer_context(opts) -> TransformerContext:
        return TransformerContext(opts)

    def untransform_skeleton(self, denorm_skel, trans_opts):
        """Transform a denormalised skeleton back into universal camera space."""
        ctx = self.create_transformer_context(trans_opts)
        return ctx.untransform(denorm_skel)

    # ------------------------------------------------------------------ #
    # Evaluation
    # ------------------------------------------------------------------ #

    @abstractmethod
    def to_canonical_skeleton(self, skel):
        """Convert output skeleton into a canonical 17-joint skeleton."""

    def _evaluate_3d(self, index, original_skel, norm_pred, camera_intrinsics,
                     transform_opts):
        raise NotImplementedError()

    def evaluate_3d_batch(self, batch, norm_preds):
        """(reference: src/margipose/data/__init__.py:135-146)"""
        # one host-side copy of valid_depth up front: it may be a (sharded)
        # device array after loader prefetch, and element-indexing it would
        # be a blocking readback per row — or an error on multi-process
        # meshes where the global array is not fully addressable
        from margipose_tpu.parallel.mesh import host_local_values

        valid_depth = np.asarray(host_local_values(batch['valid_depth']))
        return [
            self._evaluate_3d(
                batch['index'][i],
                batch['original_skel'][i],
                norm_preds[i],
                batch['camera_intrinsic'][i],
                batch['transform_opts'][i],
            )
            for i in range(len(norm_preds))
            if valid_depth[i] == 1
        ]

    @abstractmethod
    def __len__(self):
        ...

    @abstractmethod
    def __getitem__(self, index):
        ...


class RandomSampler:
    """Uniform sampler with a fixed number of examples per epoch."""

    def __init__(self, total_length, examples_per_epoch=None, seed=None):
        self.total_length = total_length
        self.examples_per_epoch = examples_per_epoch or total_length
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return self.examples_per_epoch

    def __iter__(self):
        n, total = self.examples_per_epoch, self.total_length
        if n > total:
            yield from self.rng.randint(0, total, size=n).tolist()
        else:
            yield from self.rng.permutation(total)[:n].tolist()


class SequentialSampler:
    def __init__(self, total_length):
        self.total_length = total_length

    def __len__(self):
        return self.total_length

    def __iter__(self):
        return iter(range(self.total_length))


def collate(samples: list) -> dict:
    """Stack numpy-array fields; pass through cameras / dicts / scalars as
    lists (reference: src/margipose/data/__init__.py:157-186)."""
    if len(samples) == 0:
        return samples
    first = samples[0]
    if isinstance(first, np.ndarray):
        return np.stack(samples, axis=0)
    if isinstance(first, (int, float, np.integer, np.floating)):
        return np.asarray(samples)
    if isinstance(first, CameraIntrinsics):
        return list(samples)
    if isinstance(first, dict):
        return {k: _collate_field([s[k] for s in samples]) for k in first}
    if isinstance(first, (list, tuple)):
        return list(samples)
    return list(samples)


def _collate_field(values: list):
    first = values[0]
    if isinstance(first, np.ndarray):
        return np.stack(values, axis=0)
    if isinstance(first, (int, float, np.integer, np.floating)):
        return np.asarray(values)
    return list(values)
