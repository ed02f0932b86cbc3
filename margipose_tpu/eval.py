"""Evaluation metrics and the 3D-evaluation preparation path.

(reference: src/margipose/eval.py:9-89). Host-side numpy float64 — these run
per example on untransformed, metric-space skeletons.
"""

from __future__ import annotations

import numpy as np

from margipose_tpu.geometry.coords import ensure_cartesian
from margipose_tpu.geometry.skeleton import (
    CanonicalSkeletonDesc,
    absolute_to_root_relative,
    apply_rigid_alignment,
)


def euclidean_distances(actual: np.ndarray, expected: np.ndarray) -> np.ndarray:
    return np.sqrt(np.sum((np.asarray(actual) - np.asarray(expected)) ** 2, axis=-1))


def mpjpe(actual, expected, included_joints=None) -> float:
    """Mean per-joint position error (reference: src/margipose/eval.py:9-13)."""
    dists = euclidean_distances(actual, expected)
    if included_joints is not None:
        dists = dists[..., included_joints]
    return float(dists.mean())


def pck(actual, expected, included_joints=None, threshold=150) -> float:
    """Percentage of correct keypoints @150mm (reference: src/margipose/eval.py:16-20)."""
    dists = euclidean_distances(actual, expected)
    if included_joints is not None:
        dists = dists[..., included_joints]
    return float((dists < threshold).mean())


def auc(actual, expected, included_joints=None) -> float:
    """Mean PCK over 31 thresholds 0-150mm, mimicking mpii_compute_3d_pck.m
    (reference: src/margipose/eval.py:23-31)."""
    thresholds = np.linspace(0, 150, 31)
    return float(np.mean([
        pck(actual, expected, included_joints, threshold=t) for t in thresholds
    ]))


def prepare_for_3d_evaluation(original_skel, norm_pred, dataset, camera_intrinsics,
                              transform_opts, known_depth=False):
    """Process predictions and ground truth into root-relative original
    skeleton space (reference: src/margipose/eval.py:34-67).

    Returns (expected, actual) skeletons as [J, 3] numpy arrays.
    """
    if known_depth:
        z_ref = float(np.asarray(original_skel)[dataset.skeleton_desc.root_joint_id][2])
        denorm_skel = dataset.denormalise_with_depth(norm_pred, z_ref, camera_intrinsics)
    else:
        denorm_skel = dataset.denormalise_with_skeleton_height(
            norm_pred, camera_intrinsics, transform_opts
        )
    pred_skel = dataset.untransform_skeleton(denorm_skel, transform_opts)
    actual = absolute_to_root_relative(
        dataset.to_canonical_skeleton(ensure_cartesian(pred_skel, d=3)),
        CanonicalSkeletonDesc.root_joint_id,
    )
    expected = absolute_to_root_relative(
        dataset.to_canonical_skeleton(ensure_cartesian(original_skel, d=3)),
        CanonicalSkeletonDesc.root_joint_id,
    )
    return expected, actual


def gather_3d_metrics(expected, actual, included_joints=None) -> dict:
    """All six metrics incl. Procrustes-aligned variants
    (reference: src/margipose/eval.py:70-85)."""
    aligned = apply_rigid_alignment(actual, expected)
    return dict(
        mpjpe=mpjpe(actual, expected, included_joints),
        pck=pck(actual, expected, included_joints),
        auc=auc(actual, expected, included_joints),
        aligned_mpjpe=mpjpe(aligned, expected, included_joints),
        aligned_pck=pck(aligned, expected, included_joints),
        aligned_auc=auc(aligned, expected, included_joints),
    )


def calculate_pckh_distance(pred, target, head_length):
    return float(np.linalg.norm(np.asarray(target) - np.asarray(pred)) / head_length)
