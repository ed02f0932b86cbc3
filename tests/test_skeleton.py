import numpy as np
from numpy.testing import assert_allclose

from margipose_tpu.geometry.skeleton import (
    CanonicalSkeletonDesc,
    absolute_to_parent_relative,
    absolute_to_root_relative,
    apply_rigid_alignment,
    calc_relative_scale,
    calculate_knee_neck_height,
    canonicalise_orientation,
    cartesian_to_spherical,
    parent_relative_to_absolute,
    spherical_to_cartesian,
)


def test_spherical_to_cartesian():
    spherical = np.array([[4 * np.sqrt(3), np.deg2rad(30), np.deg2rad(60)]])
    expected = np.array([[np.sqrt(3), 3, 6]])
    assert_allclose(spherical_to_cartesian(spherical), expected, atol=1e-6)


def test_cartesian_to_spherical():
    cartesian = np.array([[np.sqrt(3), 3, 6]])
    expected = np.array([[4 * np.sqrt(3), np.deg2rad(30), np.deg2rad(60)]])
    assert_allclose(cartesian_to_spherical(cartesian), expected, atol=1e-6)


def test_absolute_to_root_relative():
    joints = np.array([[1, 1, 1], [1, 2, 1], [1, 2, 2]], dtype=np.float64)
    expected = np.array([[0, 0, 0], [0, 1, 0], [0, 1, 1]], dtype=np.float64)
    assert_allclose(absolute_to_root_relative(joints, 0), expected)


def test_absolute_to_parent_relative():
    joints = np.array([[1, 1, 1], [1, 2, 1], [1, 2, 2]], dtype=np.float64)
    expected = np.array([[0, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float64)
    assert_allclose(absolute_to_parent_relative(joints, [0, 0, 1]), expected)


def test_parent_relative_to_absolute():
    relative = np.array([[0, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float64)
    expected = np.array([[0, 0, 0], [0, 1, 0], [0, 1, 1]], dtype=np.float64)
    assert_allclose(parent_relative_to_absolute(relative, [0, 0, 1]), expected)


def test_canonicalise_orientation(skeleton_canonical_univ):
    skel_desc = CanonicalSkeletonDesc
    new_skel = canonicalise_orientation(skel_desc, skeleton_canonical_univ)

    pelvis = new_skel[skel_desc.joint_names.index('pelvis')]
    lshoulder = new_skel[skel_desc.joint_names.index('left_shoulder')]
    rshoulder = new_skel[skel_desc.joint_names.index('right_shoulder')]

    assert_allclose(pelvis, [0, 0, 0, 1], atol=1e-6)
    assert_allclose(lshoulder[2], 0, atol=1e-6)
    assert_allclose(rshoulder[2], 0, atol=1e-6)


def test_calc_relative_scale():
    skel = np.array([[0, 0, 0], [0, 1, 0], [0, 1, 1]], dtype=np.float64)
    tree = [0, 0, 1]
    ref_bone_lengths = cartesian_to_spherical(
        absolute_to_parent_relative(skel * 2.0, tree)
    )[:, 0]
    assert calc_relative_scale(skel, ref_bone_lengths, tree) == 2.0


def test_knee_neck_height(skeleton_canonical_univ):
    h = calculate_knee_neck_height(
        skeleton_canonical_univ, CanonicalSkeletonDesc.joint_names
    )
    # A real human skeleton at universal scale: knee-neck height near 920mm.
    assert 800 < h < 1050


def test_apply_rigid_alignment():
    rng = np.random.RandomState(0)
    ref = rng.randn(17, 3)
    # A rigid transform of ref should align back almost perfectly.
    th = 0.3
    rot = np.array([
        [np.cos(th), -np.sin(th), 0],
        [np.sin(th), np.cos(th), 0],
        [0, 0, 1],
    ])
    moved = ref @ rot.T * 1.7 + np.array([5.0, -3.0, 2.0])
    aligned = apply_rigid_alignment(moved, ref)
    assert_allclose(aligned, ref, atol=1e-8)
