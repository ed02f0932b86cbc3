import numpy as np
import PIL.Image
import pytest
from numpy.testing import assert_allclose

from margipose_tpu.geometry import CameraIntrinsics, SkeletonNormaliser, ensure_homogeneous
from margipose_tpu.geometry.skeleton import (
    CanonicalSkeletonDesc,
    calculate_knee_neck_height,
    make_eval_scale_skeleton_height,
)
from margipose_tpu.geometry.transforms import TransformerContext, build_affine


def make_camera(w=768, h=768):
    return CameraIntrinsics.from_ccd_params(1500.0, 1500.0, w / 2 + 3.0, h / 2 - 5.0)


def default_opts(camera, w=768, h=768, **overrides):
    opts = {
        'in_camera': camera,
        'in_width': w,
        'in_height': h,
        'centre_x': 400.0,
        'centre_y': 350.0,
        'rotation': 0,
        'scale': 0.5,
        'hflip_indices': CanonicalSkeletonDesc.hflip_indices,
        'hflip': False,
        'out_width': 256,
        'out_height': 256,
        'brightness': 1,
        'contrast': 1,
        'saturation': 1,
        'hue': 0,
    }
    opts.update(overrides)
    return opts


def test_camera_project_backproject_roundtrip():
    cam = make_camera()
    rng = np.random.RandomState(0)
    pts = rng.uniform(-500, 500, size=(17, 3)) + np.array([0, 0, 3000.0])
    pix = cam.project_cartesian(pts)
    rec = cam.back_project(pix, pts[:, 2])
    assert_allclose(rec, pts, atol=1e-9)


def test_camera_scale_image():
    cam = make_camera()
    pts = np.array([[100.0, -50.0, 2500.0]])
    before = cam.project_cartesian(pts)
    cam2 = cam.clone().scale_image(0.5, 0.25)
    after = cam2.project_cartesian(pts)
    assert_allclose(after, before * np.array([0.5, 0.25]), atol=1e-9)


def test_normaliser_roundtrip(skeleton_canonical_univ):
    cam = make_camera()
    norm = SkeletonNormaliser()
    skel = ensure_homogeneous(skeleton_canonical_univ, d=3)
    z_ref = skel[CanonicalSkeletonDesc.root_joint_id, 2]
    normalised = norm.normalise_skeleton(skel, z_ref, cam, 768, 768)
    # root at z=0 in normalized space
    assert abs(normalised[CanonicalSkeletonDesc.root_joint_id, 2]) < 1e-9
    rec = norm.denormalise_skeleton(normalised, z_ref, cam, 768, 768)
    assert_allclose(rec, skel, atol=1e-6)


def test_normaliser_infer_depth(skeleton_canonical_univ):
    """Depth recovery: scale skeleton to exactly 920mm knee-neck height, then
    infer_depth from the normalised skeleton must recover the true root depth."""
    cam = make_camera()
    norm = SkeletonNormaliser()
    skel = np.asarray(skeleton_canonical_univ, dtype=np.float64)
    height = calculate_knee_neck_height(skel, CanonicalSkeletonDesc.joint_names)
    skel = skel * (920.0 / height)  # scaling about camera preserves projection
    skel = ensure_homogeneous(skel, d=3)
    true_z = skel[CanonicalSkeletonDesc.root_joint_id, 2]

    normalised = norm.normalise_skeleton(skel, true_z, cam, 768, 768)
    eval_scale = make_eval_scale_skeleton_height(CanonicalSkeletonDesc, lambda s: s)
    z = norm.infer_depth(normalised, eval_scale, cam, 768, 768)
    assert z == pytest.approx(true_z, rel=1e-6)

    rec = norm.denormalise_skeleton(normalised, z, cam, 768, 768)
    assert_allclose(rec, skel, atol=1e-3)


def test_transform_projection_consistency(skeleton_canonical_univ):
    """Transformed camera must project 3D joints onto their transformed pixels."""
    cam = make_camera()
    skel = ensure_homogeneous(skeleton_canonical_univ, d=3)
    for hflip in [False, True]:
        opts = default_opts(cam, rotation=20.0, hflip=hflip)
        ctx = TransformerContext(opts)
        new_cam, _, new_pts = ctx.transform(cam, None, skel)

        orig_pix = cam.project_cartesian(skel)
        affine = build_affine(opts)
        warped_pix = (
            np.concatenate([orig_pix, np.ones((17, 1))], -1) @ affine.T
        )[:, :2]
        if hflip:
            warped_pix = warped_pix[CanonicalSkeletonDesc.hflip_indices]
        assert_allclose(new_cam.project_cartesian(new_pts), warped_pix, atol=1e-8)


def test_untransform_inverts_points(skeleton_canonical_univ):
    cam = make_camera()
    skel = ensure_homogeneous(skeleton_canonical_univ, d=3)
    opts = default_opts(cam, rotation=-15.0, hflip=True)
    ctx = TransformerContext(opts)
    _, _, new_pts = ctx.transform(cam, None, skel)
    rec = ctx.untransform(new_pts)
    assert_allclose(rec, skel, atol=1e-12)


def test_full_pipeline_roundtrip(skeleton_canonical_univ):
    """transform -> normalise -> denormalise -> untransform == identity.

    This is the exact geometric path used in training targets and eval
    (reference: src/margipose/data/mpi_inf_3dhp/__init__.py:255-290,
    src/margipose/eval.py:34-67)."""
    cam = make_camera()
    norm = SkeletonNormaliser()
    skel = ensure_homogeneous(skeleton_canonical_univ, d=3)

    opts = default_opts(cam, rotation=25.0, hflip=True, scale=0.45)
    ctx = TransformerContext(opts)
    new_cam, _, joints3d = ctx.transform(cam, None, skel)

    z_ref = joints3d[CanonicalSkeletonDesc.root_joint_id, 2]
    target = norm.normalise_skeleton(joints3d, z_ref, new_cam, 256, 256)
    assert np.all(np.isfinite(target))

    denorm = norm.denormalise_skeleton(target, z_ref, new_cam, 256, 256)
    rec = ctx.untransform(denorm)
    assert_allclose(rec, skel, atol=1e-6)


def test_image_warp_matches_point_mapping():
    """A bright pixel placed at a known position must land where the affine
    says it should."""
    w = h = 64
    img = PIL.Image.new('RGB', (w, h))
    px = np.array(img)
    px[40, 24] = [255, 255, 255]  # row=y=40, col=x=24
    img = PIL.Image.fromarray(px)

    cam = CameraIntrinsics.from_ccd_params(100, 100, w / 2, h / 2)
    opts = default_opts(cam, w=w, h=h, centre_x=24, centre_y=40, scale=0.25,
                        out_width=32, out_height=32)
    ctx = TransformerContext(opts)
    _, out, _ = ctx.transform(cam, img, np.zeros((17, 4)))
    arr = np.array(out).sum(-1)
    iy, ix = np.unravel_index(arr.argmax(), arr.shape)
    # (24, 40) is the crop centre -> must map to the output centre.
    assert abs(ix - 16) <= 1 and abs(iy - 16) <= 1
