"""Native host-ops library (native/margipose_host_ops.cpp) vs the PIL path."""

import numpy as np
import PIL.Image
import pytest

from margipose_tpu import native
from margipose_tpu.geometry.transforms import (
    TransformerContext,
    adjust_colour_pil,
    build_affine,
    warp_image_pil,
)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _smooth_image(h=64, w=64, seed=0):
    rng = np.random.RandomState(seed)
    small = rng.uniform(40, 215, (h // 8, w // 8, 3)).astype(np.uint8)
    return np.array(PIL.Image.fromarray(small).resize((w, h), PIL.Image.BILINEAR))


def test_warp_matches_pil():
    img = _smooth_image()
    A = build_affine(dict(centre_x=30, centre_y=34, rotation=20.0, scale=0.5,
                          hflip=True, in_width=64, in_height=64,
                          out_width=32, out_height=32))
    ref = np.array(warp_image_pil(PIL.Image.fromarray(img), A, (32, 32)))
    out = native.warp_rgb(img, A, (32, 32))
    # PIL rounds intermediate uint8 values; allow 1 grey level.
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_fused_matches_pil_chain():
    img = _smooth_image(seed=2)
    A = build_affine(dict(centre_x=32, centre_y=32, rotation=-10.0, scale=0.6,
                          hflip=False, in_width=64, in_height=64,
                          out_width=32, out_height=32))
    ref = np.array(adjust_colour_pil(
        warp_image_pil(PIL.Image.fromarray(img), A, (32, 32)),
        1.15, 0.9, 1.2, 0.05)).astype(np.float32) / 255.0
    out = native.warp_colour_norm(img, A, (32, 32), 1.15, 0.9, 1.2, 0.05)
    assert np.abs(out - ref).mean() < 3.0 / 255.0


def test_fused_normalisation():
    img = _smooth_image(seed=3)
    A = np.eye(3)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    plain = native.warp_colour_norm(img, A, (64, 64))
    normed = native.warp_colour_norm(img, A, (64, 64), mean=mean, std=std)
    np.testing.assert_allclose(normed, (plain - mean) / std, atol=1e-5)


def test_composite_matches_pil():
    fg = _smooth_image(seed=4)
    bg = _smooth_image(seed=5)
    rng = np.random.RandomState(6)
    mask = rng.randint(0, 256, (64, 64)).astype(np.uint8)
    ref = np.array(PIL.Image.composite(
        PIL.Image.fromarray(fg), PIL.Image.fromarray(bg),
        PIL.Image.fromarray(mask, "L")))
    out = native.composite(fg, bg, mask)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_transformer_context_uses_native_consistently():
    """The TransformerContext native fast path stays within tolerance of the
    pure-PIL fallback (exercised via MARGIPOSE_DISABLE_NATIVE in CI runs)."""
    from margipose_tpu.geometry.camera import CameraIntrinsics

    img = PIL.Image.fromarray(_smooth_image(seed=7))
    opts = dict(centre_x=32, centre_y=32, rotation=15.0, scale=0.7, hflip=False,
                in_width=64, in_height=64, out_width=32, out_height=32,
                brightness=1.1, contrast=0.95, saturation=1.05, hue=0.02,
                hflip_indices=list(range(17)))
    ctx = TransformerContext(opts)
    cam = CameraIntrinsics.from_ccd_params(100.0, 100.0, 32.0, 32.0)

    _, out_native, _ = ctx.transform(cam, img, np.zeros((17, 4)))

    ref = adjust_colour_pil(
        warp_image_pil(img, ctx.affine, (32, 32)),
        opts['brightness'], opts['contrast'], opts['saturation'], opts['hue'])
    err = np.abs(np.asarray(out_native).astype(int) - np.asarray(ref).astype(int))
    assert err.mean() < 4.0
