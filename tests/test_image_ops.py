"""On-device image ops (ops/image.py) vs the host PIL path (geometry/transforms.py)."""

import numpy as np
import PIL.Image
import pytest

from margipose_tpu.geometry.transforms import (
    adjust_colour_pil,
    build_affine,
    warp_image_pil,
)
from margipose_tpu.ops.image import (
    adjust_colour,
    affine_warp,
    hsv_to_rgb,
    normalize_imagenet,
    rgb_to_hsv,
)


def _smooth_image(h=64, w=64, seed=0):
    """A smooth random RGB image (uint8) — avoids aliasing-dominated diffs."""
    rng = np.random.RandomState(seed)
    small = rng.uniform(40, 215, (h // 8, w // 8, 3))
    img = np.array(
        PIL.Image.fromarray(small.astype(np.uint8)).resize((w, h), PIL.Image.BILINEAR)
    )
    return img


def test_affine_warp_identity():
    img = _smooth_image()
    x = img[None].astype(np.float32) / 255.0
    eye = np.eye(3, dtype=np.float32)[None]
    out = np.asarray(affine_warp(x, eye, 64, 64))
    np.testing.assert_allclose(out, x, atol=1e-5)


@pytest.mark.parametrize("opts", [
    # zoom-in crop (interior only -> tight tolerance)
    dict(centre_x=32, centre_y=32, rotation=0.0, scale=0.6, hflip=False),
    dict(centre_x=30, centre_y=34, rotation=20.0, scale=0.5, hflip=False),
    dict(centre_x=32, centre_y=32, rotation=-10.0, scale=0.55, hflip=True),
])
def test_affine_warp_matches_pil(opts):
    img = _smooth_image()
    pil = PIL.Image.fromarray(img)
    full = dict(opts, in_width=64, in_height=64, out_width=32, out_height=32)
    A = build_affine(full)

    ref = np.array(warp_image_pil(pil, A, (32, 32))).astype(np.float32) / 255.0
    x = img[None].astype(np.float32) / 255.0
    out = np.asarray(affine_warp(x, A[None].astype(np.float32), 32, 32))[0]

    # PIL computes in uint8 with rounding; interior samples should agree to
    # a couple of grey levels.
    err = np.abs(out - ref)
    assert np.median(err) < 2.5 / 255.0
    assert np.mean(err) < 4.0 / 255.0


def test_adjust_colour_matches_pil():
    img = _smooth_image(seed=3)
    pil = PIL.Image.fromarray(img)
    b, c, s = 1.15, 0.9, 1.2
    ref = np.array(adjust_colour_pil(pil, b, c, s, 0.0)).astype(np.float32) / 255.0

    x = img[None].astype(np.float32) / 255.0
    out = np.asarray(adjust_colour(x, b, c, s, 0.0))[0]
    err = np.abs(out - ref)
    assert np.mean(err) < 3.0 / 255.0


def test_hsv_roundtrip():
    rng = np.random.RandomState(0)
    rgb = rng.uniform(0, 1, (50, 3)).astype(np.float32)
    back = np.asarray(hsv_to_rgb(rgb_to_hsv(rgb)))
    np.testing.assert_allclose(back, rgb, atol=1e-5)


def test_hue_shift_full_cycle_is_identity():
    img = _smooth_image(seed=5)[None].astype(np.float32) / 255.0
    out = np.asarray(adjust_colour(img, 1.0, 1.0, 1.0, 1.0))  # full rotation
    np.testing.assert_allclose(out, np.clip(img, 0, 1), atol=2e-2)


def test_normalize_imagenet():
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    x = np.full((1, 2, 2, 3), 0.5, np.float32)
    out = np.asarray(normalize_imagenet(x, mean, std))
    expect = (0.5 - np.array(mean)) / np.array(std)
    np.testing.assert_allclose(out[0, 0, 0], expect, rtol=1e-5)


def test_affine_warp_per_example_affines():
    """Each batch element gets its own affine."""
    img = _smooth_image()
    x = np.stack([img, img]).astype(np.float32) / 255.0
    a0 = build_affine(dict(centre_x=32, centre_y=32, rotation=0.0, scale=0.6,
                           hflip=False, in_width=64, in_height=64,
                           out_width=32, out_height=32))
    a1 = build_affine(dict(centre_x=32, centre_y=32, rotation=0.0, scale=0.6,
                           hflip=True, in_width=64, in_height=64,
                           out_width=32, out_height=32))
    out = np.asarray(affine_warp(x, np.stack([a0, a1]).astype(np.float32), 32, 32))
    np.testing.assert_allclose(out[0], out[1][:, ::-1], atol=1e-3)
