"""On-device batched image transforms (XLA, jittable).

The host pipeline (margipose_tpu/geometry/transforms.py) composes the whole
geometric augmentation into ONE 2x3 affine per example; this module applies
that affine — plus colour jitter and ImageNet normalisation — on device as a
single fused XLA program over an NHWC batch. This replaces per-example PIL
resampling in dataloader workers (the reference's known input bottleneck,
reference: src/margipose/data/__init__.py:97-108 applied per worker process)
for fixed-size sources (e.g. the 768x768 preprocessed MPI-INF-3DHP frames).

Conventions match the host path:
  * affines map OUTPUT pixel -> comes from A @ INPUT pixel, i.e. the same
    matrices produced by ``geometry.transforms.build_affine`` (the inverse
    is taken here);
  * bilinear sampling, zero fill outside the source (PIL AFFINE semantics);
  * colour jitter follows PIL ImageEnhance order brightness -> contrast ->
    saturation -> hue with ITU-R 601-2 luma weights.

Pixel-space coordinates follow the PIL convention used by the host path:
integer coordinates refer to pixel top-left corners (PIL's transform maps
output pixel (i, j) by sampling the source at A^-1 @ (j, i)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ITU-R 601-2 luma transform (PIL's "L" conversion weights)
_LUMA = jnp.array([299.0 / 1000.0, 587.0 / 1000.0, 114.0 / 1000.0])


def affine_warp(images: jax.Array, affines: jax.Array, out_height: int,
                out_width: int) -> jax.Array:
    """Batched inverse-affine bilinear warp.

    Args:
      images: [B, H, W, C] float array (any float dtype).
      affines: [B, 3, 3] (or [B, 2, 3]) output<-input pixel affines, i.e.
        ``out_pixel = A @ in_pixel`` — the matrix from ``build_affine``.
      out_height, out_width: static output size.

    Returns:
      [B, out_height, out_width, C]; points sampling outside the source are 0
      (PIL Image.transform fill semantics).
    """
    b, h, w, c = images.shape
    if affines.shape[-2:] == (2, 3):
        bottom = jnp.broadcast_to(jnp.array([[0.0, 0.0, 1.0]]), (affines.shape[0], 1, 3))
        affines = jnp.concatenate([affines, bottom], axis=-2)
    inv = jnp.linalg.inv(affines.astype(jnp.float32))  # input<-output

    # Output pixel-centre sample positions, PIL convention: source coord for
    # output integer position (x, y) is A^-1 @ (x + .5, y + .5) - .5 applied
    # to the continuous grid. PIL's AFFINE transform actually samples at
    # A^-1 @ (x + 0.5, y + 0.5), treating coordinates as pixel corners; the
    # -0.5 recentres onto sample indices for bilinear interpolation.
    ys = jnp.arange(out_height, dtype=jnp.float32) + 0.5
    xs = jnp.arange(out_width, dtype=jnp.float32) + 0.5
    gx, gy = jnp.meshgrid(xs, ys)  # [oh, ow]
    ones = jnp.ones_like(gx)
    grid = jnp.stack([gx, gy, ones], axis=0).reshape(3, -1)  # [3, oh*ow]

    src = jnp.einsum("bij,jk->bik", inv, grid)  # [B, 3, oh*ow]
    sx = src[:, 0, :] - 0.5
    sy = src[:, 1, :] - 0.5

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        flat = images.reshape(b, h * w, c)
        idx = yc * w + xc  # [B, oh*ow]
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)  # [B, oh*ow, C]
        return vals * valid[..., None].astype(images.dtype)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)

    fx = fx[..., None].astype(images.dtype)
    fy = fy[..., None].astype(images.dtype)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    out = top * (1 - fy) + bot * fy
    return out.reshape(b, out_height, out_width, c)


def _grayscale(images: jax.Array) -> jax.Array:
    """[B,H,W,3] -> [B,H,W,1] ITU-R 601-2 luma."""
    return jnp.einsum("bhwc,c->bhw", images, _LUMA.astype(images.dtype))[..., None]


def adjust_colour(images: jax.Array, brightness, contrast, saturation,
                  hue) -> jax.Array:
    """Batched colour jitter on [B,H,W,3] images in [0, 1].

    Per-example factors (shape [B] or scalars). Follows the host path's PIL
    ImageEnhance semantics (geometry/transforms.py:80-98): fixed order
    brightness -> contrast -> saturation -> hue; contrast blends against the
    mean luma; saturation against the per-pixel luma; hue rotates in HSV.
    """
    b = images.shape[0]

    def per_ex(v):
        v = jnp.asarray(v, images.dtype)
        return jnp.broadcast_to(v, (b,)).reshape(b, 1, 1, 1)

    brightness = per_ex(brightness)
    contrast = per_ex(contrast)
    saturation = per_ex(saturation)
    hue = per_ex(hue)

    # clamp after brightness like the host paths (PIL rounds to uint8 after
    # each enhance; native clamps at margipose_host_ops.cpp:158) so the
    # contrast gray-mean sees identical inputs for brightness > 1
    x = jnp.clip(images * brightness, 0.0, 1.0)

    # contrast: blend with the scalar mean of the grayscale image
    gray = _grayscale(x)
    mean = jnp.mean(gray, axis=(1, 2, 3), keepdims=True)
    x = mean + (x - mean) * contrast

    # saturation: blend with the per-pixel grayscale
    gray = _grayscale(x)
    x = gray + (x - gray) * saturation

    x = jnp.clip(x, 0.0, 1.0)

    # hue: rotate in HSV space
    def hsv_shift(img, hue_shift):
        hsv = rgb_to_hsv(img)
        h_ = jnp.mod(hsv[..., 0:1] + hue_shift, 1.0)
        return hsv_to_rgb(jnp.concatenate([h_, hsv[..., 1:]], axis=-1))

    return jnp.where(jnp.abs(hue) > 1e-8, hsv_shift(x, hue), x)


def rgb_to_hsv(rgb: jax.Array) -> jax.Array:
    """[..., 3] RGB in [0,1] -> HSV in [0,1]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    span = maxc - minc
    s = jnp.where(maxc > 0, span / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(span, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.mod(h / 6.0, 1.0)
    h = jnp.where(span == 0, 0.0, h)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jax.Array) -> jax.Array:
    """[..., 3] HSV in [0,1] -> RGB in [0,1]."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = jnp.mod(i, 6.0).astype(jnp.int32)
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def normalize_imagenet(images: jax.Array, mean, std) -> jax.Array:
    """(x - mean) / std over the channel axis of [B,H,W,3] images in [0,1]."""
    mean = jnp.asarray(mean, images.dtype)
    std = jnp.asarray(std, images.dtype)
    return (images - mean) / std


def device_augment(images: jax.Array, affines: jax.Array, out_height: int,
                   out_width: int, brightness, contrast, saturation, hue,
                   mean, std) -> jax.Array:
    """The full on-device augmentation: warp + colour jitter + normalise,
    one fused XLA program. ``images`` are raw [B,H,W,3] in [0,1] (fixed
    source size); returns normalised [B,out_h,out_w,3]."""
    x = affine_warp(images, affines, out_height, out_width)
    x = adjust_colour(x, brightness, contrast, saturation, hue)
    return normalize_imagenet(x, mean, std)
