"""Differentiable spatial-to-numerical (DSNT) operations in pure JAX.

Functional counterparts to the reference library ``margipose/dsntnn.py``
(reference: src/margipose/dsntnn.py:12-232). All functions are jittable,
dimension-generic, and differentiable. The tensor convention matches the
reference: heatmaps are shaped ``[batch, channels, *spatial]`` where the
spatial dimensions are the trailing ones, and coordinates are ordered
``(x, y, z, ...)`` — i.e. x indexes the *last* spatial axis.

These are the XLA-composed reference implementations; fused Pallas TPU
kernels (see ``margipose_tpu.ops.pallas``) are numerically validated
against them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Shared by every Gaussian/divergence implementation in the framework (this
# module, the stacked margipose loss in models/margipose.py, and the fused
# Pallas chatterbox kernel in ops/pallas_dsnt.py) so the rendering
# convention can only change in one place.
DIVERGENCE_EPS = 1e-24
_EPS = DIVERGENCE_EPS


def gauss_axis_coeff(size, sigma):
    """Coefficient k of one separable-Gaussian axis factor
    ``exp(k * (coord - mu)**2)`` over a ``normalized_linspace(size)`` grid
    with ``sigma`` in PIXELS: the normalised-coordinate stddev is
    ``2*sigma/size``, so ``k = -0.5 * (size / (2*sigma))**2``
    (reference: src/margipose/dsntnn.py:178-183)."""
    return -0.5 * (size / (2.0 * sigma)) ** 2


def normalized_linspace(length: int, dtype=jnp.float32) -> jax.Array:
    """Values in (-1, 1) at the centre of each of ``length`` cells.

    For ``length=4``: ``[-0.75, -0.25, 0.25, 0.75]``. The endpoints -1 and 1
    lie conceptually on the outer cell boundaries (reference:
    src/margipose/dsntnn.py:12-36).
    """
    first = -(length - 1.0) / length
    return jnp.arange(length, dtype=dtype) * (2.0 / length) + first


def _spatial_axes(heatmaps: jax.Array) -> tuple[int, ...]:
    return tuple(range(2, heatmaps.ndim))


def _coord_expectation(heatmaps: jax.Array, axis: int) -> jax.Array:
    """E[X] along one spatial axis of normalized heatmaps.

    ``axis`` is an absolute axis index (>= 2). Returns shape
    ``heatmaps.shape[:2]``.
    """
    coords = normalized_linspace(heatmaps.shape[axis], heatmaps.dtype)
    # Single fused multiply-reduce over all spatial axes (instead of
    # marginalise-then-dot): one XLA reduction, and it avoids an axon AOT
    # layout-assignment bug on the two-step reduce at batch 1.
    shape = (-1,) + (1,) * (heatmaps.ndim - axis - 1)
    return jnp.sum(heatmaps * coords.reshape(shape), axis=_spatial_axes(heatmaps))


def coord_expectation(heatmaps: jax.Array, dim: int) -> jax.Array:
    """Public wrapper; ``dim`` may be negative (reference dim convention)."""
    return _coord_expectation(heatmaps, dim % heatmaps.ndim)


def coord_variance(heatmaps: jax.Array, dim: int) -> jax.Array:
    """Var[X] along a spatial axis (reference: src/margipose/dsntnn.py:65-81)."""
    axis = dim % heatmaps.ndim
    mu = _coord_expectation(heatmaps, axis)
    # E[(X - mu)^2]; broadcast mu over the marginal's coordinate axis.
    other = tuple(a for a in _spatial_axes(heatmaps) if a != axis)
    marginal = jnp.sum(heatmaps, axis=other) if other else heatmaps
    coords = normalized_linspace(heatmaps.shape[axis], heatmaps.dtype)
    return jnp.sum(marginal * (coords - mu[..., None]) ** 2, axis=-1)


def dsnt(heatmaps: jax.Array) -> jax.Array:
    """Differentiable soft-argmax over normalized heatmaps.

    Input ``[B, C, *spatial]`` -> output ``[B, C, n_spatial]`` with
    coordinates ordered (x, y, ...) — x from the last spatial axis
    (reference: src/margipose/dsntnn.py:84-96).
    """
    axes = list(reversed(_spatial_axes(heatmaps)))
    return jnp.stack([_coord_expectation(heatmaps, a) for a in axes], axis=-1)


def flat_softmax(inp: jax.Array) -> jax.Array:
    """Softmax over all dims except the first two, jointly
    (reference: src/margipose/dsntnn.py:124-130)."""
    orig_shape = inp.shape
    flat = inp.reshape(orig_shape[0], orig_shape[1], -1)
    flat = jax.nn.softmax(flat, axis=-1)
    return flat.reshape(orig_shape)


def euclidean_losses(actual: jax.Array, target: jax.Array) -> jax.Array:
    """Per-point Euclidean distance; ``[..., L, D] -> [..., L]``
    (reference: src/margipose/dsntnn.py:133-151)."""
    assert actual.shape == target.shape, "input tensors must have the same size"
    return jnp.sqrt(jnp.sum((actual - target) ** 2, axis=-1))


def average_loss(losses: jax.Array, mask: jax.Array | None = None,
                 axis_name: str | None = None) -> jax.Array:
    """Masked mean of per-location losses
    (reference: src/margipose/dsntnn.py:99-121).

    ``axis_name``: inside jax.shard_map over a batch-sharded mesh axis,
    psum the numerator and denominator over it so the result is the masked
    mean over the GLOBAL batch (identical to the single-device value up to
    reduction order)."""
    if mask is not None:
        assert mask.shape == losses.shape, "mask must be the same size as losses"
        losses = losses * mask
        denom = jnp.sum(mask)
    else:
        # floor of 1 matches the masked branch's clip: an empty losses
        # array yields 0.0, not 0/0 = NaN
        denom = jnp.asarray(max(float(losses.size), 1.0), losses.dtype)
    num = jnp.sum(losses)
    if axis_name is not None:
        num = jax.lax.psum(num, axis_name)
        denom = jax.lax.psum(denom, axis_name)
    if mask is not None:
        denom = jnp.clip(denom, 1.0, None)
    return num / denom


def make_gauss(means: jax.Array, size, sigma, normalize: bool = True) -> jax.Array:
    """Render separable Gaussians, differentiable w.r.t. ``means``.

    ``size`` is ``[..., depth, height, width]`` (pixels); ``means`` is
    ``[..., n]`` ordered (x, y, z, ...) in normalized coordinates; sigma in
    pixels (reference: src/margipose/dsntnn.py:154-195).
    """
    n = len(size)
    batch_shape = means.shape[:-1]
    gauss = jnp.ones(batch_shape + tuple(size), dtype=means.dtype)
    for i, s in enumerate(reversed(size)):  # i=0 -> x -> last size dim
        coords = normalized_linspace(s, means.dtype)
        dist = (coords - means[..., i : i + 1]) ** 2  # [..., s]
        exp = jnp.exp(dist * gauss_axis_coeff(s, sigma))
        # Place this factor on spatial axis -(i+1), broadcasting over others.
        new_shape = batch_shape + (1,) * (n - 1 - i) + (s,) + (1,) * i
        gauss = gauss * exp.reshape(new_shape)
    if not normalize:
        return gauss
    val_sum = jnp.sum(gauss, axis=tuple(range(-n, 0)), keepdims=True) + _EPS
    return gauss / val_sum


def _kl(p: jax.Array, q: jax.Array, ndims: int) -> jax.Array:
    unsummed = p * (jnp.log(p + _EPS) - jnp.log(q + _EPS))
    return jnp.sum(unsummed, axis=tuple(range(-ndims, 0)))


def _js(p: jax.Array, q: jax.Array, ndims: int) -> jax.Array:
    m = 0.5 * (p + q)
    return 0.5 * _kl(p, m, ndims) + 0.5 * _kl(q, m, ndims)


def _divergence_reg_losses(heatmaps, mu_t, sigma_t, divergence):
    # Framework contract: divergence regularisers treat the TARGET
    # coordinates as constants (they come from the data pipeline). This is
    # uniform across backends — the fused Pallas kernel's VJP also returns
    # no mu cotangent — so gradients w.r.t. targets are zero everywhere
    # rather than differing by dispatch path. make_gauss itself remains
    # differentiable w.r.t. means for non-loss uses.
    mu_t = jax.lax.stop_gradient(mu_t)
    ndims = mu_t.shape[-1]
    assert heatmaps.ndim == ndims + 2, f"expected heatmaps to be a {ndims + 2}D tensor"
    assert heatmaps.shape[:-ndims] == mu_t.shape[:-1]
    gauss = make_gauss(mu_t, heatmaps.shape[2:], sigma_t)
    return divergence(heatmaps, gauss, ndims)


def js_reg_losses(heatmaps: jax.Array, mu_t: jax.Array, sigma_t) -> jax.Array:
    """Jensen-Shannon divergence between heatmaps and target Gaussians
    (reference: src/margipose/dsntnn.py:220-232)."""
    return _divergence_reg_losses(heatmaps, mu_t, sigma_t, _js)


def kl_reg_losses(heatmaps: jax.Array, mu_t: jax.Array, sigma_t) -> jax.Array:
    """KL divergence between heatmaps and target Gaussians
    (reference: src/margipose/dsntnn.py:198-217)."""
    return _divergence_reg_losses(heatmaps, mu_t, sigma_t, _kl)
