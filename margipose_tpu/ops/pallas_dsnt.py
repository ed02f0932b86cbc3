"""Fused Pallas TPU kernel: DSNT soft-argmax + target-Gaussian JSD.

For each (batch, joint) heatmap row this computes, in a single VMEM pass:

  * the DSNT coordinate expectations (E[x], E[y]);
  * the Jensen-Shannon divergence against a separable target Gaussian
    rendered INLINE from the target coordinates (never materialised in HBM).

This replaces the XLA composition dsnt(p) + make_gauss(mu) + js(p, q)
(see ``margipose_tpu.ops.dsnt``), which materialises the Gaussian, the
mixture, and two log-temporaries of heatmap size per call. A custom VJP
provides the closed-form gradient

    dL/dp_i = g_x c_x(i) + g_y c_y(i) + g_j * 0.5 * ln(p_i / m_i)

(m = (p + q)/2; the Gaussian targets are constants, so no mu gradient).

Numerical equivalence against the pure-jnp ops is tested in
tests/test_pallas.py. On non-TPU backends the kernel runs in interpreter
mode (tests) — production CPU paths should use the jnp ops directly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from margipose_tpu.ops.dsnt import DIVERGENCE_EPS as _EPS
from margipose_tpu.ops.dsnt import gauss_axis_coeff


def _row_coords(h: int, w: int, tile_n: int, dtype):
    """Flattened-row coordinate grids cx, cy of shape [tile_n, h*w]."""
    s = h * w
    idx = jax.lax.broadcasted_iota(jnp.int32, (tile_n, s), 1)
    col = idx % w
    row = idx // w
    first_x = -(w - 1.0) / w
    first_y = -(h - 1.0) / h
    cx = col.astype(dtype) * (2.0 / w) + first_x
    cy = row.astype(dtype) * (2.0 / h) + first_y
    return cx, cy


def _gauss_rows(mu, h: int, w: int, sigma: float, cx, cy):
    """Normalized separable Gaussian rows [tile_n, h*w] from mu [tile_n, 2].
    Convention + eps imported from ops.dsnt (gauss_axis_coeff /
    DIVERGENCE_EPS) so all three divergence-loss implementations share one
    definition."""
    kx = gauss_axis_coeff(w, sigma)
    ky = gauss_axis_coeff(h, sigma)
    dx2 = (cx - mu[:, 0:1]) ** 2
    dy2 = (cy - mu[:, 1:2]) ** 2
    g = jnp.exp(dx2 * kx) * jnp.exp(dy2 * ky)
    return g / (jnp.sum(g, axis=-1, keepdims=True) + _EPS)


def _fwd_kernel(h, w, sigma, p_ref, mu_ref, out_ref):
    p = p_ref[:]
    tile_n = p.shape[0]
    cx, cy = _row_coords(h, w, tile_n, p.dtype)
    ex = jnp.sum(p * cx, axis=-1)
    ey = jnp.sum(p * cy, axis=-1)

    q = _gauss_rows(mu_ref[:], h, w, sigma, cx, cy)
    m = 0.5 * (p + q)
    log_m = jnp.log(m + _EPS)
    kl_pm = jnp.sum(p * (jnp.log(p + _EPS) - log_m), axis=-1)
    kl_qm = jnp.sum(q * (jnp.log(q + _EPS) - log_m), axis=-1)
    jsd = 0.5 * kl_pm + 0.5 * kl_qm

    out_ref[:] = jnp.stack([ex, ey, jsd, jnp.zeros_like(jsd)], axis=-1)


def _bwd_kernel(h, w, sigma, p_ref, mu_ref, g_ref, dp_ref):
    p = p_ref[:]
    tile_n = p.shape[0]
    cx, cy = _row_coords(h, w, tile_n, p.dtype)
    q = _gauss_rows(mu_ref[:], h, w, sigma, cx, cy)
    m = 0.5 * (p + q)
    g = g_ref[:]
    gx = g[:, 0:1]
    gy = g[:, 1:2]
    gj = g[:, 2:3]
    djsd = 0.5 * (jnp.log(p + _EPS) - jnp.log(m + _EPS))
    dp_ref[:] = gx * cx + gy * cy + gj * djsd


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tile_rows(n: int, s: int) -> int:
    # Aim for ~1 MB tiles in VMEM (f32), at least 8 rows. Inputs are padded
    # up to a multiple of the tile (a divisor search would degrade to 1-row
    # tiles for awkward/prime row counts).
    return max(8, min(n, (1 << 18) // max(s, 1)))


def _pad_rows(arr, tile):
    pad = (-arr.shape[0]) % tile
    if pad:
        arr = jnp.concatenate(
            [arr, jnp.zeros((pad,) + arr.shape[1:], arr.dtype)], axis=0)
    return arr


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dsnt_jsd_rows(p, mu, static):
    h, w, sigma = static
    return _dsnt_jsd_rows_fwd_impl(p, mu, h, w, sigma)


def _dsnt_jsd_rows_fwd_impl(p, mu, h, w, sigma):
    n, s = p.shape
    tile = _tile_rows(n, s)
    p = _pad_rows(p, tile)
    mu = _pad_rows(mu, tile)
    n_pad = p.shape[0]
    kernel = functools.partial(_fwd_kernel, h, w, sigma)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 4), p.dtype),
        interpret=_interpret(),
    )(p, mu)
    return out[:n]


def _dsnt_jsd_rows_fwd(p, mu, static):
    out = _dsnt_jsd_rows(p, mu, static)
    return out, (p, mu)


def _dsnt_jsd_rows_bwd(static, residuals, g):
    h, w, sigma = static
    p, mu = residuals
    n, s = p.shape
    tile = _tile_rows(n, s)
    p_pad = _pad_rows(p, tile)
    mu_pad = _pad_rows(mu, tile)
    g_pad = _pad_rows(g, tile)
    n_pad = p_pad.shape[0]
    kernel = functools.partial(_bwd_kernel, h, w, sigma)
    dp = pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, s), p.dtype),
        interpret=_interpret(),
    )(p_pad, mu_pad, g_pad)
    # No mu cotangent BY CONTRACT: every divergence loss in the framework
    # treats target coordinates as constants (ops.dsnt._divergence_reg_losses
    # and models/margipose._js_vs_gauss stop_gradient them likewise), so the
    # fused and composed paths agree under differentiation on every backend.
    return dp[:n], None


_dsnt_jsd_rows.defvjp(_dsnt_jsd_rows_fwd, _dsnt_jsd_rows_bwd)


def dsnt_jsd_fused(heatmaps: jax.Array, mu: jax.Array, sigma: float = 1.0):
    """Fused DSNT + JSD for normalized heatmaps.

    Args:
      heatmaps: [B, J, H, W] normalized (post-softmax) heatmaps.
      mu: [B, J, 2] target coordinates (normalized; treated as constants).
      sigma: target Gaussian standard deviation in pixels.

    Returns:
      (coords [B, J, 2], jsd [B, J]) — numerically equal to
      ``(dsnt(heatmaps), js_reg_losses(heatmaps, mu, sigma))``.
    """
    b, j, h, w = heatmaps.shape
    p = heatmaps.reshape(b * j, h * w)
    mu_rows = mu.reshape(b * j, 2).astype(p.dtype)
    out = _dsnt_jsd_rows(p, mu_rows, (h, w, float(sigma)))
    coords = out[:, :2].reshape(b, j, 2)
    jsd = out[:, 2].reshape(b, j)
    return coords, jsd
