"""NHWC convolution/pooling primitives with exact PyTorch semantics.

These wrap ``lax.conv_general_dilated`` / ``lax.reduce_window`` with explicit
(torch-style) padding so outputs are bit-comparable to the reference
framework's layers — required for faithful import of reference checkpoints
(reference layers: src/margipose/models/margipose_model.py:25-150).

Layouts: activations NHWC, kernels HWIO. TPU-native; the MXU consumes these
directly after XLA tiling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def _pair(v) -> tuple[int, int]:
    if isinstance(v, (tuple, list)):
        assert len(v) == 2
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def conv2d(x, w, b=None, stride=1, padding=0, dilation=1, groups=1, precision=None):
    """2D convolution matching ``torch.nn.functional.conv2d``.

    x: [N, H, W, C_in]; w: [kh, kw, C_in/groups, C_out]; padding is symmetric
    torch-style (int or (ph, pw)).
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dh, dw),
        dimension_numbers=_DIMSPEC,
        feature_group_count=groups,
        precision=precision,
    )
    if b is not None:
        out = out + b
    return out


def conv2d_transpose(x, w, b=None, stride=1, padding=0, output_padding=0, dilation=1,
                     precision=None):
    """2D transposed convolution matching ``torch.nn.functional.conv_transpose2d``.

    x: [N, H, W, C_in]; w: [kh, kw, C_in, C_out] where the kernel is stored
    ALREADY flipped+transposed for the forward dilated conv (use
    ``torch_convtranspose_weight_to_hwio`` when importing torch weights;
    random init should initialise this layout directly).
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    oph, opw = _pair(output_padding)
    dh, dw = _pair(dilation)
    kh, kw = w.shape[0], w.shape[1]
    pad_h = (dh * (kh - 1) - ph, dh * (kh - 1) - ph + oph)
    pad_w = (dw * (kw - 1) - pw, dw * (kw - 1) - pw + opw)
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=(pad_h, pad_w),
        lhs_dilation=(sh, sw),
        rhs_dilation=(dh, dw),
        dimension_numbers=_DIMSPEC,
        precision=precision,
    )
    if b is not None:
        out = out + b
    return out


def torch_conv_weight_to_hwio(w_oihw: np.ndarray) -> np.ndarray:
    """torch Conv2d weight (O, I, kh, kw) -> HWIO (kh, kw, I, O)."""
    return np.transpose(w_oihw, (2, 3, 1, 0))


def torch_convtranspose_weight_to_hwio(w_iohw: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (I, O, kh, kw) -> flipped HWIO for
    ``conv2d_transpose`` above."""
    w = np.flip(w_iohw, axis=(2, 3))
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def max_pool2d(x, kernel_size, stride=None, padding=0):
    """Max pooling matching ``torch.nn.functional.max_pool2d`` (implicit -inf
    padding)."""
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride if stride is not None else kernel_size)
    ph, pw = _pair(padding)
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), (ph, ph), (pw, pw), (0, 0)),
    )


def avg_pool2d(x, kernel_size, stride=None, padding=0, count_include_pad=True):
    """Average pooling matching ``torch.nn.functional.avg_pool2d``."""
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride if stride is not None else kernel_size)
    ph, pw = _pair(padding)
    window = (1, kh, kw, 1)
    strides = (1, sh, sw, 1)
    pads = ((0, 0), (ph, ph), (pw, pw), (0, 0))
    summed = lax.reduce_window(x, 0.0, lax.add, window, strides, pads)
    if count_include_pad:
        return summed / (kh * kw)
    ones = jnp.ones(x.shape[:3] + (1,), dtype=x.dtype)
    counts = lax.reduce_window(ones, 0.0, lax.add, window, strides, pads)
    return summed / counts


def batch_norm_inference(x, mean, var, scale, bias, eps=1e-5):
    """Inference batch norm over the channel (last) axis, torch semantics."""
    inv = lax.rsqrt(var + eps)
    return (x - mean) * inv * scale + bias


def relu(x):
    return jnp.maximum(x, 0)
