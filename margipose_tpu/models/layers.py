"""Flax building blocks with torch-matching semantics and param layout.

Param naming mirrors the reference torch ``state_dict`` paths so checkpoint
conversion is a mechanical rename + transpose (see
``margipose_tpu.train.torch_import``). Conv kernels are HWIO; activations
NHWC.

Initialisation follows the reference ``init_parameters``
(reference: src/margipose/nn_helpers.py:7-21): Kaiming-normal fan_out for
convs, BN scale=1 / bias=0.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from margipose_tpu.ops.convs import (
    avg_pool2d,
    conv2d,
    conv2d_transpose,
    max_pool2d,
    relu,
)
from margipose_tpu.parallel.precision import (
    current_compute_dtype,
    current_shard_axis,
)

IntPair = Union[int, Sequence[int]]


def _pair(v) -> tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def kaiming_fanout_init(fan_out_from: str = "out"):
    """Kaiming-normal (fan_out, relu gain) matching torch
    ``init.kaiming_normal_(w, 0, 'fan_out')``.

    For HWIO conv kernels torch fan_out = O*kh*kw; for transposed-conv
    kernels (torch layout (I, O, kh, kw)) torch computes fan_out from
    size(0) = I, i.e. I*kh*kw.
    """

    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, cout = shape
        fan = (cout if fan_out_from == "out" else cin) * kh * kw
        std = np.sqrt(2.0 / fan)
        return jax.random.normal(key, shape, dtype) * std

    return init


class TorchConv(nn.Module):
    """Conv2d with torch padding semantics. Param names: weight, bias."""

    features: int
    kernel_size: IntPair
    stride: IntPair = 1
    padding: IntPair = 0
    dilation: IntPair = 1
    use_bias: bool = True
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        w = self.param(
            "weight", kaiming_fanout_init("out"), (kh, kw, x.shape[-1], self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        cd = current_compute_dtype()
        if cd is not None:
            x, w = x.astype(cd), w.astype(cd)
            b = b if b is None else b.astype(cd)
        return conv2d(
            x, w, b, stride=self.stride, padding=self.padding,
            dilation=self.dilation, precision=self.precision,
        )


class TorchConvTranspose(nn.Module):
    """ConvTranspose2d with torch semantics. The kernel is stored in
    flipped-HWIO layout ready for the dilated forward conv."""

    features: int
    kernel_size: IntPair
    stride: IntPair = 1
    padding: IntPair = 0
    output_padding: IntPair = 0
    dilation: IntPair = 1
    use_bias: bool = True
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        w = self.param(
            "weight", kaiming_fanout_init("in"), (kh, kw, x.shape[-1], self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        cd = current_compute_dtype()
        if cd is not None:
            x, w = x.astype(cd), w.astype(cd)
            b = b if b is None else b.astype(cd)
        return conv2d_transpose(
            x, w, b, stride=self.stride, padding=self.padding,
            output_padding=self.output_padding, dilation=self.dilation,
            precision=self.precision,
        )


class BatchNorm(nn.Module):
    """Channel-last batch norm with torch defaults (momentum 0.1, eps 1e-5).

    Running stats live in the ``batch_stats`` collection. Set ``axis_name``
    to sync batch statistics across a mesh axis under pjit/shard_map.

    Known, accepted EMA convention difference vs torch: flax accumulates the
    BIASED batch variance into the running var, torch the Bessel-corrected
    (unbiased) one — a factor of n/(n-1) where n = B*H*W per channel (>=32k
    at production shapes, i.e. <=0.003% on running_var; normalisation itself
    uses the biased variance in BOTH frameworks). Far below the checkpoint
    parity tolerance, and not worth a custom stat path: every deviation from
    the stock nn.BatchNorm graph measured slower on TPU (BASELINE.md
    ghost-BN / bf16-stat experiments).

    ``MARGIPOSE_BN_BF16_STATS=1`` (experimental, bf16 compute scope only)
    computes the batch mean / mean-of-squares reductions with bfloat16
    outputs instead of float32, keeping the running-stat EMA in float32 —
    the BN-reduction-traffic experiment from BASELINE.md's train-step
    attribution. ``MARGIPOSE_BN_STAT_SUBSAMPLE=k`` (experimental) computes
    batch statistics over every k-th example only (ghost-batch-norm style),
    cutting the stat-reduction HBM read traffic by 1/k; the normalisation
    itself still covers the full batch. Param/collection names match
    nn.BatchNorm exactly (scale/bias, mean/var) so checkpoints are
    interchangeable across all modes.
    """

    epsilon: float = 1e-5
    momentum: float = 0.1
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cd = current_compute_dtype()
        # Under a shard_map-over-'data' trace (parallel.precision.
        # shard_axis_scope) batch statistics must span the GLOBAL batch to
        # match single-device / GSPMD semantics, so the scope's axis acts as
        # a default for axis_name.
        axis_name = self.axis_name or current_shard_axis()
        sub = int(os.environ.get('MARGIPOSE_BN_STAT_SUBSAMPLE', '1') or '1')
        bf16_stats = (cd == jnp.bfloat16
                      and os.environ.get('MARGIPOSE_BN_BF16_STATS', '')
                      not in ('', '0'))
        if train and (sub > 1 or bf16_stats):
            # name matches nn.BatchNorm's auto-assigned child scope so the
            # param/stat tree is identical in both modes
            return _CustomStatsBN(
                self.epsilon, self.momentum, axis_name=axis_name,
                stat_dtype=jnp.bfloat16 if bf16_stats else jnp.float32,
                subsample=max(sub, 1), name='BatchNorm_0')(x)
        # Under a bf16 compute scope, pass dtype so the normalized output is
        # cast back to bf16 (otherwise the f32 running stats / scale promote
        # every BN output to f32, defeating mixed precision). Batch stats are
        # still computed AND stored in f32 (flax computes in >=f32; ra_*
        # keep param_dtype=f32).
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.momentum,
            epsilon=self.epsilon,
            axis_name=axis_name if train else None,
            dtype=cd,
        )(x)


class _CustomStatsBN(nn.Module):
    """Experimental BN body: configurable stat-reduction dtype and batch
    subsampling, f32 EMA/normalise (see BatchNorm docstring).

    ``subsample=k`` computes mean/var over ``x[::k]`` only — an unbiased
    (noisier) estimator of the batch statistics that reads 1/k of the
    activation tensor in the stat reductions."""

    epsilon: float
    momentum: float
    axis_name: str | None = None
    stat_dtype: Any = jnp.float32
    subsample: int = 1

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((feat,), jnp.float32))
        xs = x[::self.subsample] if self.subsample > 1 else x
        axes = tuple(range(xs.ndim - 1))
        xb = xs.astype(self.stat_dtype)
        mean_b = jnp.mean(xb, axes)                    # stat_dtype reduce
        meansq_b = jnp.mean(jax.lax.square(xb), axes)  # stat_dtype reduce
        mean = mean_b.astype(jnp.float32)
        meansq = meansq_b.astype(jnp.float32)
        if self.axis_name is not None:
            # match nn.BatchNorm(axis_name=...): stats over the GLOBAL batch
            mean = jax.lax.pmean(mean, self.axis_name)
            meansq = jax.lax.pmean(meansq, self.axis_name)
        var = jnp.maximum(meansq - jnp.square(mean), 0.0)
        if not self.is_initializing():
            m = 1.0 - self.momentum  # flax-convention EMA factor (0.9)
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(x.dtype)


class BasicConv2d(nn.Module):
    """Conv (no bias) + BN(eps=1e-3) + ReLU, as in pretrainedmodels
    InceptionV4. Child names: conv, bn."""

    features: int
    kernel_size: IntPair
    stride: IntPair = 1
    padding: IntPair = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConv(
            self.features, self.kernel_size, self.stride, self.padding,
            use_bias=False, name="conv",
        )(x)
        x = BatchNorm(epsilon=1e-3, name="bn")(x, train)
        return relu(x)


class MaxPool(nn.Module):
    kernel_size: IntPair
    stride: IntPair = None
    padding: IntPair = 0

    def __call__(self, x):
        return max_pool2d(x, self.kernel_size, self.stride, self.padding)


class AvgPool(nn.Module):
    kernel_size: IntPair
    stride: IntPair = None
    padding: IntPair = 0
    count_include_pad: bool = True

    def __call__(self, x):
        return avg_pool2d(
            x, self.kernel_size, self.stride, self.padding, self.count_include_pad
        )
