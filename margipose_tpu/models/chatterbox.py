"""Chatterbox: single-stage architecture with axis-collapsing z heads.

TPU-native re-design of the reference alternative architecture
(reference: src/margipose/models/chatterbox_model.py:13-303). ResNet-34 stem;
the xy head is a dilated ResNet layer3/4 (stride->dilation surgery); the
zy/xz heads are "chatterbox" CNNs that collapse one spatial axis to width 1
and transpose-convolve back up.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from margipose_tpu.models.layers import BatchNorm, TorchConv, TorchConvTranspose
from margipose_tpu.models.margipose import (
    ModelOutput,
    heatmaps_to_coords,
    margipose_2d_losses,
    margipose_3d_losses,
)
from margipose_tpu.models.resnet import ResLayer, ResNet34FeatureExtractor, _basic_layer_cfgs
from margipose_tpu.ops.convs import relu
from margipose_tpu.ops.dsnt import flat_softmax

Default_Chatterbox_Desc = {
    'type': 'chatterbox',
    'version': '1.3.0',
    'settings': {
        'pixelwise_loss': 'jsd',
    },
}


def _f(shrink_width: bool, a, b):
    """Orientation helper matching the reference's f(a, b)
    (reference: src/margipose/models/chatterbox_model.py:90-94)."""
    return (a, b) if shrink_width else (b, a)


class XYCnn(nn.Module):
    """Dilated ResNet-34 layer3+layer4 + 1x1 heatmap conv
    (reference: src/margipose/models/chatterbox_model.py:56-83).

    Surgery semantics: stride-2 convs become stride 1 (keeping dilation 1);
    remaining 3x3 convs get dilation 2 (layer3) / 4 (layer4).
    """

    n_joints: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ResLayer(
            block_cfgs=_basic_layer_cfgs(6, 256, 2, True, dilate_stride_block=True,
                                         dilation=2),
            name='layer1',
        )(x, train)
        x = ResLayer(
            block_cfgs=_basic_layer_cfgs(3, 512, 2, True, dilate_stride_block=True,
                                         dilation=4),
            name='layer2',
        )(x, train)
        return TorchConv(self.n_joints, 1, use_bias=False, name='hm_conv')(x)


class CbDownBlock(nn.Module):
    """(reference: src/margipose/models/chatterbox_model.py:130-168)"""

    features: int
    stride: tuple = (1, 1)
    dilation: tuple = (1, 1)
    dilation_in: tuple | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dilation_in = self.dilation_in if self.dilation_in is not None else self.dilation
        residual = x
        out = TorchConv(self.features, 3, stride=self.stride, padding=dilation_in,
                        dilation=dilation_in, use_bias=False, name='conv1')(x)
        out = relu(BatchNorm(name='bn1')(out, train))
        out = TorchConv(self.features, 3, padding=self.dilation, dilation=self.dilation,
                        use_bias=False, name='conv2')(out)
        out = BatchNorm(name='bn2')(out, train)
        if tuple(self.stride) != (1, 1) or x.shape[-1] != self.features:
            residual = TorchConv(self.features, 1, stride=self.stride, use_bias=False,
                                 name='resample_0')(x)
            residual = BatchNorm(name='resample_1')(residual, train)
        return relu(out + residual)


class CbUpBlock(nn.Module):
    """(reference: src/margipose/models/chatterbox_model.py:170-211)"""

    features: int
    stride: tuple = (1, 1)
    dilation: tuple = (1, 1)
    dilation_in: tuple | None = None
    output_padding: tuple = (0, 0)

    @nn.compact
    def __call__(self, x, train: bool = False):
        dilation_in = self.dilation_in if self.dilation_in is not None else self.dilation
        residual = x
        out = TorchConvTranspose(self.features, 3, stride=self.stride, padding=dilation_in,
                                 dilation=dilation_in, output_padding=self.output_padding,
                                 use_bias=False, name='conv1')(x)
        out = relu(BatchNorm(name='bn1')(out, train))
        out = TorchConv(self.features, 3, padding=self.dilation, dilation=self.dilation,
                        use_bias=False, name='conv2')(out)
        out = BatchNorm(name='bn2')(out, train)
        if tuple(self.stride) != (1, 1) or x.shape[-1] != self.features:
            residual = TorchConvTranspose(self.features, 1, stride=self.stride,
                                          output_padding=self.output_padding,
                                          use_bias=False, name='resample_0')(x)
            residual = BatchNorm(name='resample_1')(residual, train)
        return relu(out + residual)


class ChatterboxCnn(nn.Module):
    """Collapse one spatial axis to 1 then transpose back
    (reference: src/margipose/models/chatterbox_model.py:86-220)."""

    n_joints: int
    shrink_width: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = lambda a, b: _f(self.shrink_width, a, b)
        # down: 128x32x32 -> 1024 x 32 x 1 (or transposed)
        x = CbDownBlock(256, stride=f(1, 2), dilation=f(2, 1), dilation_in=f(1, 1),
                        name='down_0')(x, train)
        x = CbDownBlock(256, dilation=f(2, 1), name='down_1')(x, train)
        x = CbDownBlock(512, stride=f(1, 2), dilation=f(4, 1), dilation_in=f(2, 1),
                        name='down_2')(x, train)
        x = CbDownBlock(512, dilation=f(4, 1), name='down_3')(x, train)
        x = TorchConv(1024, f(1, 8), use_bias=False, name='down_4')(x)
        x = relu(BatchNorm(name='down_5')(x, train))
        # up: back to n_joints x 32 x 32
        x = TorchConvTranspose(512, f(1, 8), use_bias=False, name='up_0')(x)
        x = relu(BatchNorm(name='up_1')(x, train))
        x = CbUpBlock(512, dilation=f(4, 1), name='up_3')(x, train)
        x = CbUpBlock(256, stride=f(1, 2), dilation=f(2, 1), dilation_in=f(4, 1),
                      output_padding=f(0, 1), name='up_4')(x, train)
        x = CbUpBlock(256, dilation=f(2, 1), name='up_5')(x, train)
        x = CbUpBlock(128, stride=f(1, 2), dilation=f(1, 1), dilation_in=f(2, 1),
                      output_padding=f(0, 1), name='up_6')(x, train)
        return TorchConv(self.n_joints, 1, use_bias=False, name='up_7')(x)


class ChatterboxModel(nn.Module):
    """(reference: src/margipose/models/chatterbox_model.py:223-289)"""

    n_joints: int = 17
    pixelwise_loss: str | None = 'jsd'

    def setup(self):
        self.in_cnn = ResNet34FeatureExtractor(name='in_cnn')
        self.xy_hm_cnn = XYCnn(self.n_joints, name='xy_hm_cnn')
        self.zy_hm_cnn = ChatterboxCnn(self.n_joints, shrink_width=True, name='zy_hm_cnn')
        self.xz_hm_cnn = ChatterboxCnn(self.n_joints, shrink_width=False, name='xz_hm_cnn')

    def __call__(self, x, train: bool = False):
        t = self.in_cnn(x, train)

        def head(module):
            hm = module(t, train)
            hm = jnp.transpose(hm, (0, 3, 1, 2))
            return flat_softmax(hm.astype(jnp.float32))

        out = ModelOutput(
            xy_heatmaps=(head(self.xy_hm_cnn),),
            zy_heatmaps=(head(self.zy_hm_cnn),),
            xz_heatmaps=(head(self.xz_hm_cnn),),
        )
        xyz = heatmaps_to_coords(out.xy_heatmaps[-1], out.zy_heatmaps[-1],
                                 out.xz_heatmaps[-1])
        return xyz, out


# Chatterbox losses only use the final (single) stage, which is exactly what
# the shared margipose loss functions compute for a 1-stage ModelOutput
# (reference: src/margipose/models/chatterbox_model.py:249-271).
chatterbox_2d_losses = margipose_2d_losses
chatterbox_3d_losses = margipose_3d_losses
