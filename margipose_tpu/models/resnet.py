"""ResNet-18/34/50 trunks (conv1 .. layer2) and dilated layer3/4 groups.

Re-creation of the torchvision ResNet pieces the reference uses as stems
(reference: src/margipose/models/margipose_model.py:119-138 and
src/margipose/models/chatterbox_model.py:36-83). Param names mirror the
torchvision state_dict (conv1/bn1/layer1.0.conv1/... and downsample.0/.1).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from margipose_tpu.models.layers import BatchNorm, TorchConv
from margipose_tpu.ops.convs import max_pool2d, relu


class Downsample(nn.Module):
    """1x1 conv + BN shortcut; torch names downsample.0 / downsample.1."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConv(self.features, 1, stride=self.stride, use_bias=False, name="0")(x)
        return BatchNorm(name="1")(x, train)


class BasicBlock(nn.Module):
    """torchvision BasicBlock; optionally dilated (chatterbox surgery).

    dilation1/dilation2 apply to conv1/conv2 with padding == dilation,
    matching the stride->dilation surgery at
    src/margipose/models/chatterbox_model.py:56-71.
    """

    features: int
    stride: int = 1
    dilation1: int = 1
    dilation2: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = TorchConv(
            self.features, 3, stride=self.stride, padding=self.dilation1,
            dilation=self.dilation1, use_bias=False, name="conv1",
        )(x)
        out = relu(BatchNorm(name="bn1")(out, train))
        out = TorchConv(
            self.features, 3, padding=self.dilation2, dilation=self.dilation2,
            use_bias=False, name="conv2",
        )(out)
        out = BatchNorm(name="bn2")(out, train)
        if self.has_downsample:
            identity = Downsample(self.features, self.stride, name="downsample")(x, train)
        return relu(out + identity)


class Bottleneck(nn.Module):
    """torchvision Bottleneck (expansion 4); stride on conv2."""

    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = TorchConv(self.planes, 1, use_bias=False, name="conv1")(x)
        out = relu(BatchNorm(name="bn1")(out, train))
        out = TorchConv(
            self.planes, 3, stride=self.stride, padding=1, use_bias=False, name="conv2"
        )(out)
        out = relu(BatchNorm(name="bn2")(out, train))
        out = TorchConv(self.planes * 4, 1, use_bias=False, name="conv3")(out)
        out = BatchNorm(name="bn3")(out, train)
        if self.has_downsample:
            identity = Downsample(self.planes * 4, self.stride, name="downsample")(x, train)
        return relu(out + identity)


class ResLayer(nn.Module):
    """A torchvision layer group: blocks named '0', '1', ..."""

    block_cfgs: Sequence[dict] = ()
    block_cls: type = BasicBlock

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, cfg in enumerate(self.block_cfgs):
            x = self.block_cls(name=str(i), **cfg)(x, train)
        return x


# Number of blocks per layer group for each variant.
RESNET_LAYERS = {
    "resnet18": (2, 2, 2, 2),
    "resnet34": (3, 4, 6, 3),
    "resnet50": (3, 4, 6, 3),
}


def _basic_layer_cfgs(n_blocks: int, features: int, stride: int, first_has_ds: bool,
                      dilate_stride_block: bool = False, dilation: int = 1):
    """Configs for a BasicBlock layer group; optionally with the chatterbox
    stride->dilation surgery applied (stride 2 -> 1; 3x3 stride-1 convs get
    ``dilation``; the former stride-2 conv1 keeps dilation 1)."""
    cfgs = []
    for i in range(n_blocks):
        if i == 0:
            if dilate_stride_block:
                cfgs.append(dict(features=features, stride=1, dilation1=1,
                                 dilation2=dilation, has_downsample=first_has_ds))
            else:
                cfgs.append(dict(features=features, stride=stride,
                                 has_downsample=first_has_ds))
        else:
            d = dilation if dilate_stride_block else 1
            cfgs.append(dict(features=features, dilation1=d, dilation2=d))
    return cfgs


def _bottleneck_layer_cfgs(n_blocks: int, planes: int, stride: int):
    cfgs = [dict(planes=planes, stride=stride, has_downsample=True)]
    cfgs += [dict(planes=planes) for _ in range(n_blocks - 1)]
    return cfgs


class ResNetStem(nn.Module):
    """conv1 .. layer2 of a torchvision ResNet, plus a 1x1 reduction to 128
    channels for resnet50, as a margipose feature extractor
    (reference: src/margipose/models/margipose_model.py:119-138).

    Param names use the Sequential indices of the reference wrapper:
    0=conv1, 1=bn1, 4=layer1, 5=layer2, 6/7=extra conv/bn (resnet50 only).
    256x256 input -> 128 channels at 32x32.
    """

    variant: str = "resnet18"

    @nn.compact
    def __call__(self, x, train: bool = False):
        n1, n2, _, _ = RESNET_LAYERS[self.variant]
        x = TorchConv(64, 7, stride=2, padding=3, use_bias=False, name="0")(x)
        x = relu(BatchNorm(name="1")(x, train))
        x = max_pool2d(x, 3, stride=2, padding=1)
        if self.variant == "resnet50":
            x = ResLayer(block_cfgs=_bottleneck_layer_cfgs(n1, 64, 1),
                         block_cls=Bottleneck, name="4")(x, train)
            x = ResLayer(block_cfgs=_bottleneck_layer_cfgs(n2, 128, 2),
                         block_cls=Bottleneck, name="5")(x, train)
            x = TorchConv(128, 1, name="6")(x)
            x = relu(BatchNorm(name="7")(x, train))
        else:
            x = ResLayer(block_cfgs=_basic_layer_cfgs(n1, 64, 1, False), name="4")(x, train)
            x = ResLayer(block_cfgs=_basic_layer_cfgs(n2, 128, 2, True), name="5")(x, train)
        return x


class ResNet34FeatureExtractor(nn.Module):
    """conv1 .. layer2 of ResNet-34 with torchvision attribute names, as the
    chatterbox stem (reference: src/margipose/models/chatterbox_model.py:36-53)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConv(64, 7, stride=2, padding=3, use_bias=False, name="conv1")(x)
        x = relu(BatchNorm(name="bn1")(x, train))
        x = max_pool2d(x, 3, stride=2, padding=1)
        x = ResLayer(block_cfgs=_basic_layer_cfgs(3, 64, 1, False), name="layer1")(x, train)
        x = ResLayer(block_cfgs=_basic_layer_cfgs(4, 128, 2, True), name="layer2")(x, train)
        return x
