"""InceptionV4 stem (feature blocks 0-6) with 'same'-ified padding.

Re-creation of the truncated InceptionV4 feature extractor used by the
reference MargiPose model: the first 7 blocks of pretrainedmodels'
``inceptionv4().features``, with every Conv2d/MaxPool2d padding forced to
``kernel_size // 2`` (reference: src/margipose/models/margipose_model.py:103-118).

Input 256x256x3 -> output 384 channels at 32x32. Param names mirror the
torch state_dict (``0.conv.weight`` ... ``6.branch3.1.bn.bias``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from margipose_tpu.models.layers import BasicConv2d
from margipose_tpu.ops.convs import avg_pool2d, max_pool2d


class Mixed3a(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x0 = max_pool2d(x, 3, stride=2, padding=1)
        x1 = BasicConv2d(96, 3, stride=2, padding=1, name="conv")(x, train)
        return jnp.concatenate([x0, x1], axis=-1)


class Mixed4aBranch0(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BasicConv2d(64, 1, name="0")(x, train)
        x = BasicConv2d(96, 3, padding=1, name="1")(x, train)
        return x


class Mixed4aBranch1(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BasicConv2d(64, 1, name="0")(x, train)
        x = BasicConv2d(64, (1, 7), padding=(0, 3), name="1")(x, train)
        x = BasicConv2d(64, (7, 1), padding=(3, 0), name="2")(x, train)
        x = BasicConv2d(96, 3, padding=1, name="3")(x, train)
        return x


class Mixed4a(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x0 = Mixed4aBranch0(name="branch0")(x, train)
        x1 = Mixed4aBranch1(name="branch1")(x, train)
        return jnp.concatenate([x0, x1], axis=-1)


class Mixed5a(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x0 = BasicConv2d(192, 3, stride=2, padding=1, name="conv")(x, train)
        x1 = max_pool2d(x, 3, stride=2, padding=1)
        return jnp.concatenate([x0, x1], axis=-1)


class InceptionABranch1(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BasicConv2d(64, 1, name="0")(x, train)
        x = BasicConv2d(96, 3, padding=1, name="1")(x, train)
        return x


class InceptionABranch2(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BasicConv2d(64, 1, name="0")(x, train)
        x = BasicConv2d(96, 3, padding=1, name="1")(x, train)
        x = BasicConv2d(96, 3, padding=1, name="2")(x, train)
        return x


class InceptionABranch3(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)
        x = BasicConv2d(96, 1, name="1")(x, train)
        return x


class InceptionA(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x0 = BasicConv2d(96, 1, name="branch0")(x, train)
        x1 = InceptionABranch1(name="branch1")(x, train)
        x2 = InceptionABranch2(name="branch2")(x, train)
        x3 = InceptionABranch3(name="branch3")(x, train)
        return jnp.concatenate([x0, x1, x2, x3], axis=-1)

