"""LinkNet decoder + head (smp layout), NHWC flax.

Widens the monotemp decoder surface: the reference's ``FLAIR_Monotemp``
builds any smp arch via ``smp.create_model(arch=...)``
(/root/reference/flair_hub/models/monotemp_model.py:67-92) and 'linknet'
is part of that surface. Structure mirrors smp's ``LinknetDecoder``
(stable layout since smp 0.1):

* drop the identity feature, reverse (deepest first);
* 5 blocks, each ``block`` = Sequential(
    Conv1x1(no bias)+BN+ReLU            -> torch ``block.0.{0,1}``,
    ConvTranspose4x4/s2/p1(bias)+BN+ReLU -> torch ``block.1.{0,1}``,
    Conv1x1(no bias)+BN+ReLU            -> torch ``block.2.{0,1}``)
  with channel plan reversed-encoder + [prefinal=32], bottleneck in//4;
* the skip is ADDED after the block (residual fusion, not concat);
* SegmentationHead: Conv1x1 at full resolution (upsampling=1 — the five
  x2 transposes already reach stride 1).
"""

from __future__ import annotations

from typing import Sequence

import jax
from flax import linen as nn

from flair_for_aigle_tpu.models.layers import (
    TorchBatchNorm,
    TorchConv,
    TorchConvTranspose,
)


class Conv1x1BNReLU(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConv(self.features, 1, 1, 0, use_bias=False, name="0")(x)
        x = TorchBatchNorm(name="1")(x, use_running_average=not train)
        return nn.relu(x)


class TransposeX2(nn.Module):
    """smp TransposeX2: ConvTranspose2d(4, s2, p1) + BN + ReLU."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConvTranspose(self.features, 4, 2, 1, name="0")(x)
        x = TorchBatchNorm(name="1")(x, use_running_average=not train)
        return nn.relu(x)


class LinknetDecoderBlock(nn.Module):
    in_features: int
    features: int

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        x = Conv1x1BNReLU(self.in_features // 4, name="block.0")(x, train=train)
        x = TransposeX2(self.in_features // 4, name="block.1")(x, train=train)
        x = Conv1x1BNReLU(self.features, name="block.2")(x, train=train)
        if skip is not None:
            x = x + skip
        return x


class LinknetDecoder(nn.Module):
    prefinal_channels: int = 32
    n_blocks: int = 5

    @nn.compact
    def __call__(self, *features, train: bool = False):
        # smp: drop the identity feature, reverse (deepest first)
        feats = list(features[1:])[::-1]
        x = feats[0]
        skips = feats[1:]
        in_ch = [f.shape[-1] for f in feats]
        channels = in_ch + [self.prefinal_channels]
        for i in range(self.n_blocks):
            skip = skips[i] if i < len(skips) else None
            x = LinknetDecoderBlock(
                channels[i], channels[i + 1], name=f"blocks.{i}"
            )(x, skip, train=train)
        return x


class LinknetSegmentationHead(nn.Module):
    """Conv1x1 head at full resolution (smp Linknet: kernel_size=1,
    upsampling=1)."""

    classes: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return TorchConv(self.classes, 1, 1, 0, name="0")(x)


# converter hint: LinkNet transpose convs live at ``...block.1.0``
LINKNET_TRANSPOSE_CONV_PATTERNS: Sequence[str] = (".block.1.0",)
