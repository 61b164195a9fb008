"""smp-compatible U-Net decoder + segmentation head, NHWC flax.

Mirrors segmentation_models_pytorch's ``UnetDecoder``: for encoder depth 5,
decoder_channels (256, 128, 64, 32, 16); each block = nearest x2 upsample,
concat skip, two Conv3x3(no bias)+BN+ReLU. Param tree mirrors smp names
(``blocks.0.conv1.0`` = conv, ``blocks.0.conv1.1`` = bn); the segmentation
head is ``segmentation_head.0`` (Conv3x3 pad 1).

Reference behavior spec: flair_hub/models/monotemp_model.py (DecoderWrapper
runs decoder then head on the encoder feature pyramid).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from flair_for_aigle_tpu.models.layers import TorchBatchNorm, TorchConv
from flair_for_aigle_tpu.ops.resize import resize_nearest_nhwc


class Conv2dReLU(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConv(self.features, 3, 1, 1, use_bias=False, name="0")(x)
        x = TorchBatchNorm(name="1")(x, use_running_average=not train)
        return nn.relu(x)


class UnetDecoderBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        h, w = x.shape[-3] * 2, x.shape[-2] * 2
        x = resize_nearest_nhwc(x, h, w)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        x = Conv2dReLU(self.features, name="conv1")(x, train=train)
        x = Conv2dReLU(self.features, name="conv2")(x, train=train)
        return x


class UnetDecoder(nn.Module):
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)

    @nn.compact
    def __call__(self, *features, train: bool = False):
        # smp: drop the identity feature, reverse (deepest first)
        feats = list(features[1:])[::-1]
        head = feats[0]
        skips = feats[1:]
        x = head
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            x = UnetDecoderBlock(ch, name=f"blocks.{i}")(x, skip, train=train)
        return x


class SegmentationHead(nn.Module):
    classes: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        return TorchConv(
            self.classes, self.kernel_size, 1, self.kernel_size // 2, name="0"
        )(x)
