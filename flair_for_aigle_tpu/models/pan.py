"""PAN (Pyramid Attention Network) decoder + head (smp layout), NHWC flax.

Widens the monotemp decoder surface: the reference's ``FLAIR_Monotemp``
builds any smp arch via ``smp.create_model(arch=...)``
(/root/reference/flair_hub/models/monotemp_model.py:67-92) and 'pan' is
part of that surface. Like the UPerNet/MAnet decoders this is a documented
reconstruction of smp's public ``PANDecoder`` (no smp source ships here);
the torch oracle in tests/torch_refs.py pins the same structure:

* smp PAN dilates the encoder to output_stride 16;
* ``fpa``: Feature Pyramid Attention on the deepest feature — a global
  pooling branch (pool -> ConvBnRelu 1x1 -> bilinear, align_corners=True),
  a ``mid`` 1x1 branch, and a 3-level single-channel downsample pyramid
  (maxpool2 + ConvBnRelu k7 -> k5 -> two k3) recombined bottom-up with
  bilinear x2 ups, multiplied into ``mid``, plus the global branch;
* ``gau3``/``gau2``/``gau1``: Global Attention Upsample — 3x3 ConvBnRelu
  on the low-level feature, gated by a sigmoid SE of the high-level one
  (pool -> ConvBnRelu 1x1 w/o ReLU -> sigmoid), added to the bilinearly
  upsampled high-level map;
* decoder_channels 32; SegmentationHead Conv3x3 -> classes, x4 bilinear
  (align_corners=True).

ConvBnRelu = conv (bias=True) + BN (+ ReLU) with torch child names
``conv``/``bn``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from flair_for_aigle_tpu.models.layers import (
    TorchBatchNorm,
    TorchConv,
    max_pool2d,
)
from flair_for_aigle_tpu.models.upernet import resize_bilinear_align_corners


class ConvBnRelu(nn.Module):
    features: int
    kernel_size: int = 1
    padding: int = 0
    add_relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = TorchConv(self.features, self.kernel_size, 1, self.padding,
                      name="conv")(x)
        y = TorchBatchNorm(name="bn")(y, use_running_average=not train)
        return nn.relu(y) if self.add_relu else y


class FPABlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[-3], x.shape[-2]
        # global pooling branch: Sequential(pool, ConvBnRelu) -> child 1
        b1 = jnp.mean(x, axis=(1, 2), keepdims=True)
        b1 = ConvBnRelu(self.features, 1, name="branch1.1")(b1, train=train)
        b1 = resize_bilinear_align_corners(b1, h, w)
        mid = ConvBnRelu(self.features, 1, name="mid.0")(x, train=train)
        x1 = ConvBnRelu(1, 7, 3, name="down1.1")(
            max_pool2d(x, 2, 2, 0), train=train)
        x2 = ConvBnRelu(1, 5, 2, name="down2.1")(
            max_pool2d(x1, 2, 2, 0), train=train)
        x3 = ConvBnRelu(1, 3, 1, name="down3.1")(
            max_pool2d(x2, 2, 2, 0), train=train)
        x3 = ConvBnRelu(1, 3, 1, name="down3.2")(x3, train=train)
        x3 = resize_bilinear_align_corners(x3, h // 4, w // 4)
        x2 = ConvBnRelu(1, 5, 2, name="conv2")(x2, train=train)
        y = resize_bilinear_align_corners(x2 + x3, h // 2, w // 2)
        x1 = ConvBnRelu(1, 7, 3, name="conv1")(x1, train=train)
        y = resize_bilinear_align_corners(y + x1, h, w)
        return y * mid + b1


class GAUBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, y, train: bool = False):
        """x: low-level feature; y: high-level feature."""
        h, w = x.shape[-3], x.shape[-2]
        y_up = resize_bilinear_align_corners(y, h, w)
        x = ConvBnRelu(self.features, 3, 1, name="conv2")(x, train=train)
        g = jnp.mean(y, axis=(1, 2), keepdims=True)
        g = ConvBnRelu(self.features, 1, add_relu=False,
                       name="conv1.1")(g, train=train)
        return y_up + x * nn.sigmoid(g)


class PANDecoder(nn.Module):
    decoder_channels: int = 32

    @nn.compact
    def __call__(self, *features, train: bool = False):
        x5 = FPABlock(self.decoder_channels, name="fpa")(
            features[-1], train=train)
        x4 = GAUBlock(self.decoder_channels, name="gau3")(
            features[-2], x5, train=train)
        x3 = GAUBlock(self.decoder_channels, name="gau2")(
            features[-3], x4, train=train)
        return GAUBlock(self.decoder_channels, name="gau1")(
            features[-4], x3, train=train)


class PANSegmentationHead(nn.Module):
    classes: int
    upsampling: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = TorchConv(self.classes, 3, 1, 1, name="0")(x)
        if self.upsampling > 1:
            x = resize_bilinear_align_corners(
                x, x.shape[-3] * self.upsampling,
                x.shape[-2] * self.upsampling)
        return x
