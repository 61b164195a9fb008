"""UPerNet decoder + head (smp 0.4.0-style), NHWC flax.

Pairs with SwinTransformerEncoder for the reference's flagship
``swin_base_patch4_window12_384-upernet`` arch (reference
configs/train/config_models.yaml:5). Structure reconstructed from
segmentation_models_pytorch 0.4.0's UPerNetDecoder (not installed here; the
smp-key naming is a documented assumption, kept lenient in the converter):

* PSP on the deepest feature: pools (1,2,3,6) → 1x1 Conv+BN+ReLU (C→C/4)
  → bilinear(align_corners=True) back; concat with input → 1x1 Conv+BN+ReLU
  (2C→pyramid=256). Param names ``psp.blocks.{i}.pool.1.{0,1}``,
  ``psp.out_conv.{0,1}``.
* FPN: lateral 1x1 Conv+BN+ReLU on each shallower feature
  (``fpn_stages.{i}.skip_conv.{0,1}``), top-down nearest x2 + add.
* All pyramid maps resized (bilinear, align_corners=False) to the stride-4
  map, concatenated, fused by ``fpn_bottleneck`` 3x3 Conv+BN+ReLU → 64ch.
* SegmentationHead: 3x3 conv → classes, then x4 bilinear upsample with
  align_corners=True (torch nn.UpsamplingBilinear2d), giving full-resolution
  logits as the reference's DecoderWrapper output does.

The zero-channel dummy features emitted by transformer encoders are dropped
here exactly as smp does (reference flair_model.py:517 relies on the same
convention at fusion level).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from flair_for_aigle_tpu.models.layers import TorchBatchNorm, TorchConv
from flair_for_aigle_tpu.ops.resize import (
    resize_bilinear_ac_nhwc,
    adaptive_avg_pool_nhwc,
    resize_bilinear_nhwc,
    resize_nearest_nhwc,
)


def resize_bilinear_align_corners(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear with align_corners=True (torch nn.UpsamplingBilinear2d),
    as interpolation matmuls (ops/resize.py:resize_bilinear_ac_nhwc). The
    earlier gather+lerp form had a scatter-add backward that dominated the
    TRAINING step's head+CE cost (x4 upsample of the 512x512x19 logits)."""
    return resize_bilinear_ac_nhwc(x, out_h, out_w)


class ConvBNReLU(nn.Module):
    features: int
    kernel_size: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConv(
            self.features, self.kernel_size, 1, self.kernel_size // 2,
            use_bias=False, name="0",
        )(x)
        x = TorchBatchNorm(name="1")(x, use_running_average=not train)
        return nn.relu(x)


class SplitInputConvBNReLU(nn.Module):
    """ConvBNReLU over a channel-concatenation, computed concat-free
    (TorchConv list-input mode). Identical param tree to ConvBNReLU."""

    features: int
    kernel_size: int = 1

    @nn.compact
    def __call__(self, xs, train: bool = False):
        x = TorchConv(
            self.features, self.kernel_size, 1, self.kernel_size // 2,
            use_bias=False, name="0",
        )(xs)
        x = TorchBatchNorm(name="1")(x, use_running_average=not train)
        return nn.relu(x)


class PSPBlock(nn.Module):
    out_features: int
    pool_size: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[-3], x.shape[-2]
        y = adaptive_avg_pool_nhwc(x, self.pool_size, self.pool_size)
        y = ConvBNReLU(self.out_features, 1, name="pool.1")(y, train=train)
        return resize_bilinear_align_corners(y, h, w)


class PSPModule(nn.Module):
    out_features: int
    sizes: Sequence[int] = (1, 2, 3, 6)

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        branch = in_ch // len(self.sizes)
        ys = [
            PSPBlock(branch, s, name=f"blocks.{i}")(x, train=train)
            for i, s in enumerate(self.sizes)
        ]
        y = jnp.concatenate(ys + [x], axis=-1)
        return ConvBNReLU(self.out_features, 1, name="out_conv")(y, train=train)


class FPNBlock(nn.Module):
    pyramid_features: int

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        skip = ConvBNReLU(self.pyramid_features, 1, name="skip_conv")(skip, train=train)
        x = resize_nearest_nhwc(x, skip.shape[-3], skip.shape[-2])
        return x + skip


class UPerNetDecoder(nn.Module):
    pyramid_channels: int = 256
    segmentation_channels: int = 64

    @nn.compact
    def __call__(self, *features, train: bool = False):
        feats = [f for f in features[2:]]
        psp_out = PSPModule(self.pyramid_channels, name="psp")(feats[-1], train=train)
        fpn_features = [psp_out]
        shallower = feats[:-1]
        for i in range(len(shallower) - 1, -1, -1):
            fpn_features.append(
                FPNBlock(self.pyramid_channels, name=f"fpn_stages.{i}")(
                    fpn_features[-1], shallower[i], train=train
                )
            )
        target_h, target_w = feats[0].shape[-3], feats[0].shape[-2]
        resized = [
            resize_bilinear_nhwc(f, target_h, target_w) for f in fpn_features
        ]
        # concat-free bottleneck: conv is linear in input channels, so the
        # 3x3 conv over the concatenated pyramid equals the sum of per-level
        # convs with the kernel sliced along C_in — skipping the (B, H/4,
        # W/4, 5*pyramid) concat materialization (~1.3 GB/batch-16 of HBM
        # traffic at swin-base 512px). Params identical to the concat form.
        return SplitInputConvBNReLU(
            self.segmentation_channels, 3, name="fpn_bottleneck"
        )(resized, train=train)


class UPerNetSegmentationHead(nn.Module):
    classes: int
    upsampling: int = 4

    @nn.compact
    def __call__(self, x):
        x = TorchConv(self.classes, 3, 1, 1, name="0")(x)
        if self.upsampling > 1:
            x = resize_bilinear_align_corners(
                x, x.shape[-3] * self.upsampling, x.shape[-2] * self.upsampling
            )
        return x
