"""FPN decoder + head (smp-style), NHWC flax.

Widens the monotemp decoder surface past unet/upernet: the reference's
``FLAIR_Monotemp`` builds any smp arch via ``smp.create_model(arch=...)``
(/root/reference/flair_hub/models/monotemp_model.py:67-92), and FPN is the
classic choice after those two. Structure mirrors
segmentation_models_pytorch's ``FPNDecoder`` (stable layout since smp 0.1):

* ``p5``: 1x1 conv (with bias) on the deepest feature -> pyramid (256).
* ``p4``/``p3``/``p2``: nearest x2 top-down + 1x1 ``skip_conv`` lateral add.
* ``seg_blocks.{0..3}``: for [p5, p4, p3, p2] with n_upsamples [3, 2, 1, 0],
  each a chain of Conv3x3(no bias) + GroupNorm(32) + ReLU blocks, every
  block but a 0-upsample one followed by x2 bilinear (align_corners=True);
  torch names ``seg_blocks.{i}.block.{j}.block.{0,1}``.
* merge policy ``add`` (smp default): sum the four stride-4 maps.
* ``Dropout2d(p=0.2)`` (channel-wise; identity at inference).
* SegmentationHead: 1x1 conv -> classes, then x4 bilinear
  (align_corners=True) to full resolution — note kernel 1, unlike
  unet/upernet's 3 (smp FPN passes kernel_size=1).

Only the last four features are consumed (smp ``features[-4:]``), so the
zero-channel dummy from transformer encoders never reaches this decoder.
"""

from __future__ import annotations

import jax
from flax import linen as nn

from flair_for_aigle_tpu.models.layers import TorchConv, TorchGroupNorm
from flair_for_aigle_tpu.models.upernet import resize_bilinear_align_corners
from flair_for_aigle_tpu.ops.resize import resize_nearest_nhwc


class Conv3x3GNReLU(nn.Module):
    features: int
    upsample: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = TorchConv(self.features, 3, 1, 1, use_bias=False,
                      name="block.0")(x)
        y = nn.relu(TorchGroupNorm(num_groups=32, name="block.1")(y))
        if self.upsample:
            y = resize_bilinear_align_corners(
                y, y.shape[-3] * 2, y.shape[-2] * 2)
        return y


class SegmentationBlock(nn.Module):
    features: int
    n_upsamples: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = Conv3x3GNReLU(self.features, upsample=self.n_upsamples > 0,
                          name="block.0")(x)
        for j in range(1, self.n_upsamples):
            y = Conv3x3GNReLU(self.features, upsample=True,
                              name=f"block.{j}")(y)
        return y


class FPNLateralBlock(nn.Module):
    """smp FPNBlock: nearest x2 on the top-down path + 1x1 lateral add."""

    pyramid_features: int

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array) -> jax.Array:
        x = resize_nearest_nhwc(x, skip.shape[-3], skip.shape[-2])
        return x + TorchConv(self.pyramid_features, 1, 1, 0,
                             name="skip_conv")(skip)


class FPNDecoder(nn.Module):
    pyramid_channels: int = 256
    segmentation_channels: int = 128
    dropout: float = 0.2

    @nn.compact
    def __call__(self, *features, train: bool = False):
        c2, c3, c4, c5 = features[-4:]
        p5 = TorchConv(self.pyramid_channels, 1, 1, 0, name="p5")(c5)
        p4 = FPNLateralBlock(self.pyramid_channels, name="p4")(p5, c4)
        p3 = FPNLateralBlock(self.pyramid_channels, name="p3")(p4, c3)
        p2 = FPNLateralBlock(self.pyramid_channels, name="p2")(p3, c2)
        pyramid = [
            SegmentationBlock(self.segmentation_channels, n_upsamples=n,
                              name=f"seg_blocks.{i}")(p)
            for i, (p, n) in enumerate(zip((p5, p4, p3, p2), (3, 2, 1, 0)))
        ]
        y = sum(pyramid)  # merge_policy='add' (smp default)
        if train and self.dropout > 0:
            # torch Dropout2d: whole channels dropped per sample
            y = nn.Dropout(rate=self.dropout, broadcast_dims=(1, 2))(
                y, deterministic=False)
        return y


class FPNSegmentationHead(nn.Module):
    classes: int
    upsampling: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = TorchConv(self.classes, 1, 1, 0, name="0")(x)
        if self.upsampling > 1:
            x = resize_bilinear_align_corners(
                x, x.shape[-3] * self.upsampling,
                x.shape[-2] * self.upsampling)
        return x
