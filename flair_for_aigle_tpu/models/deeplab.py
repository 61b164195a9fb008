"""DeepLabV3+ decoder + head (smp layout), NHWC flax.

Fourth decoder on the monotemp surface. The reference builds any smp arch
via ``smp.create_model(arch=...)``
(/root/reference/flair_hub/models/monotemp_model.py:67-92); smp's
``DeepLabV3Plus`` dilates the encoder to output_stride 16 (or 8) and runs:

* ``aspp.0``: ASPP over the deepest (dilated) feature — five parallel
  branches in ``convs``: 1x1 Conv+BN+ReLU, three separable atrous
  3x3+BN+ReLU at rates (12, 24, 36), and a pooling branch (global avg ->
  1x1 Conv+BN+ReLU -> bilinear back, align_corners=False); concat ->
  ``project`` 1x1 Conv+BN+ReLU+Dropout(0.5).
* ``aspp.1``/``aspp.2``: separable 3x3 + BN + ReLU.
* x4 bilinear up (align_corners=True; x2 at output_stride 8).
* ``block1``: 1x1 Conv+BN+ReLU -> 48ch on the stride-4 feature
  (``features[-4]``); concat; ``block2``: separable 3x3+BN+ReLU -> 256.
* SegmentationHead: 1x1 conv -> classes, x4 bilinear (align_corners=True).

``SeparableConv2d`` is Sequential(depthwise(bias=False), pointwise) —
torch child names ``0``/``1``. All shapes are static; the atrous convs
lower to dilated ``lax.conv_general_dilated`` (MXU for the pointwise,
VPU for the depthwise taps) and XLA fuses BN+ReLU into them.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from flair_for_aigle_tpu.models.layers import TorchBatchNorm, TorchConv
from flair_for_aigle_tpu.models.upernet import resize_bilinear_align_corners
from flair_for_aigle_tpu.ops.resize import resize_bilinear_nhwc


class SeparableConv2d(nn.Module):
    """smp SeparableConv2d: Sequential(depthwise no-bias, pointwise)."""

    features: int
    kernel_size: int = 3
    padding: int = 1
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        y = TorchConv(in_ch, self.kernel_size, 1, self.padding,
                      dilation=self.dilation, groups=in_ch,
                      use_bias=False, name="0")(x)
        return TorchConv(self.features, 1, 1, 0,
                         use_bias=self.use_bias, name="1")(y)


class _ConvBNReLU(nn.Module):
    """Sequential(conv 1x1 no-bias, BN, ReLU) with torch child names."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = TorchConv(self.features, 1, 1, 0, use_bias=False, name="0")(x)
        y = TorchBatchNorm(name="1")(y, use_running_average=not train)
        return nn.relu(y)


class _SepBNReLU(nn.Module):
    """Sequential(SeparableConv2d no-bias, BN, ReLU)."""

    features: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = SeparableConv2d(self.features, 3, padding=self.dilation,
                            dilation=self.dilation, use_bias=False,
                            name="0")(x)
        y = TorchBatchNorm(name="1")(y, use_running_average=not train)
        return nn.relu(y)


class _AtrousBNReLU(nn.Module):
    """smp ASPPConv (non-separable): Sequential(dilated 3x3 no-bias, BN,
    ReLU) — plain DeepLabV3 uses this where V3+ uses the separable one."""

    features: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = TorchConv(self.features, 3, 1, self.dilation,
                      dilation=self.dilation, use_bias=False, name="0")(x)
        y = TorchBatchNorm(name="1")(y, use_running_average=not train)
        return nn.relu(y)


class ASPP(nn.Module):
    out_features: int = 256
    atrous_rates: Sequence[int] = (12, 24, 36)
    # smp: DeepLabV3 passes separable=False, DeepLabV3+ separable=True
    separable: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[-3], x.shape[-2]
        branches = [_ConvBNReLU(self.out_features, name="convs.0")(x, train=train)]
        atrous_cls = _SepBNReLU if self.separable else _AtrousBNReLU
        for i, rate in enumerate(self.atrous_rates):
            branches.append(
                atrous_cls(self.out_features, dilation=rate,
                           name=f"convs.{i + 1}")(x, train=train))
        # pooling branch: Sequential(pool, conv, BN, ReLU) -> child idx 1, 2
        p = jnp.mean(x.astype(jnp.float32), axis=(1, 2),
                     keepdims=True).astype(x.dtype)
        p = TorchConv(self.out_features, 1, 1, 0, use_bias=False,
                      name="convs.4.1")(p)
        p = TorchBatchNorm(name="convs.4.2")(p, use_running_average=not train)
        p = resize_bilinear_nhwc(nn.relu(p), h, w)
        branches.append(p)
        y = jnp.concatenate(branches, axis=-1)
        y = _ConvBNReLU(self.out_features, name="project")(y, train=train)
        if train:
            y = nn.Dropout(rate=0.5)(y, deterministic=False)
        return y


class DeepLabV3PlusDecoder(nn.Module):
    out_features: int = 256
    atrous_rates: Sequence[int] = (12, 24, 36)
    output_stride: int = 16

    @nn.compact
    def __call__(self, *features, train: bool = False):
        x = ASPP(self.out_features, self.atrous_rates,
                 name="aspp.0")(features[-1], train=train)
        # the outer aspp Sequential is flat: separable at .1, BN at .2
        x = SeparableConv2d(self.out_features, 3, padding=1, use_bias=False,
                            name="aspp.1")(x)
        x = nn.relu(TorchBatchNorm(name="aspp.2")(
            x, use_running_average=not train))
        scale = 2 if self.output_stride == 8 else 4
        x = resize_bilinear_align_corners(
            x, x.shape[-3] * scale, x.shape[-2] * scale)
        hi = _ConvBNReLU(48, name="block1")(features[-4], train=train)
        y = jnp.concatenate([x, hi], axis=-1)
        return _SepBNReLU(self.out_features, name="block2")(y, train=train)


class DeepLabV3Decoder(nn.Module):
    """smp DeepLabV3Decoder: an nn.Sequential(ASPP(separable=False),
    Conv3x3 no-bias, BN, ReLU) over ``features[-1]`` — torch child names
    ``decoder.{0,1,2}``. The model dilates its encoder to output_stride 8
    and the head upsamples x8 (kernel 1)."""

    out_features: int = 256
    atrous_rates: Sequence[int] = (12, 24, 36)

    @nn.compact
    def __call__(self, *features, train: bool = False):
        x = ASPP(self.out_features, self.atrous_rates, separable=False,
                 name="0")(features[-1], train=train)
        x = TorchConv(self.out_features, 3, 1, 1, use_bias=False,
                      name="1")(x)
        return nn.relu(TorchBatchNorm(name="2")(
            x, use_running_average=not train))


class DeepLabSegmentationHead(nn.Module):
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
