"""MAnet decoder + head (smp layout), NHWC flax.

Widens the monotemp decoder surface: the reference's ``FLAIR_Monotemp``
builds any smp arch via ``smp.create_model(arch=...)``
(/root/reference/flair_hub/models/monotemp_model.py:67-92) and 'manet' is
part of that surface. Structure mirrors smp's ``MAnetDecoder``
(kezakool ships no smp source, so like the UPerNet decoder this is a
documented reconstruction of the public layout; the torch oracle in
tests/torch_refs.py pins the same structure):

* ``center``: PAB (position attention) on the deepest feature —
  1x1 ``top_conv``/``center_conv`` to pab_channels=64, 3x3
  ``bottom_conv``; attention map softmaxed over the FLATTENED (hw x hw)
  matrix (dim=1 of the (B, hw*hw) view — an smp quirk, not a per-row
  softmax), and the attended (B, hw, C) output is ``reshape``d — not
  transposed — to (B, C, h, w) (second smp quirk, reproduced bit-for-bit);
  residual add then 3x3 ``out_conv``.
* ``blocks.{i}``: MFAB (multi-scale fusion attention) where a skip
  exists: ``hl_conv`` = Conv3x3+BN+ReLU then Conv1x1+BN+ReLU ->
  skip_channels, nearest x2 up, channel-SE on both branches
  (``SE_hl``/``SE_ll``: pool -> 1x1 -> ReLU -> 1x1 -> Sigmoid, reduction
  16), summed gate applied to the upsampled branch, concat skip, two
  Conv3x3+BN+ReLU; the final skipless block is the plain U-Net
  DecoderBlock.
* decoder_channels (256, 128, 64, 32, 16); SegmentationHead Conv3x3 at
  full resolution (upsampling=1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from flair_for_aigle_tpu.models.layers import TorchBatchNorm, TorchConv
from flair_for_aigle_tpu.models.unet import Conv2dReLU, UnetDecoderBlock
from flair_for_aigle_tpu.ops.resize import resize_nearest_nhwc


class PAB(nn.Module):
    pab_channels: int = 64

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        top = TorchConv(self.pab_channels, 1, 1, 0, name="top_conv")(x)
        center = TorchConv(self.pab_channels, 1, 1, 0, name="center_conv")(x)
        bottom = TorchConv(c, 3, 1, 1, name="bottom_conv")(x)
        top = top.reshape(b, h * w, self.pab_channels)
        center = center.reshape(b, h * w, self.pab_channels)
        bottom = bottom.reshape(b, h * w, c)
        sp = jnp.einsum("bpk,bqk->bpq", center, top)
        # smp quirk: softmax over the flattened (hw*hw) axis, not per-row
        sp = jax.nn.softmax(sp.reshape(b, -1), axis=-1).reshape(
            b, h * w, h * w)
        att = jnp.einsum("bpq,bqc->bpc", sp, bottom)
        # smp quirk: (B, hw, C) is RESHAPED to (B, C, h, w) — a scrambled
        # channel/space interleave, reproduced exactly
        att = jnp.transpose(att.reshape(b, c, h, w), (0, 2, 3, 1))
        return TorchConv(c, 3, 1, 1, name="out_conv")(x + att)


class _SE(nn.Module):
    """Sequential(pool, conv, ReLU, conv, Sigmoid) -> torch names 1 / 3."""

    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        red = max(1, self.channels // self.reduction)
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = nn.relu(TorchConv(red, 1, 1, 0, name="1")(y))
        y = TorchConv(self.channels, 1, 1, 0, name="3")(y)
        return nn.sigmoid(y)


class MFAB(nn.Module):
    skip_channels: int
    features: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        x = Conv2dReLU(x.shape[-1], name="hl_conv.0")(x, train=train)
        x = _Conv1x1BNReLU(self.skip_channels, name="hl_conv.1")(
            x, train=train)
        x = resize_nearest_nhwc(x, x.shape[-3] * 2, x.shape[-2] * 2)
        gate = (_SE(self.skip_channels, self.reduction, name="SE_hl")(x)
                + _SE(self.skip_channels, self.reduction, name="SE_ll")(skip))
        x = jnp.concatenate([x * gate, skip], axis=-1)
        x = Conv2dReLU(self.features, name="conv1")(x, train=train)
        return Conv2dReLU(self.features, name="conv2")(x, train=train)


class _Conv1x1BNReLU(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConv(self.features, 1, 1, 0, use_bias=False, name="0")(x)
        x = TorchBatchNorm(name="1")(x, use_running_average=not train)
        return nn.relu(x)


class MAnetDecoder(nn.Module):
    decoder_channels: tuple = (256, 128, 64, 32, 16)
    pab_channels: int = 64
    reduction: int = 16

    @nn.compact
    def __call__(self, *features, train: bool = False):
        feats = list(features[1:])[::-1]
        x = PAB(self.pab_channels, name="center")(feats[0])
        skips = feats[1:]
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            if skip is not None:
                x = MFAB(skip.shape[-1], ch, self.reduction,
                         name=f"blocks.{i}")(x, skip, train=train)
            else:
                x = UnetDecoderBlock(ch, name=f"blocks.{i}")(
                    x, None, train=train)
        return x
