"""PSPNet decoder + head (smp layout), NHWC flax.

Widens the monotemp decoder surface: the reference's ``FLAIR_Monotemp``
builds any smp arch via ``smp.create_model(arch=...)``
(/root/reference/flair_hub/models/monotemp_model.py:67-92) and 'pspnet' is
part of that surface. Structure mirrors smp's ``PSPDecoder``:

* smp PSPNet uses **encoder_depth=3** — the encoder builds only stem +
  layer1 + layer2 (deepest stride 8) and the decoder consumes
  ``features[-1]`` only;
* PSPModule over pool sizes (1, 2, 3, 6): AdaptiveAvgPool2d(size) ->
  Conv1x1+BN+ReLU (the size-1 branch drops BN — "PyTorch does not support
  BatchNorm for 1x1 shape" in smp — so its conv keeps a bias) -> bilinear
  upsample (align_corners=True) back to the feature size; branch width
  in_channels // 4; concat branches + input (2*in_channels);
* ``conv``: Conv1x1(no bias)+BN+ReLU -> 512, then Dropout2d(0.2);
* SegmentationHead: Conv3x3 -> classes, x8 bilinear (align_corners=True)
  — stride-8 features reach full resolution.

torch names: ``decoder.psp.blocks.{i}.pool.1.{0,1}``, ``decoder.conv.{0,1}``,
``segmentation_head.0``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from flair_for_aigle_tpu.models.layers import TorchBatchNorm, TorchConv
from flair_for_aigle_tpu.models.upernet import resize_bilinear_align_corners


def adaptive_avg_pool_nhwc(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """torch AdaptiveAvgPool2d semantics (possibly-overlapping bins:
    start = floor(i*H/out), end = ceil((i+1)*H/out)); static shapes."""
    h, w = x.shape[-3], x.shape[-2]
    rows = []
    for i in range(out_h):
        h0, h1 = (i * h) // out_h, -(-((i + 1) * h) // out_h)
        cols = []
        for j in range(out_w):
            w0, w1 = (j * w) // out_w, -(-((j + 1) * w) // out_w)
            cols.append(x[:, h0:h1, w0:w1, :].mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


class PSPBlock(nn.Module):
    features: int
    pool_size: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[-3], x.shape[-2]
        y = adaptive_avg_pool_nhwc(x, self.pool_size, self.pool_size)
        use_bn = self.pool_size != 1
        y = TorchConv(self.features, 1, 1, 0, use_bias=not use_bn,
                      name="pool.1.0")(y)
        if use_bn:
            y = TorchBatchNorm(name="pool.1.1")(
                y, use_running_average=not train)
        y = nn.relu(y)
        return resize_bilinear_align_corners(y, h, w)


class PSPDecoder(nn.Module):
    out_channels: int = 512
    sizes: tuple = (1, 2, 3, 6)
    dropout: float = 0.2

    @nn.compact
    def __call__(self, *features, train: bool = False):
        x = features[-1]
        branch = x.shape[-1] // len(self.sizes)
        ys = [
            PSPBlock(branch, s, name=f"psp.blocks.{i}")(x, train=train)
            for i, s in enumerate(self.sizes)
        ] + [x]
        y = jnp.concatenate(ys, axis=-1)
        y = TorchConv(self.out_channels, 1, 1, 0, use_bias=False,
                      name="conv.0")(y)
        y = nn.relu(TorchBatchNorm(name="conv.1")(
            y, use_running_average=not train))
        if train and self.dropout > 0:
            y = nn.Dropout(rate=self.dropout, broadcast_dims=(1, 2))(
                y, deterministic=False)
        return y


class PSPSegmentationHead(nn.Module):
    classes: int
    upsampling: int = 8

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = TorchConv(self.classes, 3, 1, 1, name="0")(x)
        if self.upsampling > 1:
            x = resize_bilinear_align_corners(
                x, x.shape[-3] * self.upsampling,
                x.shape[-2] * self.upsampling)
        return x
