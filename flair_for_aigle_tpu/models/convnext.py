"""ConvNeXt v1 encoder (timm 1.x layout), NHWC flax.

Opens the monotemp encoder surface one notch past resnet/swin, matching the
reference's open ``tu-<timm>`` fallback
(/root/reference/flair_hub/models/monotemp_model.py:67-92) for the convnext
family. Param tree mirrors timm 1.x state-dict names (``stem.0``/``stem.1``,
``stages.{i}.downsample.{0,1}``, ``stages.{i}.blocks.{j}.{conv_dw,norm,
mlp.fc1,mlp.fc2,gamma}``) so published timm checkpoints convert
mechanically through models/checkpoint.py.

Returned features mimic smp's TimmUniversalEncoder with a stride-4-first
backbone: 6 entries ``[input, zero-channel dummy, s4, s8, s16, s32]`` —
identical feature contract to the swin encoder, so every decoder and the
FusionHandler attach unchanged.

TPU notes: the hot ops are the 7x7 depthwise conv (VPU-bound;
``lax.conv_general_dilated`` with ``feature_group_count=dim`` lowers to a
fused depthwise on TPU) and the two 1x1-equivalent Linears (MXU). XLA fuses
LN + gamma-scale + residual into the surrounding ops, so no custom kernel
is needed at this family's arithmetic intensity.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from flair_for_aigle_tpu.models.layers import (
    MLP,
    TorchConv,
    TorchLayerNorm,
)


class ConvNeXtBlock(nn.Module):
    """timm ConvNeXtBlock: dw7x7 -> LN -> MLP(4x, GELU) -> layer scale
    -> residual (drop-path is identity at inference; training uses none,
    matching timm's default drop_path_rate=0 for feature extraction)."""

    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = TorchConv(self.dim, 7, 1, 3, groups=self.dim,
                      name="conv_dw")(x)
        y = TorchLayerNorm(eps=1e-6, name="norm")(y)
        y = MLP(4 * self.dim, self.dim, name="mlp")(y)
        gamma = self.param("gamma", nn.initializers.constant(1e-6),
                           (self.dim,))
        return x + gamma.astype(y.dtype) * y


class ConvNeXtEncoder(nn.Module):
    """timm-1.x ConvNeXt; smp-TimmUniversalEncoder-style 6-feature output."""

    in_channels: int = 3
    dims: Sequence[int] = (96, 192, 384, 768)
    depths: Sequence[int] = (3, 3, 9, 3)
    remat: bool = False

    @property
    def out_channels(self) -> tuple[int, ...]:
        return (self.in_channels, 0, *self.dims)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        b, h, w, _ = x.shape
        feats: list[jax.Array] = [x]
        # zero-channel dummy at stride 2 (smp convention for backbones with
        # no stride-2 feature; reference flair_model.py:303)
        feats.append(jnp.zeros((b, h // 2, w // 2, 0), x.dtype))

        y = TorchConv(self.dims[0], 4, 4, 0, name="stem.0")(x)
        y = TorchLayerNorm(eps=1e-6, name="stem.1")(y)

        block_cls = nn.checkpoint(ConvNeXtBlock) if self.remat \
            else ConvNeXtBlock
        for i, (dim, depth) in enumerate(zip(self.dims, self.depths)):
            if i > 0:
                y = TorchLayerNorm(
                    eps=1e-6, name=f"stages.{i}.downsample.0")(y)
                y = TorchConv(dim, 2, 2, 0,
                              name=f"stages.{i}.downsample.1")(y)
            for j in range(depth):
                y = block_cls(dim=dim,
                              name=f"stages.{i}.blocks.{j}")(y)
            feats.append(y)
        return feats
