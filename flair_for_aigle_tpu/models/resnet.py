"""ResNet encoders (smp/torchvision-compatible), NHWC flax.

The flax module tree mirrors torch module names 1:1 (``layer1.0.conv1`` →
params["layer1"]["0"]["conv1"]) so the checkpoint converter
(models/checkpoint.py) is a mechanical per-leaf transform. Mirrors the
encoder used by the reference via smp ``create_model`` for the
``resnet34-unet`` arch (reference flair_hub/models/monotemp_model.py:68).

Forward returns the smp encoder feature pyramid (depth=5):
``[x, conv1+bn1+relu, maxpool+layer1, layer2, layer3, layer4]`` with
out_channels (C_in, 64, 64, 128, 256, 512) for resnet18/34.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from flair_for_aigle_tpu.models.layers import TorchBatchNorm, TorchConv, max_pool2d


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    use_downsample: bool = False
    # smp make_dilated/replace_strides_with_dilation: every conv in a
    # dilated stage has stride 1 and every 3x3 conv dilation=padding=rate
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        d = self.dilation
        out = TorchConv(self.features, 3, self.stride, d, dilation=d,
                        use_bias=False, name="conv1")(x)
        out = TorchBatchNorm(name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = TorchConv(self.features, 3, 1, d, dilation=d,
                        use_bias=False, name="conv2")(out)
        out = TorchBatchNorm(name="bn2")(out, use_running_average=not train)
        if self.use_downsample:
            identity = TorchConv(
                self.features, 1, self.stride, 0, use_bias=False, name="downsample.0"
            )(x)
            identity = TorchBatchNorm(name="downsample.1")(
                identity, use_running_average=not train
            )
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    stride: int = 1
    use_downsample: bool = False
    expansion: int = 4
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        d = self.dilation
        out = TorchConv(self.features, 1, 1, 0, use_bias=False, name="conv1")(x)
        out = nn.relu(TorchBatchNorm(name="bn1")(out, use_running_average=not train))
        out = TorchConv(self.features, 3, self.stride, d, dilation=d,
                        use_bias=False, name="conv2")(out)
        out = nn.relu(TorchBatchNorm(name="bn2")(out, use_running_average=not train))
        out = TorchConv(self.features * self.expansion, 1, 1, 0, use_bias=False, name="conv3")(out)
        out = TorchBatchNorm(name="bn3")(out, use_running_average=not train)
        if self.use_downsample:
            identity = TorchConv(
                self.features * self.expansion, 1, self.stride, 0,
                use_bias=False, name="downsample.0",
            )(x)
            identity = TorchBatchNorm(name="downsample.1")(
                identity, use_running_average=not train
            )
        return nn.relu(out + identity)


_RESNET_SPECS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2), 1),
    "resnet34": (BasicBlock, (3, 4, 6, 3), 1),
    "resnet50": (Bottleneck, (3, 4, 6, 3), 4),
    "resnet101": (Bottleneck, (3, 4, 23, 3), 4),
}


class ResNetEncoder(nn.Module):
    """smp-style ResNet encoder returning the 6-level feature pyramid (NHWC)."""

    arch: str = "resnet34"
    in_channels: int = 3
    # smp make_dilated: 16 dilates layer4 (rate 2), 8 dilates layer3+4
    # (rates 2, 4); params are identical to the stride-32 encoder, so the
    # same checkpoints load (DeepLabV3+ requires 16 or 8)
    output_stride: int = 32
    # smp encoder_depth: depth-N encoders build only the first N-1 stages
    # (stem + layers) and their state dict LACKS the deeper layers (PSPNet
    # uses encoder_depth=3: stem + layer1 + layer2, deepest stride 8)
    depth: int = 5

    @property
    def out_channels(self) -> tuple[int, ...]:
        _, _, exp = _RESNET_SPECS[self.arch]
        full = (self.in_channels, 64, 64 * exp, 128 * exp, 256 * exp, 512 * exp)
        return full[: self.depth + 1]

    @nn.compact
    def __call__(self, x, train: bool = False) -> list[jax.Array]:
        block_cls, depths, exp = _RESNET_SPECS[self.arch]
        assert self.output_stride in (8, 16, 32), self.output_stride
        # per-layer (stride of first block, dilation of every block)
        layer_sd = {li: (1 if li == 0 else 2, 1) for li in range(4)}
        if self.output_stride <= 16:
            layer_sd[3] = (1, 2)
        if self.output_stride == 8:
            layer_sd[2] = (1, 2)
            layer_sd[3] = (1, 4)
        features = [x]
        out = TorchConv(64, 7, 2, 3, use_bias=False, name="conv1")(x)
        out = nn.relu(TorchBatchNorm(name="bn1")(out, use_running_average=not train))
        features.append(out)
        out = max_pool2d(out, 3, 2, 1)
        widths = (64, 128, 256, 512)[: self.depth - 1]
        for li, (w, d) in enumerate(zip(widths, depths)):
            stride, dil = layer_sd[li]
            for bi in range(d):
                in_ch = out.shape[-1]
                out_ch = w * exp
                use_ds = bi == 0 and (stride != 1 or in_ch != out_ch)
                out = block_cls(
                    features=w,
                    stride=stride if bi == 0 else 1,
                    use_downsample=use_ds,
                    dilation=dil,
                    name=f"layer{li + 1}.{bi}",
                )(out, train=train)
            features.append(out)
        return features
