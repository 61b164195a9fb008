"""EfficientNet (MBConv) encoder family (timm layout), NHWC flax.

Widens the monotemp encoder surface to a third timm family, matching the
reference's open ``tu-<timm>`` fallback
(/root/reference/flair_hub/models/monotemp_model.py:67-92). Param tree
mirrors timm's ``gen_efficientnet`` state-dict names (``conv_stem``/``bn1``,
``blocks.{stage}.{j}`` with DS blocks ``conv_dw/bn1/se/conv_pw/bn2`` and IR
blocks ``conv_pw/bn1/conv_dw/bn2/se/conv_pwl/bn3``, SE as
``se.conv_reduce``/``se.conv_expand``) so published timm checkpoints
convert mechanically through models/checkpoint.py.

Variant math reproduces timm: channels scale with the width multiplier via
``make_divisible`` (divisor 8, 0.9 round limit), per-stage repeats with
``ceil(r * depth_mult)``, and SE reduce channels are
``round(block_input_channels * 0.25)`` (timm divides the parsed se_ratio by
the expansion ratio, so the reduction is relative to the UNexpanded input).
Native (non-``tf_``) variants only: symmetric k//2 padding, BN eps 1e-5.

Returned features mimic smp's TimmUniversalEncoder: 6 entries
``[input, s2, s4, s8, s16, s32]`` tapped after the last stage at each
reduction — EfficientNet has a real stride-2 feature (unlike swin/convnext
whose slot is a zero-channel dummy), so UnetDecoder consumes all five.

TPU notes: depthwise 3x3/5x5 convs are VPU work and the 1x1 expand/project
convs are MXU matmuls; XLA fuses BN + SiLU + SE scaling into the
surrounding convs. Arithmetic intensity is too low for a custom kernel to
beat the fused XLA lowering, so this family stays kernel-free.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from flair_for_aigle_tpu.models.layers import TorchBatchNorm, TorchConv

# base (b0) stage specs: (kernel, stride, expansion, channels, repeats)
_BASE_STAGES = (
    (3, 1, 1, 16, 1),
    (3, 2, 6, 24, 2),
    (5, 2, 6, 40, 2),
    (3, 2, 6, 80, 3),
    (5, 1, 6, 112, 3),
    (5, 2, 6, 192, 4),
    (3, 1, 6, 320, 1),
)
_BASE_STEM = 32

# variant -> (width_mult, depth_mult); timm efficientnet_b{0..7}
_VARIANTS = {
    "b0": (1.0, 1.0), "b1": (1.0, 1.1), "b2": (1.1, 1.2), "b3": (1.2, 1.4),
    "b4": (1.4, 1.8), "b5": (1.6, 2.2), "b6": (1.8, 2.6), "b7": (2.0, 3.1),
}

# 'micro' is NOT a timm release: a test-scale spec (one block per stage,
# narrow channels) so CPU parity tests run at tractable cost, mirroring
# swin/convnext 'micro'.
_MICRO_STEM = 8
_MICRO_STAGES = (
    (3, 1, 1, 8, 1),
    (3, 2, 6, 16, 1),
    (5, 2, 6, 24, 1),
    (3, 2, 6, 32, 1),
    (5, 1, 6, 40, 2),  # repeats>1 exercises the in==out residual path
    (5, 2, 6, 48, 1),
    (3, 1, 6, 64, 1),
)


def _make_divisible(v: float, divisor: int = 8,
                    round_limit: float = 0.9) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < round_limit * v:
        new_v += divisor
    return new_v


def _round_channels(c: int, mult: float) -> int:
    if mult == 1.0:
        return c
    return _make_divisible(c * mult)


def efficientnet_spec(variant: str):
    """(stem_channels, stage specs) for a variant tag, else None."""
    if variant == "micro":
        return _MICRO_STEM, _MICRO_STAGES
    if variant not in _VARIANTS:
        return None
    w, d = _VARIANTS[variant]
    stages = tuple(
        (k, s, e, _round_channels(c, w), int(math.ceil(r * d)))
        for (k, s, e, c, r) in _BASE_STAGES
    )
    return _round_channels(_BASE_STEM, w), stages


class SqueezeExcite(nn.Module):
    """timm SqueezeExcite: mean-pool -> conv_reduce -> SiLU -> conv_expand
    -> sigmoid gate. ``rd`` is precomputed by the block from its input
    channels (timm folds the expansion ratio out of se_ratio)."""

    rd: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2),
                     keepdims=True).astype(x.dtype)
        s = TorchConv(self.rd, 1, 1, 0, name="conv_reduce")(s)
        s = nn.silu(s)
        s = TorchConv(x.shape[-1], 1, 1, 0, name="conv_expand")(s)
        return x * jax.nn.sigmoid(s)


class DsBlock(nn.Module):
    """timm DepthwiseSeparableConv (stage 0, expansion 1):
    conv_dw -> bn1 -> SiLU -> SE -> conv_pw -> bn2 (no activation),
    residual when stride 1 and channels match."""

    out_ch: int
    kernel: int
    stride: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        y = TorchConv(in_ch, self.kernel, self.stride, self.kernel // 2,
                      groups=in_ch, use_bias=False, name="conv_dw")(x)
        y = nn.silu(TorchBatchNorm(name="bn1")(y, use_running_average=not train))
        y = SqueezeExcite(rd=max(1, round(in_ch * 0.25)), name="se")(y)
        y = TorchConv(self.out_ch, 1, 1, 0, use_bias=False, name="conv_pw")(y)
        y = TorchBatchNorm(name="bn2")(y, use_running_average=not train)
        if self.stride == 1 and in_ch == self.out_ch:
            y = y + x
        return y


class IrBlock(nn.Module):
    """timm InvertedResidual (MBConv): conv_pw (expand) -> bn1 -> SiLU ->
    conv_dw -> bn2 -> SiLU -> SE -> conv_pwl (project) -> bn3,
    residual when stride 1 and channels match."""

    out_ch: int
    kernel: int
    stride: int
    expand: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        y = TorchConv(mid, 1, 1, 0, use_bias=False, name="conv_pw")(x)
        y = nn.silu(TorchBatchNorm(name="bn1")(y, use_running_average=not train))
        y = TorchConv(mid, self.kernel, self.stride, self.kernel // 2,
                      groups=mid, use_bias=False, name="conv_dw")(y)
        y = nn.silu(TorchBatchNorm(name="bn2")(y, use_running_average=not train))
        y = SqueezeExcite(rd=max(1, round(in_ch * 0.25)), name="se")(y)
        y = TorchConv(self.out_ch, 1, 1, 0, use_bias=False, name="conv_pwl")(y)
        y = TorchBatchNorm(name="bn3")(y, use_running_average=not train)
        if self.stride == 1 and in_ch == self.out_ch:
            y = y + x
        return y


class EfficientNetEncoder(nn.Module):
    """timm-layout EfficientNet; smp-TimmUniversalEncoder 6-feature output."""

    in_channels: int = 3
    stem_channels: int = _BASE_STEM
    stages: Sequence[tuple[int, int, int, int, int]] = _BASE_STAGES
    remat: bool = False

    @property
    def out_channels(self) -> tuple[int, ...]:
        taps = _tap_indices(self.stages)
        return (self.in_channels,
                *(self.stages[i][3] for i in taps))

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        feats: list[jax.Array] = [x]
        y = TorchConv(self.stem_channels, 3, 2, 1, use_bias=False,
                      name="conv_stem")(x)
        y = nn.silu(TorchBatchNorm(name="bn1")(y, use_running_average=not train))
        taps = set(_tap_indices(self.stages))
        ds_cls = nn.checkpoint(DsBlock) if self.remat else DsBlock
        ir_cls = nn.checkpoint(IrBlock) if self.remat else IrBlock
        for i, (k, s, e, c, r) in enumerate(self.stages):
            for j in range(r):
                stride = s if j == 0 else 1
                if e == 1:
                    y = ds_cls(out_ch=c, kernel=k, stride=stride,
                               name=f"blocks.{i}.{j}")(y, train=train)
                else:
                    y = ir_cls(out_ch=c, kernel=k, stride=stride, expand=e,
                               name=f"blocks.{i}.{j}")(y, train=train)
            if i in taps:
                feats.append(y)
        return feats


def _tap_indices(stages) -> tuple[int, ...]:
    """Stage indices whose outputs are the s2/s4/s8/s16/s32 features: the
    LAST stage at each cumulative reduction (timm feature_info hooks)."""
    taps = {}
    red = 2  # stem stride
    for i, (_k, s, _e, _c, _r) in enumerate(stages):
        red *= s
        taps[red] = i
    return tuple(taps[r] for r in sorted(taps))
