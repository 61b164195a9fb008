"""PyTorch-compatible neural-net layers in flax, NHWC layout.

The FLAIR-HUB published checkpoints are torch state dicts; to load them we
need layers that are *numerically* equivalent to their torch counterparts
(same padding rules, same eps, same normalization statistics). All feature
maps here are NHWC — the natural layout for the TPU vector units — and the
checkpoint converter (models/checkpoint.py) handles OIHW→HWIO transposition.

Conventions:
* ``TorchConv`` kernel param is HWIO (kH, kW, C_in/groups, C_out).
* ``TorchConvTranspose`` kernel param is HWIO *already spatially flipped*,
  i.e. what `lax.conv_general_dilated` with lhs_dilation consumes directly;
  the converter performs the flip when importing torch (I, O, kH, kW) weights.
* Norm layers use torch defaults: eps=1e-5, BatchNorm momentum=0.1 with
  unbiased running variance.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax


def _pair(v) -> tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def torch_kaiming_uniform(a: float = math.sqrt(5.0)):
    """torch's default Conv/Linear weight init (kaiming_uniform, a=sqrt(5))."""

    def init(key, shape, dtype=jnp.float32):
        # HWIO: fan_in = kH * kW * C_in
        if len(shape) == 4:
            fan_in = shape[0] * shape[1] * shape[2]
        elif len(shape) == 2:
            fan_in = shape[0]
        else:
            fan_in = int(jnp.prod(jnp.asarray(shape[:-1])))
        if fan_in == 0 or 0 in shape:
            # degenerate zero-channel param (e.g. unet++ inner blocks fed
            # only a transformer encoder's zero-channel dummy): the tensor
            # is empty, any bound works
            return jnp.zeros(shape, dtype)
        gain = math.sqrt(2.0 / (1.0 + a * a))
        bound = gain * math.sqrt(3.0 / fan_in)
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_fanin_bias_uniform(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def xavier_uniform():
    return nn.initializers.xavier_uniform()


class TorchConv(nn.Module):
    """2-D convolution with torch Conv2d semantics on NHWC tensors."""

    features: int
    kernel_size: Any = 3
    stride: Any = 1
    padding: Any = 0
    dilation: Any = 1
    groups: int = 1
    use_bias: bool = True
    padding_mode: str = "zeros"  # 'zeros' | 'reflect'
    dtype: Any = None

    @nn.compact
    def __call__(self, x) -> jax.Array:
        # A list/tuple input means "conv over the channel-concatenation of
        # these maps" computed as a sum of per-piece convs with the kernel
        # sliced along C_in — identical params and math (conv is linear in
        # channels) without materializing the concat. Used by the UPerNet
        # bottleneck where the concat is ~1.3 GB/batch of HBM traffic.
        if isinstance(x, (list, tuple)):
            return self._split_call(x)
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        dh, dw = _pair(self.dilation)
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            torch_kaiming_uniform(),
            (kh, kw, in_ch // self.groups, self.features),
        )
        if self.padding_mode == "reflect" and (ph or pw):
            x = jnp.pad(
                x,
                [(0, 0)] * (x.ndim - 3) + [(ph, ph), (pw, pw), (0, 0)],
                mode="reflect",
            )
            pad = ((0, 0), (0, 0))
        else:
            pad = ((ph, ph), (pw, pw))
        dtype = self.dtype or x.dtype
        # Non-overlapping patch conv (stride == kernel, no pad/dilation) on a
        # few-channel input — the swin/ViT patch-embed shape — lowers ~7x
        # faster as space-to-depth + one matmul: XLA's conv path on TPU is
        # pathological at C_in=3 (measured 3.41 vs 0.46 ms at swin-base
        # 512px batch 16, tools/exp_gelu_patchembed.py 2026-08-18). Exact
        # im2col: identical contraction, f32-accumulated on the MXU either
        # way. Param tree unchanged (kernel stays HWIO).
        if ((kh, kw) == (sh, sw) and (ph, pw) == (0, 0)
                and (dh, dw) == (1, 1) and self.groups == 1 and in_ch < 64
                and x.ndim == 4
                and x.shape[-3] % kh == 0 and x.shape[-2] % kw == 0):
            b, h, w = x.shape[0], x.shape[-3] // kh, x.shape[-2] // kw
            y = x.astype(dtype).reshape(b, h, kh, w, kw, in_ch)
            y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
                b, h, w, kh * kw * in_ch)
            y = jnp.dot(y, kernel.astype(dtype).reshape(kh * kw * in_ch,
                                                        self.features))
        else:
            y = None
        # no preferred_element_type: the TPU MXU accumulates bf16 convs in
        # f32 regardless, and a f32 preferred output breaks the conv VJP
        # dtype contract under bf16 autodiff
        if y is None:
            y = lax.conv_general_dilated(
                x.astype(dtype),
                kernel.astype(dtype),
                window_strides=(sh, sw),
                padding=pad,
                rhs_dilation=(dh, dw),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
            )
        if self.use_bias:
            bias = self.param(
                "bias",
                torch_fanin_bias_uniform(in_ch // self.groups * kh * kw),
                (self.features,),
            )
            y = y + bias.astype(y.dtype)
        return y.astype(dtype)

    def _split_call(self, xs) -> jax.Array:
        assert self.groups == 1, "split-input conv requires groups=1"
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        dh, dw = _pair(self.dilation)
        in_ch = sum(x.shape[-1] for x in xs)
        kernel = self.param(
            "kernel", torch_kaiming_uniform(), (kh, kw, in_ch, self.features)
        )
        dtype = self.dtype or xs[0].dtype
        y = None
        off = 0
        for x in xs:
            cs = x.shape[-1]
            piece = lax.conv_general_dilated(
                x.astype(dtype),
                kernel[:, :, off:off + cs, :].astype(dtype),
                window_strides=(sh, sw),
                padding=((ph, ph), (pw, pw)),
                rhs_dilation=(dh, dw),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = piece if y is None else y + piece
            off += cs
        if self.use_bias:
            bias = self.param(
                "bias", torch_fanin_bias_uniform(in_ch * kh * kw),
                (self.features,),
            )
            y = y + bias.astype(y.dtype)
        return y.astype(dtype)


class TorchConvTranspose(nn.Module):
    """2-D transposed convolution, torch ConvTranspose2d semantics (NHWC).

    Output size: (in-1)*stride - 2*padding + kernel (+ output_padding).
    Kernel stored pre-flipped in HWIO so the forward is a single dilated conv.
    """

    features: int
    kernel_size: Any = 4
    stride: Any = 2
    padding: Any = 1
    output_padding: int = 0
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", torch_kaiming_uniform(), (kh, kw, in_ch, self.features)
        )
        dtype = self.dtype or x.dtype
        op = self.output_padding
        y = lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(1, 1),
            padding=((kh - 1 - ph, kh - 1 - ph + op), (kw - 1 - pw, kw - 1 - pw + op)),
            lhs_dilation=(sh, sw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", torch_fanin_bias_uniform(in_ch * kh * kw), (self.features,)
            )
            y = y + bias.astype(y.dtype)
        return y.astype(dtype)


class TorchBatchNorm(nn.Module):
    """BatchNorm over the last axis (channels), torch semantics.

    Works for NHWC feature maps and (N, C) / (N, L, C) sequences: statistics
    are computed over every axis except the last. Running stats live in the
    ``batch_stats`` collection; updates use torch's momentum convention
    ``running = (1-m)*running + m*batch`` with *unbiased* batch variance.
    """

    momentum: float = 0.1
    eps: float = 1e-5
    use_running_average: bool | None = None

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool | None = None) -> jax.Array:
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        ch = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (ch,))
        bias = self.param("bias", nn.initializers.zeros, (ch,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((ch,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((ch,), jnp.float32)
        )

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            var = jnp.var(xf, axis=axes)
            n = x.size // ch
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        inv = lax.rsqrt(var + self.eps) * scale
        return ((x.astype(jnp.float32) - mean) * inv + bias).astype(x.dtype)


class TorchGroupNorm(nn.Module):
    """GroupNorm matching torch: per-sample stats over (C/G, *spatial).

    Channels are the last axis; all axes except 0 (batch) participate in the
    per-group statistics, matching ``nn.GroupNorm`` on (N, C, ...) tensors.
    """

    num_groups: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ch = x.shape[-1]
        g = self.num_groups
        assert ch % g == 0, f"channels {ch} not divisible by groups {g}"
        scale = self.param("scale", nn.initializers.ones, (ch,))
        bias = self.param("bias", nn.initializers.zeros, (ch,))
        xf = x.astype(jnp.float32)
        shp = x.shape
        # (N, *spatial, G, C/G); stats over spatial + C/G per (N, G)
        xg = xf.reshape(shp[0], -1, g, ch // g)
        mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
        var = jnp.var(xg, axis=(1, 3), keepdims=True)
        xg = (xg - mean) * lax.rsqrt(var + self.eps)
        out = xg.reshape(shp) * scale + bias
        return out.astype(x.dtype)


class TorchLayerNorm(nn.Module):
    """LayerNorm over the last axis, torch eps default 1e-5."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ch = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (ch,))
        bias = self.param("bias", nn.initializers.zeros, (ch,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        out = (xf - mean) * lax.rsqrt(var + self.eps) * scale + bias
        return out.astype(x.dtype)


class LayerNormParams(nn.Module):
    """Param-shadow of TorchLayerNorm: declares the identical (scale, bias)
    tree (same names, shapes, initializers -> same init values) and returns
    the raw params for fused kernels instead of computing."""

    @nn.compact
    def __call__(self, ch: int):
        scale = self.param("scale", nn.initializers.ones, (ch,))
        bias = self.param("bias", nn.initializers.zeros, (ch,))
        return scale, bias


class LinearParams(nn.Module):
    """Param-shadow of TorchLinear (same tree, raw params out)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_f: int):
        kernel = self.param("kernel", torch_kaiming_uniform(),
                            (in_f, self.features))
        bias = (self.param("bias", torch_fanin_bias_uniform(in_f),
                           (self.features,)) if self.use_bias else None)
        return kernel, bias


class TorchLinear(nn.Module):
    """Linear layer; kernel stored (in, out) = torch weight transposed."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_f = x.shape[-1]
        kernel = self.param("kernel", torch_kaiming_uniform(), (in_f, self.features))
        # cast the kernel to the activation dtype (mirrors TorchConv): under
        # compute_dtype=bfloat16 a f32 kernel would silently promote the
        # whole matmul to f32 — 4x slower on the MXU and an extra f32
        # materialization of the activations. No-op for f32 activations.
        y = jnp.dot(x, kernel.astype(x.dtype)).astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", torch_fanin_bias_uniform(in_f), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class TorchInstanceNorm(nn.Module):
    """InstanceNorm2d (no affine by torch default) on NHWC."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(-3, -2), keepdims=True)
        var = jnp.var(xf, axis=(-3, -2), keepdims=True)
        return ((xf - mean) * lax.rsqrt(var + self.eps)).astype(x.dtype)


def max_pool2d(
    x: jax.Array, kernel_size=3, stride=2, padding=1
) -> jax.Array:
    """torch MaxPool2d on NHWC (pads with -inf)."""
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    # literal init value keeps the reduce-window max pattern differentiable
    neg = -float("inf") if jnp.issubdtype(x.dtype, jnp.floating) else int(
        jnp.iinfo(x.dtype).min
    )
    return lax.reduce_window(
        x,
        neg,
        lax.max,
        window_dimensions=(1,) * (x.ndim - 3) + (kh, kw, 1),
        window_strides=(1,) * (x.ndim - 3) + (sh, sw, 1),
        padding=[(0, 0)] * (x.ndim - 3) + [(ph, ph), (pw, pw), (0, 0)],
    )


def avg_pool2d(x: jax.Array, kernel_size, stride=None) -> jax.Array:
    """torch AvgPool2d (no padding) on NHWC."""
    kh, kw = _pair(kernel_size)
    if stride is None:
        sh, sw = kh, kw
    else:
        sh, sw = _pair(stride)
    summed = lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        lax.add,
        window_dimensions=(1,) * (x.ndim - 3) + (kh, kw, 1),
        window_strides=(1,) * (x.ndim - 3) + (sh, sw, 1),
        padding="VALID",
    )
    return (summed / (kh * kw)).astype(x.dtype)


class MLP(nn.Module):
    """Transformer MLP block (Linear-GELU-Linear), torch/timm layout."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = TorchLinear(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = TorchLinear(self.out, name="fc2")(x)
        return x


class MLPParams(nn.Module):
    """Param-shadow of MLP (fc1/fc2 trees, raw params out)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, in_f: int):
        p1 = LinearParams(self.hidden, name="fc1")(in_f)
        p2 = LinearParams(self.out, name="fc2")(self.hidden)
        return p1, p2
