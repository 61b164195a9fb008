"""U-TAE: U-net with Temporal Attention Encoder for satellite time series.

TPU-native reimplementation of the architecture the reference vendors from
VSainteuf/utae-paps (reference flair_hub/models/multitemp_model.py — behavioral
spec only; this file is written for NHWC/static shapes). Key design choices:

* Layout: sequences are (B, T, H, W, C); the pad mask (B, T) is derived from
  ``pad_value`` exactly like the reference (multitemp_model.py:133-135).
* TemporallySharedBlock.smart_forward: instead of gathering non-padded frames
  (dynamic shapes — a TPU anti-pattern), we run the conv on all B·T frames
  and overwrite padded frames with ``pad_value`` (multitemp_model.py:433-446
  semantics; identical results for the default GroupNorm encoder since its
  statistics are per-sample).
* LTAE2d: per-pixel temporal attention as dense batched matmuls over
  (B·H·W, heads, 1, T) — maps straight onto the MXU. Masked positions get
  the reference's -1e3 logit offset (multitemp_model.py:394).
* Temporal_Aggregator: attention masks are bilinearly resized (or
  average-pooled) to each skip resolution, zeroed at padded dates, applied
  per head group (multitemp_model.py:600-663). The mask multiply happens
  unconditionally — identical when no padding exists.

Param paths mirror the torch module names for checkpoint conversion
(``in_conv.conv.conv.0`` etc.; transposed convs live at ``up_blocks.{i}.up.0``).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from flair_for_aigle_tpu.models.layers import (
    TorchBatchNorm,
    TorchConv,
    TorchConvTranspose,
    TorchGroupNorm,
    TorchInstanceNorm,
    TorchLinear,
    avg_pool2d,
)
from flair_for_aigle_tpu.ops.resize import resize_bilinear_nhwc

UTAE_TRANSPOSE_CONV_PATTERNS = (".up.0",)


def temporal_pad_mask(x: jax.Array, pad_value: float) -> jax.Array:
    """(B, T, H, W, C) -> (B, T) True where the whole frame equals pad_value."""
    return jnp.all(x == pad_value, axis=(-3, -2, -1))


class ConvLayer(nn.Module):
    """Reference ConvLayer: [Conv(+Norm)(+ReLU)] x N, torch Sequential naming."""

    nkernels: Sequence[int]
    norm: str = "batch"
    k: int = 3
    s: int = 1
    p: int = 1
    n_groups: int = 4
    last_relu: bool = True
    padding_mode: str = "reflect"

    @nn.compact
    def __call__(self, x, train: bool = False):
        idx = 0
        n = len(self.nkernels) - 1
        for i in range(n):
            x = TorchConv(
                self.nkernels[i + 1], self.k, self.s, self.p,
                padding_mode=self.padding_mode, name=f"conv.{idx}",
            )(x)
            idx += 1
            if self.norm == "batch":
                x = TorchBatchNorm(name=f"conv.{idx}")(x, use_running_average=not train)
                idx += 1
            elif self.norm == "instance":
                x = TorchInstanceNorm(name=f"conv.{idx}")(x)
                idx += 1
            elif self.norm == "group":
                x = TorchGroupNorm(num_groups=self.n_groups, name=f"conv.{idx}")(x)
                idx += 1
            if self.last_relu or i < n - 1:
                x = nn.relu(x)
                idx += 1
        return x


def _smart_forward(module_fn, x, pad_value):
    """Apply a frame-wise conv block across (B, T, H, W, C) with pad passthrough."""
    if x.ndim == 4:
        return module_fn(x)
    b, t = x.shape[:2]
    flat = x.reshape((b * t,) + x.shape[2:])
    out = module_fn(flat)
    if pad_value is not None:
        pad_mask = jnp.all(flat == pad_value, axis=(-3, -2, -1))  # (B*T,)
        out = jnp.where(pad_mask[:, None, None, None], jnp.asarray(pad_value, out.dtype), out)
    return out.reshape((b, t) + out.shape[1:])


class ConvBlock(nn.Module):
    nkernels: Sequence[int]
    pad_value: float | None = None
    norm: str = "batch"
    last_relu: bool = True
    padding_mode: str = "reflect"

    @nn.compact
    def __call__(self, x, train: bool = False, smart: bool = False):
        layer = ConvLayer(
            nkernels=self.nkernels, norm=self.norm, last_relu=self.last_relu,
            padding_mode=self.padding_mode, name="conv",
        )
        fn = lambda y: layer(y, train=train)
        if smart:
            return _smart_forward(fn, x, self.pad_value)
        return fn(x)


class DownConvBlock(nn.Module):
    d_out: int
    k: int
    s: int
    p: int
    pad_value: float | None = None
    norm: str = "batch"
    padding_mode: str = "reflect"

    @nn.compact
    def __call__(self, x, train: bool = False):
        d_in = x.shape[-1]

        def fn(y):
            y = ConvLayer([d_in, d_in], norm=self.norm, k=self.k, s=self.s,
                          p=self.p, padding_mode=self.padding_mode, name="down")(y, train)
            y = ConvLayer([d_in, self.d_out], norm=self.norm,
                          padding_mode=self.padding_mode, name="conv1")(y, train)
            y = y + ConvLayer([self.d_out, self.d_out], norm=self.norm,
                              padding_mode=self.padding_mode, name="conv2")(y, train)
            return y

        return _smart_forward(fn, x, self.pad_value)


class UpConvBlock(nn.Module):
    d_out: int
    k: int
    s: int
    p: int
    d_skip: int | None = None
    norm: str = "batch"
    padding_mode: str = "reflect"

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        d = self.d_out if self.d_skip is None else self.d_skip
        sk = TorchConv(d, 1, 1, 0, name="skip_conv.0")(skip)
        sk = TorchBatchNorm(name="skip_conv.1")(sk, use_running_average=not train)
        sk = nn.relu(sk)
        up = TorchConvTranspose(self.d_out, self.k, self.s, self.p, name="up.0")(x)
        up = TorchBatchNorm(name="up.1")(up, use_running_average=not train)
        up = nn.relu(up)
        out = jnp.concatenate([up, sk], axis=-1)
        out = ConvLayer([self.d_out + d, self.d_out], norm=self.norm,
                        padding_mode=self.padding_mode, name="conv1")(out, train)
        out = out + ConvLayer([self.d_out, self.d_out], norm=self.norm,
                              padding_mode=self.padding_mode, name="conv2")(out, train)
        return out


def positional_encoding(positions: jax.Array, d: int, T: int = 1000,
                        repeat: int | None = None) -> jax.Array:
    """Reference PositionalEncoder (multitemp_model.py:292-318).

    positions: (..., T_seq) day offsets → (..., T_seq, d·repeat).
    """
    denom = T ** (2 * (np.arange(d) // 2) / d)
    table = positions[..., None] / jnp.asarray(denom, positions.dtype)
    sin = jnp.sin(table[..., 0::2])
    cos = jnp.cos(table[..., 1::2])
    out = jnp.zeros(table.shape, table.dtype)
    out = out.at[..., 0::2].set(sin)
    out = out.at[..., 1::2].set(cos)
    if repeat:
        out = jnp.concatenate([out] * repeat, axis=-1)
    return out


class LTAE2d(nn.Module):
    """Lightweight Temporal Attention Encoder, per-pixel over time."""

    in_channels: int = 128
    n_head: int = 16
    d_k: int = 4
    mlp: Sequence[int] = (256, 128)
    dropout: float = 0.2
    d_model: int = 256
    T: int = 1000
    positional: bool = True

    @nn.compact
    def __call__(self, x, batch_positions=None, pad_mask=None,
                 train: bool = False):
        # x: (B, T, H, W, C)
        b, t, h, w, c = x.shape
        nh, dk, dm = self.n_head, self.d_k, self.d_model
        seq = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, c)
        seq = TorchGroupNorm(num_groups=nh, name="in_norm")(seq)
        if dm is not None:
            seq = TorchLinear(dm, name="inconv")(seq)
        else:
            dm = c
        if self.positional and batch_positions is not None:
            bp = jnp.broadcast_to(
                batch_positions[:, None, None, :], (b, h, w, t)
            ).reshape(b * h * w, t)
            seq = seq + positional_encoding(bp, dm // nh, self.T, repeat=nh).astype(seq.dtype)

        # Multi-head attention with a learned query (attention_heads.*)
        q = self.param(
            "attention_heads.Q",
            nn.initializers.normal(np.sqrt(2.0 / dk)),
            (nh, dk),
        )
        k = TorchLinear(nh * dk, name="attention_heads.fc1_k")(seq)
        k = k.reshape(b * h * w, t, nh, dk)
        logits = jnp.einsum(
            "hd,nthd->nht", q.astype(jnp.float32), k.astype(jnp.float32)
        ) / np.sqrt(dk)
        if pad_mask is not None:
            pm = jnp.broadcast_to(pad_mask[:, None, None, :], (b, h, w, t))
            pm = pm.reshape(b * h * w, t)
            # reference masked_fill: logits at padded dates are SET to -1e3
            logits = jnp.where(pm[:, None, :], jnp.float32(-1e3), logits)
        attn = jax.nn.softmax(logits, axis=-1)  # (N, nh, T)
        attn = nn.Dropout(0.1, deterministic=not train, name="attn_drop")(attn)
        v = seq.reshape(b * h * w, t, nh, dm // nh)  # head-split channels
        out = jnp.einsum(
            "nht,nthd->nhd", attn.astype(jnp.float32), v.astype(jnp.float32)
        ).astype(x.dtype)  # (N, nh, dm/nh)
        out = out.reshape(b * h * w, dm)

        # MLP: Linear -> BatchNorm1d -> ReLU (torch Sequential names mlp.0/.1)
        out = TorchLinear(self.mlp[1], name="mlp.0")(out)
        out = TorchBatchNorm(name="mlp.1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = nn.Dropout(self.dropout, deterministic=not train, name="drop")(out)
        out = TorchGroupNorm(num_groups=nh, name="out_norm")(out)
        out = out.reshape(b, h, w, self.mlp[-1])

        attn_maps = attn.reshape(b, h, w, nh, t).transpose(3, 0, 4, 1, 2)
        return out, attn_maps  # (B,H,W,C'), (heads, B, T, h, w)


class TemporalAggregator(nn.Module):
    mode: str = "att_group"

    @nn.compact
    def __call__(self, x, pad_mask=None, attn_mask=None):
        # x: (B, T, H, W, C); attn_mask: (heads, B, T, h, w)
        b, t, h, w, c = x.shape
        if self.mode == "att_group":
            nh = attn_mask.shape[0]
            attn = attn_mask.reshape(nh * b, t, *attn_mask.shape[-2:])
            ah, aw = attn.shape[-2:]
            attn = attn.transpose(0, 2, 3, 1)  # (nh*b, h, w, T)
            if h > ah:
                attn = resize_bilinear_nhwc(attn, h, w)
            elif ah > h:
                attn = avg_pool2d(attn, ah // h)
            attn = attn.transpose(0, 3, 1, 2).reshape(nh, b, t, h, w)
            if pad_mask is not None:
                attn = attn * (~pad_mask).astype(attn.dtype)[None, :, :, None, None]
            # split channels into head groups: (B,T,H,W,nh,c/nh)
            xg = x.reshape(b, t, h, w, nh, c // nh)
            out = jnp.einsum(
                "nbthw,bthwnd->bhwnd",
                attn.astype(jnp.float32), xg.astype(jnp.float32),
            ).astype(x.dtype)
            return out.reshape(b, h, w, c)
        if self.mode == "att_mean":
            attn = attn_mask.mean(axis=0)  # (B, T, h, w)
            attn = attn.transpose(0, 2, 3, 1)
            attn = resize_bilinear_nhwc(attn, h, w)
            attn = attn.transpose(0, 3, 1, 2)  # (B, T, H, W)
            if pad_mask is not None:
                attn = attn * (~pad_mask).astype(attn.dtype)[:, :, None, None]
            return jnp.einsum(
                "bthw,bthwc->bhwc", attn.astype(jnp.float32),
                x.astype(jnp.float32),
            ).astype(x.dtype)
        if self.mode == "mean":
            if pad_mask is not None:
                keep = (~pad_mask).astype(jnp.float32)
                out = jnp.einsum("bt,bthwc->bhwc", keep, x.astype(jnp.float32))
                return (out / jnp.maximum(keep.sum(1), 1.0)[:, None, None, None]).astype(x.dtype)
            return x.mean(axis=1)
        raise ValueError(self.mode)


class UTAE(nn.Module):
    """U-TAE (reference multitemp_model.py:13-166), NHWC/static shapes."""

    input_dim: int
    encoder_widths: Sequence[int] = (64, 64, 64, 128)
    decoder_widths: Sequence[int] = (32, 32, 64, 128)
    out_conv: Sequence[int] = (32, 20)
    str_conv_k: int = 4
    str_conv_s: int = 2
    str_conv_p: int = 1
    agg_mode: str = "att_group"
    encoder_norm: str = "group"
    n_head: int = 16
    d_model: int = 256
    d_k: int = 4
    encoder: bool = False
    return_maps: bool = False
    pad_value: float = 0.0
    padding_mode: str = "reflect"

    @nn.compact
    def __call__(self, x, batch_positions=None, train: bool = False):
        # x: (B, T, H, W, C)
        ew, dw = list(self.encoder_widths), list(self.decoder_widths)
        n_stages = len(ew)
        return_maps = self.return_maps or self.encoder
        pad_mask = temporal_pad_mask(x, self.pad_value)  # (B, T)

        out = ConvBlock(
            nkernels=[self.input_dim, ew[0], ew[0]], pad_value=self.pad_value,
            norm=self.encoder_norm, padding_mode=self.padding_mode, name="in_conv",
        )(x, train=train, smart=True)
        feature_maps = [out]
        for i in range(n_stages - 1):
            out = DownConvBlock(
                d_out=ew[i + 1], k=self.str_conv_k, s=self.str_conv_s,
                p=self.str_conv_p, pad_value=self.pad_value,
                norm=self.encoder_norm, padding_mode=self.padding_mode,
                name=f"down_blocks.{i}",
            )(feature_maps[-1], train=train)
            feature_maps.append(out)

        out, att = LTAE2d(
            in_channels=ew[-1], d_model=self.d_model, n_head=self.n_head,
            mlp=(self.d_model, ew[-1]), d_k=self.d_k,
            name="temporal_encoder",
        )(feature_maps[-1], batch_positions=batch_positions,
          pad_mask=pad_mask, train=train)

        maps = [out] if return_maps else None
        aggregator = TemporalAggregator(mode=self.agg_mode, name="temporal_aggregator")
        for i in range(n_stages - 1):
            skip = aggregator(
                feature_maps[-(i + 2)], pad_mask=pad_mask, attn_mask=att
            )
            out = UpConvBlock(
                d_out=dw[-(i + 2)], d_skip=ew[-(i + 2)], k=self.str_conv_k,
                s=self.str_conv_s, p=self.str_conv_p, norm="batch",
                padding_mode=self.padding_mode, name=f"up_blocks.{i}",
            )(out, skip, train=train)
            if return_maps:
                maps.append(out)

        if self.encoder:
            return out, maps
        out = ConvBlock(
            nkernels=[dw[0]] + list(self.out_conv),
            padding_mode=self.padding_mode, name="out_conv",
        )(out, train=train, smart=False)
        if return_maps:
            return out, maps
        return out
