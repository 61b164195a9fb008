"""Swin Transformer v1 encoder (timm 1.x layout), NHWC flax.

Backbone of the reference's flagship arch
``swin_base_patch4_window12_384-upernet`` (reference
configs/train/config_models.yaml:5, loaded through smp's
TimmUniversalEncoder — monotemp_model.py:76-92). Param tree mirrors timm
1.x state-dict names (``layers.{i}.blocks.{j}.attn.qkv`` etc., downsample at
stage entry on layers 1-3) so published FLAIR-HUB .safetensors convert
mechanically; the checkpoint converter also remaps the older
downsample-at-stage-exit naming when detected.

Returned features mimic smp's TimmUniversalEncoder with a transformer
backbone: 6 entries ``[input, zero-channel dummy, s4, s8, s16, s32]`` with
out_channels ``(C_in, 0, 128, 256, 512, 1024)`` for swin_base — the
reference's fusion logic keys off those zero-channel dummies
(flair_model.py:206,303,517).

Window attention has two lowerings with identical parameters: a fused
Pallas kernel (qkv projection + per-head attention + output projection,
weights VMEM-resident — TPU default, ops/pallas/window_attn.py; training
differentiates it through a custom VJP with XLA-recompute backward) and
dense batched XLA matmuls (CPU, and multi-device GSPMD-jit steps — the
zonal engine instead shard_maps its step so kernels survive DP meshes).
Shift masks are trace-time numpy constants.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from flair_for_aigle_tpu.models.layers import (
    MLP,
    TorchConv,
    TorchLayerNorm,
    TorchLinear,
)


@lru_cache(maxsize=None)
def _relative_position_index(wh: int, ww: int, table_w: int) -> np.ndarray:
    """Index into a bias table built for ``table_w`` using an actual window
    (wh, ww) ≤ table_w — lets small inputs reuse the pretrained table."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += table_w - 1
    rel[:, :, 1] += table_w - 1
    rel[:, :, 0] *= 2 * table_w - 1
    return rel.sum(-1)  # (wh*ww, wh*ww)


@lru_cache(maxsize=None)
def _shift_attn_mask(h: int, w: int, ws: int, ss: int) -> np.ndarray | None:
    """Attention mask for shifted windows; None when no shift."""
    if ss == 0:
        return None
    img_mask = np.zeros((h, w))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
        for wsl in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
            img_mask[hs, wsl] = cnt
            cnt += 1
    mw = img_mask.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    mw = mw.reshape(-1, ws * ws)
    attn_mask = mw[:, None, :] - mw[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)  # (nW, T, T)


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) -> (B*nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, ws * ws, c)


def window_reverse(x: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    """(B*nW, ws*ws, C) -> (B, H, W, C)."""
    c = x.shape[-1]
    x = x.reshape(-1, h // ws, w // ws, ws, ws, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, h, w, c)


def _use_attn_kernel(kernel_mode: str) -> bool:
    if kernel_mode == "off":
        return False
    if kernel_mode == "on":
        return True
    return jax.devices()[0].platform == "tpu"


class WindowAttention(nn.Module):
    """Windowed MHA over the padded (pre-rolled) feature raster.

    Two lowerings with identical parameters and matching numerics:

    * XLA path: window partition -> batched einsums -> reverse. Score and
      softmax dtype is float32 (torch parity) unless ``attn_f32=False``
      (opt-in speed knob like compute_dtype: scores in the compute dtype).
    * Pallas kernel path (``kernel_mode`` 'auto'|'on'|'off'; auto = on TPU;
      differentiable via custom VJP): one fused VMEM pass per window.
      Scores/softmax follow ``attn_f32`` exactly like the XLA path (f32 by
      default; the compute dtype under the opt-in knob) — faster than
      either XLA variant either way, since the XLA lowering materializes
      every (B*nW, nh, T, T) score tensor in HBM
      (ops/pallas/window_attn.py).
    """

    dim: int
    num_heads: int
    table_window: int  # window size the bias table was built for
    window_size: tuple[int, int]  # actual (clamped) window
    shift_size: int = 0
    attn_f32: bool = True  # False: scores/softmax in the input dtype
    kernel_mode: str = "auto"

    @nn.compact
    def __call__(self, y: jax.Array, train: bool = False, *,
                 windows: bool = False,
                 padded_hw: tuple[int, int] | None = None,
                 return_windows: bool = False) -> jax.Array:
        if windows:
            # pre-partitioned (B*nW, T, C) input from the fused prep kernel
            # (ops/pallas/prep.py) — kernel path only
            _, _, c = y.shape
            hp, wp = padded_hw
        else:
            b, hp, wp, c = y.shape
        nh = self.num_heads
        hd = c // nh
        wh, ww = self.window_size
        ws = wh
        t = wh * ww
        tw = self.table_window
        ss = self.shift_size
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * tw - 1) * (2 * tw - 1), nh),
        )
        idx = _relative_position_index(wh, ww, tw).reshape(-1)

        from flair_for_aigle_tpu.ops.pallas import window_attn as wak

        # the fused kernel is differentiable (custom VJP with XLA-recompute
        # backward), so it serves training forwards too
        if (wh == ww and wak.supports(c, nh, ws)
                and _use_attn_kernel(self.kernel_mode)):
            from flair_for_aigle_tpu.models.layers import LinearParams

            x = y if windows else window_partition(y, ws)
            wqkv, bqkv = LinearParams(3 * c, name="qkv")(c)
            wproj, bproj = LinearParams(c, name="proj")(c)
            bias = jnp.transpose(
                table[jnp.asarray(idx)].reshape(t, t, nh), (2, 0, 1)
            ).astype(jnp.float32)
            out = wak.fused_window_attention(
                x, wqkv, bqkv, wproj, bproj, bias,
                num_heads=nh, window_size=ws, shift_size=ss,
                grid_hw=(hp // ws, wp // ws), out_dtype=y.dtype,
                attn_f32=self.attn_f32,
            )
            if return_windows:
                return out
            return window_reverse(out, ws, hp, wp)

        if windows or return_windows:
            raise ValueError(
                "windows/return_windows require the fused attention "
                "kernel path"
            )
        x = window_partition(y, ws)
        bnw = x.shape[0]
        mask = _shift_attn_mask(hp, wp, ws, ss)
        acc_t = jnp.float32 if self.attn_f32 else x.dtype
        qkv = TorchLinear(3 * c, name="qkv")(x)
        qkv = qkv.reshape(bnw, t, 3, nh, hd)
        q, k, v = (
            jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3)
        )  # (bnw, nh, t, hd)
        q = q * (hd ** -0.5)
        attn = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=acc_t)
        bias = table[jnp.asarray(idx)].reshape(t, t, nh)
        attn = attn + jnp.transpose(bias, (2, 0, 1))[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(-1, nw, nh, t, t) + jnp.asarray(mask, acc_t)[None, :, None]
            attn = attn.reshape(bnw, nh, t, t)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", attn, v, preferred_element_type=acc_t)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(bnw, t, c).astype(x.dtype)
        out = window_reverse(out, ws, hp, wp)
        return TorchLinear(c, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: bool
    mlp_ratio: float = 4.0
    attn_f32: bool = True
    kernel_mode: str = "auto"
    # carried as a field (not a call arg) so nn.checkpoint(SwinBlock) never
    # sees a traced python bool
    is_training: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        train = self.is_training
        b, h, w, c = x.shape
        # timm _calc_window_shift: window clamps to the feature size, and the
        # shift disables when the feature fits in one window.
        ws = min(self.window_size, h, w)
        ss = ws // 2 if (self.shift and min(h, w) > ws) else 0

        shortcut = x
        pad_h = (ws - h % ws) % ws
        pad_w = (ws - w % ws) % ws

        from flair_for_aigle_tpu.ops.pallas import prep as prepk
        from flair_for_aigle_tpu.ops.pallas import window_attn as wak

        import os as _os

        # Fused prologue kernel: default ON since Mosaic validation on real
        # v5e (2026-08-18, tools/validate_fused_block.py — bf16 parity green
        # on all 4 swin-base@512 stage geometries, full step 67.8 -> 61.3 ms
        # with prep+finish+merge). FLAIR_SWIN_PREP=0 opts out.
        if (_use_attn_kernel(self.kernel_mode)
                and _os.getenv("FLAIR_SWIN_PREP", "1") != "0"
                and wak.supports(c, self.num_heads, ws)
                and prepk.supports(h, w, c, ws,
                                   jnp.dtype(x.dtype).itemsize)):
            # fused prologue: LN1 + roll + pad + window partition in one
            # VMEM pass (the XLA glue was ~6 HBM passes per block); the
            # param-shadow keeps the norm1 tree identical to the XLA path
            from flair_for_aigle_tpu.models.layers import LayerNormParams

            ln_s, ln_b = LayerNormParams(name="norm1")(c)
            win = prepk.fused_ln_shift_partition(x, ln_s, ln_b, ws=ws, ss=ss)
            hidden_f = int(self.dim * self.mlp_ratio)

            from flair_for_aigle_tpu.ops.pallas import finish as fink

            # Fused finish (reverse+LN2+MLP+residual) is parity-green on
            # real v5e at all four swin-base@512 stage geometries but LOSES
            # to XLA-reverse + the ffn kernel (stage-3 18blk 28.8 vs
            # 26.0 ms; full step 274 vs 284.8 tiles/s, 2026-08-18): its
            # per-row dynamic window gathers are VPU-bound. Default OFF;
            # FLAIR_SWIN_FINISH=1 opts in.
            if (_os.getenv("FLAIR_SWIN_FINISH", "0") == "1"
                    and fink.supports(h, w, c, hidden_f, ws,
                                      jnp.dtype(x.dtype).itemsize)):
                # fully fused block: prep -> attention -> finish, zero XLA
                # glue between the three kernels
                from flair_for_aigle_tpu.models.layers import MLPParams

                win_o = WindowAttention(
                    self.dim, self.num_heads, self.window_size, (ws, ws),
                    shift_size=ss, attn_f32=self.attn_f32,
                    kernel_mode=self.kernel_mode, name="attn",
                )(win, train=train, windows=True,
                  padded_hw=(h + pad_h, w + pad_w), return_windows=True)
                ln_s2, ln_b2 = LayerNormParams(name="norm2")(c)
                (w1, b1), (w2, b2) = MLPParams(hidden_f, self.dim,
                                               name="mlp")(c)
                return fink.fused_reverse_ln_mlp_residual(
                    win_o, shortcut, ln_s2, ln_b2, w1, b1, w2, b2,
                    ws=ws, ss=ss,
                )

            y = WindowAttention(
                self.dim, self.num_heads, self.window_size, (ws, ws),
                shift_size=ss, attn_f32=self.attn_f32,
                kernel_mode=self.kernel_mode, name="attn",
            )(win, train=train, windows=True,
              padded_hw=(h + pad_h, w + pad_w))
        else:
            y = TorchLayerNorm(name="norm1")(x)
            if ss:
                y = jnp.roll(y, (-ss, -ss), axis=(1, 2))
            # timm: pad bottom/right to window multiples after the roll
            if pad_h or pad_w:
                y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            y = WindowAttention(
                self.dim, self.num_heads, self.window_size, (ws, ws),
                shift_size=ss, attn_f32=self.attn_f32,
                kernel_mode=self.kernel_mode, name="attn",
            )(y, train=train)
        if pad_h or pad_w:
            y = y[:, :h, :w, :]
        if ss:
            y = jnp.roll(y, (ss, ss), axis=(1, 2))

        hidden = int(self.dim * self.mlp_ratio)
        from flair_for_aigle_tpu.models.layers import LayerNormParams, MLPParams
        from flair_for_aigle_tpu.ops.pallas import ffn as ffnk

        if (_use_attn_kernel(self.kernel_mode)
                and ffnk.supports(b * h * w, c, hidden,
                                  jnp.dtype(x.dtype).itemsize)):
            # fused residual+LN+MLP+residual tail (param-shadow modules keep
            # the norm2/mlp tree identical to the XLA path)
            ln_s, ln_b = LayerNormParams(name="norm2")(c)
            (w1, b1), (w2, b2) = MLPParams(hidden, self.dim, name="mlp")(c)
            return ffnk.fused_ln_mlp_residual(
                shortcut, y, ln_s, ln_b, w1, b1, w2, b2
            )

        x = shortcut + y
        y = TorchLayerNorm(name="norm2")(x)
        x = x + MLP(hidden, self.dim, name="mlp")(y)
        return x


class PatchMerging(nn.Module):
    out_dim: int
    kernel_mode: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
            b, h, w, c = x.shape

        import os as _os

        from flair_for_aigle_tpu.ops.pallas import merge as mergek

        # Fused gather+LN+reduction kernel: default ON since Mosaic
        # validation on real v5e (2026-08-18, tools/validate_fused_block.py).
        # FLAIR_SWIN_MERGE=0 opts out.
        if (_use_attn_kernel(self.kernel_mode)
                and _os.getenv("FLAIR_SWIN_MERGE", "1") != "0"
                and mergek.supports(h, w, c, self.out_dim,
                                    jnp.dtype(x.dtype).itemsize)):
            from flair_for_aigle_tpu.models.layers import (
                LayerNormParams,
                LinearParams,
            )

            ln_s, ln_b = LayerNormParams(name="norm")(4 * c)
            w_red, _ = LinearParams(self.out_dim, use_bias=False,
                                    name="reduction")(4 * c)
            return mergek.fused_patch_merge(x, ln_s, ln_b, w_red)

        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        # timm order: flatten over (w_sub, h_sub) -> [x00, x10, x01, x11]
        x = jnp.transpose(x, (0, 1, 3, 4, 2, 5)).reshape(b, h // 2, w // 2, 4 * c)
        x = TorchLayerNorm(name="norm")(x)
        return TorchLinear(self.out_dim, use_bias=False, name="reduction")(x)


class SwinTransformerEncoder(nn.Module):
    """timm-1.x Swin; smp-TimmUniversalEncoder-style 6-feature output.

    ``remat=True`` wraps each block in ``jax.checkpoint`` — trades ~30%
    extra forward FLOPs for activation memory, enabling larger training
    batches per chip (HBM is the usual bound at 512px inputs).
    """

    in_channels: int = 3
    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    window_size: int = 12
    patch_size: int = 4
    remat: bool = False
    attn_f32: bool = True
    attn_kernel: str = "auto"  # fused Pallas window attention: auto|on|off

    @property
    def out_channels(self) -> tuple[int, ...]:
        dims = [self.embed_dim * (2 ** i) for i in range(len(self.depths))]
        return (self.in_channels, 0, *dims)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        b, h, w, _ = x.shape
        feats: list[jax.Array] = [x]
        # zero-channel dummy at stride 2 (smp TimmUniversalEncoder convention
        # for backbones with no stride-2 feature; reference flair_model.py:303)
        feats.append(jnp.zeros((b, h // 2, w // 2, 0), x.dtype))

        y = TorchConv(
            self.embed_dim, self.patch_size, self.patch_size, 0,
            name="patch_embed.proj",
        )(x)
        y = TorchLayerNorm(name="patch_embed.norm")(y)

        block_cls = nn.checkpoint(SwinBlock) if self.remat else SwinBlock
        for i, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            dim = self.embed_dim * (2 ** i)
            if i > 0:
                y = PatchMerging(dim, kernel_mode=self.attn_kernel,
                                 name=f"layers.{i}.downsample")(y)
            for j in range(depth):
                y = block_cls(
                    dim=dim,
                    num_heads=heads,
                    window_size=self.window_size,
                    shift=(j % 2 == 1),
                    attn_f32=self.attn_f32,
                    kernel_mode=self.attn_kernel,
                    is_training=train,
                    name=f"layers.{i}.blocks.{j}",
                )(y)
            feats.append(y)
        return feats
