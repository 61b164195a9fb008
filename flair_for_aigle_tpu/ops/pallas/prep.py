"""Fused swin-block prologue: LayerNorm + cyclic shift + pad + window
partition (Pallas TPU kernel).

The XLA lowering of ``window_partition(pad(roll(LN(x))))`` materializes
the f32 LN output, the rolled tensor, the padded tensor and the
partitioned windows in HBM — ~6-8 full passes over the activation per
swin block of pure glue in front of the fused attention kernel
(models/swin.py:SwinBlock). This kernel reads the raw NHWC activation
once and writes the partitioned (B*nW, T, C) windows once.

Grid: (B, nWh) — each instance assembles one window-row of one image.
The input block is the full (1, H, W, C) image (Mosaic: last two dims
(8,128)-divisible or full); consecutive window-rows revisit the same
block so it stays VMEM-resident across the inner grid dimension. All
shift/pad indexing is static: output padded row r maps to source row
(r + ss) % H for r < H and to zeros for r >= H (identical for columns),
so every window's (ws, ws, C) slab is at most a 2x2 set of static
slices; LN statistics are computed in float32 per token exactly like
TorchLayerNorm.

Numerics match the XLA path bit-for-bit at bf16: LN in f32 on the f32
upcast, scale/bias in f32, cast to the input dtype at the end (the XLA
path casts after LN too).

Backward: ``fused_ln_shift_partition`` carries a custom VJP that
recomputes through the XLA twin (same recipe as window_attn/ffn).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@lru_cache(maxsize=None)
def _build_call(b: int, h: int, w: int, c: int, ws: int, ss: int,
                eps: float, dtype_str: str, interpret: bool):
    hp = h + (ws - h % ws) % ws
    wp = w + (ws - w % ws) % ws
    nwh, nww = hp // ws, wp // ws
    t = ws * ws
    dt = jnp.dtype(dtype_str)

    def body(x_ref, s_ref, b_ref, out_ref):
        # out block: (nww, t, c) — one window-row of one image
        wi = pl.program_id(1)
        # LN the needed source rows once into a (ws, w, c) f32 slab, then
        # slice windows out of it. Source rows for padded rows
        # [wi*ws, wi*ws+ws): static per wi is impossible (wi is traced), so
        # rows are gathered via a static table lookup per offset: padded
        # row r = wi*ws + k maps to (r + ss) % h. Using dynamic slices on
        # the sublane dim keyed by a traced scalar is Mosaic-legal.
        for k in range(ws):
            r = wi * ws + k  # traced scalar
            rs = jax.lax.rem(r + ss, h)
            in_img = r < h
            row = x_ref[0, pl.dslice(rs, 1), :, :]  # (1, w, c)
            row = row.reshape(w, c)
            rowf = row.astype(jnp.float32)
            mean = jnp.mean(rowf, axis=-1, keepdims=True)
            var = jnp.mean((rowf - mean) ** 2, axis=-1, keepdims=True)
            ln = (rowf - mean) * jax.lax.rsqrt(var + eps)
            ln = ln * s_ref[0] + b_ref[0]
            ln = jnp.where(in_img, ln, 0.0).astype(dt)
            # columns: shifted + padded, assembled via static slices
            if ss:
                shifted = jnp.concatenate([ln[ss:], ln[:ss]], axis=0)
            else:
                shifted = ln
            if wp > w:
                shifted = jnp.concatenate(
                    [shifted, jnp.zeros((wp - w, c), dt)], axis=0
                )
            # scatter row k of every window in this window-row
            for wj in range(nww):
                out_ref[wj, k * ws:(k + 1) * ws, :] = (
                    shifted[wj * ws:(wj + 1) * ws]
                )

    call = pl.pallas_call(
        body,
        grid=(b, nwh),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nww, t, c), lambda i, j: (i * nwh + j, 0, 0),
        ),
        out_shape=jax.ShapeDtypeStruct((b * nwh * nww, t, c), dt),
        interpret=interpret,
    )
    return call, (hp, wp, nwh, nww)


def _xla_forward(x, ln_scale, ln_bias, *, ws, ss, eps):
    """XLA twin (models/swin.py glue) for the VJP backward."""
    from flair_for_aigle_tpu.models.swin import window_partition

    b, h, w, c = x.shape
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, -1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    y = y.astype(x.dtype)
    if ss:
        y = jnp.roll(y, (-ss, -ss), axis=(1, 2))
    hp = h + (ws - h % ws) % ws
    wp = w + (ws - w % ws) % ws
    if hp > h or wp > w:
        y = jnp.pad(y, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    return window_partition(y, ws)


@lru_cache(maxsize=None)
def _vjp_fn(ws: int, ss: int, eps: float, interpret: bool):
    @jax.custom_vjp
    def f(x, ln_scale, ln_bias):
        b, h, w, c = x.shape
        call, _ = _build_call(b, h, w, c, ws, ss, eps, str(x.dtype),
                              interpret)
        return call(x, ln_scale.reshape(1, c).astype(jnp.float32),
                    ln_bias.reshape(1, c).astype(jnp.float32))

    def f_fwd(x, ln_scale, ln_bias):
        return f(x, ln_scale, ln_bias), (x, ln_scale, ln_bias)

    def f_bwd(res, g):
        ref = partial(_xla_forward, ws=ws, ss=ss, eps=eps)
        _, pullback = jax.vjp(ref, *res)
        return pullback(g)

    f.defvjp(f_fwd, f_bwd)
    return f


def fused_ln_shift_partition(x: jax.Array, ln_scale, ln_bias, *, ws: int,
                             ss: int, eps: float = 1e-5,
                             interpret: bool | None = None) -> jax.Array:
    """(B, H, W, C) -> (B*nW, ws*ws, C): LN + roll(-ss) + pad-to-window +
    window partition in one VMEM pass. Differentiable (recompute VJP)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    return _vjp_fn(ws, ss, eps, interpret)(x, ln_scale, ln_bias)


def supports(h: int, w: int, c: int, ws: int, itemsize: int = 2) -> bool:
    """Gate: Mosaic-friendly dims and the full image block fits VMEM
    alongside the output window-row and f32 row temps."""
    if c % 128 or w % 8 or (ws * ws) % 8:
        return False
    wp = w + (ws - w % ws) % ws
    img = h * w * c * itemsize
    out_row = (wp // ws) * ws * ws * c * itemsize * 2  # double-buffered
    temps = 3 * w * c * 4
    return img + out_row + temps <= 10 * (1 << 20)
