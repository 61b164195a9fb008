"""Fused swin-block epilogue: window reverse + crop + un-shift + residual
+ LayerNorm + MLP + residual (Pallas TPU kernel).

Counterpart of ops/pallas/prep.py. The XLA lowering between the attention
kernel and the FFN kernel materializes the reversed raster, the cropped
raster and the un-rolled raster in HBM (models/swin.py:SwinBlock), and the
FFN kernel then re-reads that raster — ~4 extra full passes per block.
This kernel reads the attention output windows and the block shortcut
once and writes the block output once:

  attn = roll(window_reverse(win)[:, :h, :w], +ss)
  x2   = shortcut + attn
  out  = x2 + fc2(gelu(fc1(LN(x2))))

Grid: (B, nWh) — each instance produces one window-row of output rows.
Output row r pulls cropped row q = (r - ss) mod h, which lives in window
row q // ws at within-window row q % ws; the windows input is viewed as
(B*nW, ws, ws, C) so both of those are dynamic indices on non-tiled dims
(Mosaic-legal, same pattern as prep.py). Column un-shift/crop is a static
plan. The MLP runs once per instance on the (ws*w, C) slab with the
hidden dimension processed in static chunks to bound VMEM; numerics match
ops/pallas/ffn.py exactly (f32 LN stats, compute-dtype bias + exact-erf
GELU, f32 accumulation).

Backward: custom VJP recomputing through the XLA twin.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flair_for_aigle_tpu.ops.pallas.ffn import _gelu_exact


@lru_cache(maxsize=None)
def _build_call(b: int, h: int, w: int, c: int, hidden: int, ws: int,
                ss: int, eps: float, dtype_str: str, interpret: bool):
    hp = h + (ws - h % ws) % ws
    wp = w + (ws - w % ws) % ws
    nwh, nww = hp // ws, wp // ws
    dt = jnp.dtype(dtype_str)
    hc = hidden
    while hc > 128 and ws * w * hc * 4 > (2 << 20):
        hc //= 2
    n_chunks = max(1, hidden // hc)

    def body(win_ref, x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
             b2_ref, out_ref):
        wi = pl.program_id(1)
        rows = []
        for k in range(ws):
            r = wi * ws + k
            q = jax.lax.rem(r - ss + h, h)  # cropped source row
            a = q // ws                     # window row
            rw = jax.lax.rem(q, ws)         # row within window
            segs = []
            for wj in range(nww):
                seg = win_ref[pl.dslice(a * nww + wj, 1),
                              pl.dslice(rw, 1), :, :]
                segs.append(seg.reshape(ws, c))
            row_p = jnp.concatenate(segs, axis=0) if len(segs) > 1 else segs[0]
            row_c = row_p[:w]               # crop padded cols
            if ss:
                row_c = jnp.concatenate([row_c[w - ss:], row_c[:w - ss]],
                                        axis=0)  # un-shift (+ss roll)
            rows.append(row_c)
        attn = jnp.concatenate(rows, axis=0)          # (ws*w, c)
        x = x_ref[0].reshape(ws * w, c)
        # ffn.py numerics: residual in compute dtype, LN stats f32
        x2 = (x + attn.astype(dt)).astype(jnp.float32)
        mean = jnp.mean(x2, axis=-1, keepdims=True)
        var = jnp.mean((x2 - mean) ** 2, axis=-1, keepdims=True)
        ln = ((x2 - mean) * jax.lax.rsqrt(var + eps)
              * lns_ref[0] + lnb_ref[0]).astype(dt)
        acc = x2 + b2_ref[0].astype(jnp.float32)
        for j in range(n_chunks):
            hj = jnp.dot(ln, w1_ref[:, j * hc:(j + 1) * hc],
                         preferred_element_type=jnp.float32)
            hj = hj.astype(dt) + b1_ref[0, j * hc:(j + 1) * hc]
            hj = _gelu_exact(hj)
            acc = acc + jnp.dot(hj, w2_ref[j * hc:(j + 1) * hc, :],
                                preferred_element_type=jnp.float32)
        out_ref[0] = acc.astype(dt).reshape(ws, w, c)

    nw = nwh * nww
    call = pl.pallas_call(
        body,
        grid=(b, nwh),
        in_specs=[
            pl.BlockSpec((nw, ws, ws, c), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),   # windows (viewed 4D)
            pl.BlockSpec((1, ws, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),   # shortcut rows
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hidden), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ws, w, c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), dt),
        interpret=interpret,
    )
    return call


def _xla_forward(win, x, ln_scale, ln_bias, w1, b1, w2, b2, *, ws, ss, eps):
    """XLA twin: reverse + crop + roll + the ffn.py reference math."""
    from flair_for_aigle_tpu.models.swin import window_reverse
    from flair_for_aigle_tpu.ops.pallas.ffn import _xla_forward as ffn_ref

    b, h, w, c = x.shape
    hp = h + (ws - h % ws) % ws
    wp = w + (ws - w % ws) % ws
    y = window_reverse(win, ws, hp, wp)
    y = y[:, :h, :w, :]
    if ss:
        y = jnp.roll(y, (ss, ss), axis=(1, 2))
    return ffn_ref(x, y, ln_scale, ln_bias, w1, b1, w2, b2, eps=eps)


@lru_cache(maxsize=None)
def _vjp_fn(ws: int, ss: int, eps: float, interpret: bool):
    @jax.custom_vjp
    def f(win, x, ln_scale, ln_bias, w1, b1, w2, b2):
        b, h, w, c = x.shape
        hidden = w1.shape[-1]
        call = _build_call(b, h, w, c, hidden, ws, ss, eps, str(x.dtype),
                           interpret)
        dt = x.dtype
        win4 = win.reshape(win.shape[0], ws, ws, c)
        return call(
            win4, x,
            ln_scale.reshape(1, c).astype(jnp.float32),
            ln_bias.reshape(1, c).astype(jnp.float32),
            w1.astype(dt), b1.reshape(1, hidden).astype(dt),
            w2.astype(dt), b2.reshape(1, c).astype(dt),
        )

    def f_fwd(win, x, ln_scale, ln_bias, w1, b1, w2, b2):
        return f(win, x, ln_scale, ln_bias, w1, b1, w2, b2), (
            win, x, ln_scale, ln_bias, w1, b1, w2, b2
        )

    def f_bwd(res, g):
        ref = partial(_xla_forward, ws=ws, ss=ss, eps=eps)
        _, pullback = jax.vjp(ref, *res)
        return pullback(g)

    f.defvjp(f_fwd, f_bwd)
    return f


def fused_reverse_ln_mlp_residual(win: jax.Array, x: jax.Array, ln_scale,
                                  ln_bias, w1, b1, w2, b2, *, ws: int,
                                  ss: int, eps: float = 1e-5,
                                  interpret: bool | None = None) -> jax.Array:
    """windows (B*nW, T, C) + shortcut (B, H, W, C) -> block output
    (B, H, W, C). Differentiable (recompute VJP)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    return _vjp_fn(ws, ss, eps, interpret)(win, x, ln_scale, ln_bias,
                                           w1, b1, w2, b2)


def supports(h: int, w: int, c: int, hidden: int, ws: int,
             itemsize: int = 2) -> bool:
    """Gate: Mosaic-friendly dims and the per-instance resident set (window
    block + MLP slab temps + row io) fits VMEM.

    The w1/w2 weight blocks are constant-index operands that Mosaic streams
    rather than holding fully resident — an earlier gate that budgeted them
    double-buffered rejected every swin-base@512 stage geometry, silently
    disabling this kernel; all four compile and are bf16-parity green on
    real v5e (2026-08-18), including stage 4 whose weights alone (16 MB
    bf16) exceed VMEM."""
    if c % 128 or w % 8 or (ws * ws) % 8:
        return False
    hp = h + (ws - h % ws) % ws
    wp = w + (ws - w % ws) % ws
    nw = (hp // ws) * (wp // ws)
    win = nw * ws * ws * c * itemsize    # full per-image window set
    slab = 3 * ws * w * c * 4            # x2/ln/acc f32
    hc = hidden
    while hc > 128 and ws * w * hc * 4 > (2 << 20):
        hc //= 2
    temps = 3 * ws * w * hc * 4
    io = 2 * ws * w * c * itemsize * 2
    return win + slab + temps + io <= 14 * (1 << 20)
