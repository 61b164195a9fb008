"""Fused swin patch merging: 2x2 neighborhood gather + LayerNorm +
channel reduction matmul (Pallas TPU kernel).

The XLA lowering of PatchMerging (models/swin.py) materializes the
6-D reshape/transpose gather and the f32 LN of the (B, H/2, W/2, 4C)
tensor in HBM before the reduction matmul. This kernel reads the input
raster once and writes the halved raster once; the 2x2 gather uses a
sublane-split reshape (W -> (W/2, 2), lanes untouched) plus static
middle-dim indexing — no strided slicing, no lane reshapes.

Segment order matches timm ([x00, x10, x01, x11] over (row, col)
parities — models/swin.py:PatchMerging); LN statistics run in f32 over
the virtual 4C concat without materializing it (linearity of sum /
sum-of-squares over the four segments), then each normalized segment
multiplies its slice of the reduction weight and the four partial
products accumulate in f32.

Backward: custom VJP recomputing through the XLA twin.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@lru_cache(maxsize=None)
def _build_call(b: int, h: int, w: int, c: int, out_c: int, eps: float,
                dtype_str: str, interpret: bool):
    dt = jnp.dtype(dtype_str)
    h2, w2 = h // 2, w // 2

    def body(x_ref, lns_ref, lnb_ref, wr_ref, out_ref):
        for i in range(h2):
            r0 = x_ref[0, 2 * i, :, :].reshape(w2, 2, c)
            r1 = x_ref[0, 2 * i + 1, :, :].reshape(w2, 2, c)
            segs = (r0[:, 0, :], r1[:, 0, :], r0[:, 1, :], r1[:, 1, :])
            fsegs = [s.astype(jnp.float32) for s in segs]
            s1 = sum(jnp.sum(s, axis=-1, keepdims=True) for s in fsegs)
            mean = s1 / (4 * c)
            # two-pass variance (XLA-path parity; the one-pass
            # E[x^2]-mean^2 form cancels catastrophically in f32)
            s2 = sum(jnp.sum((s - mean) ** 2, axis=-1, keepdims=True)
                     for s in fsegs)
            var = s2 / (4 * c)
            rstd = jax.lax.rsqrt(var + eps)
            acc = jnp.zeros((w2, out_c), jnp.float32)
            for k, s in enumerate(fsegs):
                ln = ((s - mean) * rstd * lns_ref[0, k * c:(k + 1) * c]
                      + lnb_ref[0, k * c:(k + 1) * c]).astype(dt)
                acc = acc + jnp.dot(
                    ln, wr_ref[k * c:(k + 1) * c, :],
                    preferred_element_type=jnp.float32,
                )
            out_ref[0, i, :, :] = acc.astype(dt)

    call = pl.pallas_call(
        body,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * c, out_c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h2, w2, out_c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h2, w2, out_c), dt),
        interpret=interpret,
    )
    return call


def _xla_forward(x, ln_scale, ln_bias, w_red, *, eps):
    """XLA twin of models/swin.py PatchMerging (timm order), no bias."""
    b, h, w, c = x.shape
    y = x.reshape(b, h // 2, 2, w // 2, 2, c)
    y = jnp.transpose(y, (0, 1, 3, 4, 2, 5)).reshape(b, h // 2, w // 2,
                                                     4 * c)
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, -1, keepdims=True)
    var = jnp.mean((yf - mean) ** 2, -1, keepdims=True)
    ln = ((yf - mean) * jax.lax.rsqrt(var + eps)
          * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32))
    ln = ln.astype(x.dtype)
    out = jnp.dot(ln, w_red.astype(x.dtype),
                  preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


@lru_cache(maxsize=None)
def _vjp_fn(eps: float, interpret: bool):
    @jax.custom_vjp
    def f(x, ln_scale, ln_bias, w_red):
        b, h, w, c = x.shape
        out_c = w_red.shape[-1]
        call = _build_call(b, h, w, c, out_c, eps, str(x.dtype), interpret)
        return call(x, ln_scale.reshape(1, 4 * c).astype(jnp.float32),
                    ln_bias.reshape(1, 4 * c).astype(jnp.float32),
                    w_red.astype(x.dtype))

    def f_fwd(x, ln_scale, ln_bias, w_red):
        return f(x, ln_scale, ln_bias, w_red), (x, ln_scale, ln_bias, w_red)

    def f_bwd(res, g):
        _, pullback = jax.vjp(partial(_xla_forward, eps=eps), *res)
        return pullback(g)

    f.defvjp(f_fwd, f_bwd)
    return f


def fused_patch_merge(x: jax.Array, ln_scale, ln_bias, w_red, *,
                      eps: float = 1e-5,
                      interpret: bool | None = None) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, out_c): timm patch merging in one
    VMEM pass. H and W must be even (SwinBlock pads beforehand).
    Differentiable (recompute VJP)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    return _vjp_fn(eps, interpret)(x, ln_scale, ln_bias, w_red)


def supports(h: int, w: int, c: int, out_c: int, itemsize: int = 2) -> bool:
    """Gate: even dims, lane-aligned channels, image + weights fit VMEM."""
    if h % 2 or w % 2 or c % 128 or out_c % 128 or (w // 2) % 8:
        return False
    img = h * w * c * itemsize * 2          # in block, double-buffered
    out = (h // 2) * (w // 2) * out_c * itemsize * 2
    weights = 4 * c * out_c * itemsize * 2
    temps = 6 * (w // 2) * max(c, out_c) * 4
    return img + out + weights + temps <= 12 * (1 << 20)
