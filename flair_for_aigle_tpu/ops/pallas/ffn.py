"""Fused transformer-block tail: residual + LayerNorm + MLP + residual
(Pallas TPU kernel).

Computes ``x2 = x + attn; out = x2 + fc2(gelu(fc1(LN(x2))))`` reading the
two input rasters once and writing the output once. The XLA lowering
round-trips every intermediate through HBM (the residual sum, the f32 LN
output, the 4C-wide hidden activations twice, fc2's output) — on the
bandwidth-bound swin encoder that is most of the non-attention traffic.

Grid: (token blocks, hidden chunks). The hidden dimension is processed in
chunks whose fc1/fc2 weight slices fit VMEM (swin-base stage 3 weights
are 8 MB each in bf16); partial fc2 products accumulate in a float32
scratch that lives across the chunk dimension, torch-matching epilogue
(bias adds and GELU in the compute dtype) applied per chunk.

Numerics: LN statistics in f32 (same as TorchLayerNorm), matmuls f32-
accumulated from compute-dtype inputs, fc1 bias + exact (erf) GELU in the
compute dtype exactly like the XLA MLP; fc2 partials accumulate in f32
(the XLA path accumulates in f32 inside one matmul — same reduction, one
extra rounding per chunk boundary).

Backward (round 5): custom VJP over TWO fused Pallas kernels (flash-style:
only the raw inputs are saved as residuals, everything else recomputes in
VMEM):

* dx kernel — grid (token blocks, hidden chunks), token block OUTER: the
  hidden-chunk contributions to dLN accumulate in a f32 VMEM scratch
  across the inner chunk axis; at the last chunk the LayerNorm backward
  runs and dx/dattn are written once. dln_scale/dln_bias/db2 accumulate in
  constant-index f32 output blocks across the whole grid.
* dW kernel — grid (hidden chunks, token blocks), hidden chunk OUTER: the
  chunk's dW1/db1/dW2 stay VMEM-resident and accumulate across the token
  axis (the inner, consecutive grid dimension), exactly the head-chunked
  attention-backward pattern.

Both recompute LN/h/gelu from x+attn per step, so the backward's HBM
traffic is two reads of (x, attn, g) plus the weight chunks — while the
XLA autodiff of the twin materializes the (N, 4C) hidden activations and
their cotangents in HBM. Geometries that don't fit fall back to the
round-3 XLA-recompute twin (also reachable via FLAIR_FFN_BWD=xla).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(z: jax.Array) -> jax.Array:
    """float32 erf via Abramowitz & Stegun 7.1.27 (|err| <= 2.7e-7,
    verified over [-8,8]) — Mosaic has no erf/erfc lowering. 7.1.27 is
    exp-free (poly6 + reciprocal + 4 squarings), measured 15% faster than
    the exp-based 7.1.26 at swin stage-1 geometry where the VPU GELU
    dominates the fused FFN kernel (2.29 -> 1.94 ms/block,
    tools/exp_gelu_patchembed.py 2026-08-18); both errors sit ~4 orders
    below one bf16 ulp, so bf16 kernel outputs are unchanged."""
    a = (0.0705230784, 0.0422820123, 0.0092705272,
         0.0001520143, 0.0002765672, 0.0000430638)
    za = jnp.abs(z)
    acc = jnp.float32(a[5])
    for c in (a[4], a[3], a[2], a[1], a[0]):
        acc = acc * za + jnp.float32(c)
    u = 1.0 + za * acc
    r = 1.0 / u
    r2 = r * r
    r4 = r2 * r2
    r8 = r4 * r4
    return jnp.sign(z) * (1.0 - r8 * r8)


def _gelu_exact(x: jax.Array) -> jax.Array:
    """gelu(approximate=False) in f32 via the erf polynomial."""
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + _erf(xf * np.float32(0.7071067811865476)))
            ).astype(x.dtype)


def _pick_tb(n: int, c: int, itemsize: int) -> int:
    """Token-block rows: largest of {2048 .. 8} dividing n whose x/attn/out
    blocks + f32 scratch fit the VMEM budget. Negative result (v5e,
    2026-08-18): tb=1024 at stage-1 geometry (C=128, n=262k) measured the
    same 1.8 ms/block as tb=512 (the kernel is VPU/mixed-bound there, not
    grid-step-bound) and tb=2048 OOMs scoped VMEM at 18.5M (f32 hidden
    accumulator dominates) — so 512 stays the cap."""
    for tb in (512, 256, 128, 64, 32, 16, 8):
        if n % tb:
            continue
        est = tb * c * itemsize * 3 * 2 + tb * c * 4 * 2
        if est <= 8 * (1 << 20):
            return tb
    return 0


def _pick_hc(c: int, hidden: int, itemsize: int) -> int:
    """Hidden-chunk width: largest divisor of ``hidden`` with each weight
    slice <= ~2.5 MB."""
    budget = int(2.5 * (1 << 20))
    hc = hidden
    while hc > 128 and c * hc * itemsize > budget:
        hc //= 2
    return hc if hidden % hc == 0 else hidden


def _kernel_body(tb: int, c: int, hc: int, n_chunks: int, eps: float,
                 out_dtype):
    def body(x_ref, a_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
             b2_ref, out_ref, acc_ref):
        j = pl.program_id(1)
        # residual add in the compute dtype (XLA-path rounding parity)
        x2 = (x_ref[:] + a_ref[:]).astype(jnp.float32)
        mean = jnp.mean(x2, axis=-1, keepdims=True)
        var = jnp.mean((x2 - mean) ** 2, axis=-1, keepdims=True)
        ln = ((x2 - mean) * jax.lax.rsqrt(var + eps)
              * lns_ref[0] + lnb_ref[0])
        ln = ln.astype(x_ref.dtype)
        h = jnp.dot(ln, w1_ref[:], preferred_element_type=jnp.float32)
        # torch-parity epilogue: cast to compute dtype, add bias, exact GELU
        h = h.astype(x_ref.dtype) + b1_ref[0]
        h = _gelu_exact(h)
        part = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = x2 + b2_ref[0].astype(jnp.float32)

        acc_ref[:] = acc_ref[:] + part

        @pl.when(j == n_chunks - 1)
        def _():
            out_ref[:] = acc_ref[:].astype(out_dtype)

    return body


@lru_cache(maxsize=None)
def _build_call(n: int, c: int, hidden: int, eps: float, dtype_str: str,
                interpret: bool):
    itemsize = jnp.dtype(dtype_str).itemsize
    tb = _pick_tb(n, c, itemsize)
    if tb == 0:
        raise ValueError(
            f"fused_ln_mlp_residual: no token block fits VMEM for "
            f"n={n} c={c} itemsize={itemsize}; gate with supports() first"
        )
    hc = _pick_hc(c, hidden, itemsize)
    n_chunks = hidden // hc
    out_dtype = jnp.dtype(dtype_str)
    body = _kernel_body(tb, c, hc, n_chunks, eps, out_dtype)
    call = pl.pallas_call(
        body,
        grid=(n // tb, n_chunks),
        in_specs=[
            pl.BlockSpec((tb, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((tb, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),  # attn
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),  # ln scale
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),  # ln bias
            pl.BlockSpec((c, hc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),  # W1 chunk
            pl.BlockSpec((1, hc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),  # b1 chunk
            pl.BlockSpec((hc, c), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),  # W2 chunk
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),  # b2
        ],
        out_specs=pl.BlockSpec((tb, c), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), out_dtype),
        scratch_shapes=[pltpu.VMEM((tb, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * n * c * hidden,
            bytes_accessed=3 * n * c * itemsize + 2 * c * hidden * itemsize,
            transcendentals=n * hidden,
        ),
        interpret=interpret,
    )
    return call


def _gelu_grad(h0) -> jax.Array:
    """d gelu(x)/dx in f32: Phi(x) + x * phi(x) with Phi the normal CDF
    (erf polynomial, as the forward) and phi the normal PDF."""
    z = h0.astype(jnp.float32)
    cdf = 0.5 * (1.0 + _erf(z * np.float32(0.7071067811865476)))
    pdf = jnp.exp(-0.5 * z * z) * np.float32(0.3989422804014327)
    return cdf + z * pdf


def _pick_bwd_dx(n: int, c: int, hidden: int, itemsize: int
                 ) -> tuple[int, int]:
    """(token block, hidden chunk) for the dx backward kernel, or (0, 0).
    Mosaic double-buffers the i-varying x/attn/g/dx blocks and the
    j-varying W1/W2 chunks; the dln accumulator and f32 temporaries are
    single. Prefers the largest hidden chunk (fewest dLN passes), then the
    largest token block."""
    budget = int(14.5 * (1 << 20))
    hc = hidden
    while hc >= 128 and hidden % hc == 0:
        for tb in (512, 256, 128, 64, 32, 16, 8):
            if n % tb:
                continue
            est = (tb * c * itemsize * 2 * 4      # x, attn, g, dx (x2 dbl)
                   + 2 * c * hc * itemsize * 2    # W1 + W2 chunk (x2 dbl)
                   + tb * c * 4 * 2               # dln scratch + nrm temp
                   + tb * c * 4 * 2               # x2 + ln f32 temporaries
                   + 3 * tb * hc * 4)             # h0 / dh / dh0 f32
            if est <= budget:
                return tb, hc
        hc //= 2
    return 0, 0


def _pick_bwd_dw(n: int, c: int, hidden: int, itemsize: int
                 ) -> tuple[int, int]:
    """(token block, hidden chunk) for the dW backward kernel, or (0, 0).
    The chunk's f32 dW1/dW2 accumulators are j-varying outputs (x2
    double-buffered) — the dominant term."""
    budget = int(14.5 * (1 << 20))
    hc = hidden
    while hc >= 128 and hidden % hc == 0:
        for tb in (512, 256, 128, 64, 32, 16, 8):
            if n % tb:
                continue
            est = (tb * c * itemsize * 2 * 3      # x, attn, g (x2 dbl)
                   + 2 * c * hc * itemsize * 2    # W1 + W2 chunk (x2 dbl)
                   + 2 * c * hc * 4 * 2           # dW1 + dW2 f32 (x2 dbl)
                   + tb * c * 4 * 2               # x2 + ln f32 temporaries
                   + 3 * tb * hc * 4)             # h0 / dh / dh0 f32
            if est <= budget:
                return tb, hc
        hc //= 2
    return 0, 0


def _ln_recompute(x_ref, a_ref, lns_ref, lnb_ref, eps, dt):
    """Forward-parity LN recompute from the raw inputs (f32 stats)."""
    x2 = (x_ref[:] + a_ref[:]).astype(jnp.float32)
    mean = jnp.mean(x2, axis=-1, keepdims=True)
    var = jnp.mean((x2 - mean) ** 2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    nrm = (x2 - mean) * rstd
    ln = (nrm * lns_ref[0] + lnb_ref[0]).astype(dt)
    return nrm, rstd, ln


def _bwd_dx_body(tb: int, c: int, hc: int, n_chunks: int, eps: float, dt):
    """dx/dattn + dln_scale/dln_bias/db2. Grid (token blocks, hidden
    chunks), token block OUTER: dLN accumulates across the inner chunk
    axis in a f32 scratch; the LayerNorm backward runs at the last chunk.
    The three (1, C) param grads accumulate in constant-index f32 output
    blocks across the whole grid."""
    from jax import lax

    def body(x_ref, a_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, g_ref,
             dx_ref, dlns_ref, dlnb_ref, db2_ref, dln_scr):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when((i == 0) & (j == 0))
        def _init():
            dlns_ref[:] = jnp.zeros_like(dlns_ref)
            dlnb_ref[:] = jnp.zeros_like(dlnb_ref)
            db2_ref[:] = jnp.zeros_like(db2_ref)

        @pl.when(j == 0)
        def _zero():
            dln_scr[:] = jnp.zeros_like(dln_scr)

        nrm, rstd, ln = _ln_recompute(x_ref, a_ref, lns_ref, lnb_ref, eps, dt)
        h0 = jnp.dot(ln, w1_ref[:],
                     preferred_element_type=jnp.float32).astype(dt) + b1_ref[0]
        g = g_ref[:].astype(dt)
        dh = lax.dot_general(g, w2_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
        dh0 = dh * _gelu_grad(h0)
        dln_scr[:] += lax.dot_general(
            dh0.astype(dt), w1_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(j == n_chunks - 1)
        def _fin():
            gf = g_ref[:].astype(jnp.float32)
            dln = dln_scr[:]
            dlns_ref[0] += jnp.sum(dln * nrm, axis=0)
            dlnb_ref[0] += jnp.sum(dln, axis=0)
            db2_ref[0] += jnp.sum(gf, axis=0)
            dnrm = dln * lns_ref[0]
            m1 = jnp.mean(dnrm, axis=-1, keepdims=True)
            m2 = jnp.mean(dnrm * nrm, axis=-1, keepdims=True)
            dx2 = rstd * (dnrm - m1 - nrm * m2)
            dx_ref[:] = (gf + dx2).astype(dt)

    return body


def _bwd_dw_body(tb: int, c: int, hc: int, eps: float, dt):
    """dW1/db1/dW2. Grid (hidden chunks, token blocks), hidden chunk
    OUTER: the chunk's f32 grads stay VMEM-resident and accumulate across
    the token axis (the inner, consecutive grid dimension)."""
    from jax import lax

    def body(x_ref, a_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, g_ref,
             dw1_ref, db1_ref, dw2_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _init():
            dw1_ref[:] = jnp.zeros_like(dw1_ref)
            db1_ref[:] = jnp.zeros_like(db1_ref)
            dw2_ref[:] = jnp.zeros_like(dw2_ref)

        _, _, ln = _ln_recompute(x_ref, a_ref, lns_ref, lnb_ref, eps, dt)
        h0 = jnp.dot(ln, w1_ref[:],
                     preferred_element_type=jnp.float32).astype(dt) + b1_ref[0]
        h = _gelu_exact(h0)
        g = g_ref[:].astype(dt)
        dw2_ref[:] += lax.dot_general(h, g, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dh = lax.dot_general(g, w2_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
        dh0 = dh * _gelu_grad(h0)
        db1_ref[0] += jnp.sum(dh0, axis=0)
        dw1_ref[:] += lax.dot_general(ln, dh0.astype(dt),
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    return body


@lru_cache(maxsize=None)
def _build_bwd_calls(n: int, c: int, hidden: int, eps: float,
                     dtype_str: str, interpret: bool):
    """(dx_call, dw_call) or None when either geometry doesn't fit VMEM."""
    dt = jnp.dtype(dtype_str)
    itemsize = dt.itemsize
    tbx, hcx = _pick_bwd_dx(n, c, hidden, itemsize)
    tbw, hcw = _pick_bwd_dw(n, c, hidden, itemsize)
    if tbx == 0 or tbw == 0:
        return None
    tok = lambda i, j: (i, 0)
    tokw = lambda j, i: (i, 0)
    const = lambda i, j: (0, 0)
    dx_call = pl.pallas_call(
        _bwd_dx_body(tbx, c, hcx, hidden // hcx, eps, dt),
        grid=(n // tbx, hidden // hcx),
        in_specs=[
            pl.BlockSpec((tbx, c), tok, memory_space=pltpu.VMEM),   # x
            pl.BlockSpec((tbx, c), tok, memory_space=pltpu.VMEM),   # attn
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),   # lns
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),   # lnb
            pl.BlockSpec((c, hcx), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),                  # W1 chunk
            pl.BlockSpec((1, hcx), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),                  # b1 chunk
            pl.BlockSpec((hcx, c), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),                  # W2 chunk
            pl.BlockSpec((tbx, c), tok, memory_space=pltpu.VMEM),   # g
        ],
        out_specs=[
            pl.BlockSpec((tbx, c), tok, memory_space=pltpu.VMEM),   # dx
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),   # dlns
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),   # dlnb
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),   # db2
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), dt),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((tbx, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * n * c * hidden,
            bytes_accessed=4 * n * c * itemsize + 2 * c * hidden * itemsize,
            transcendentals=n * hidden,
        ),
        interpret=interpret,
    )
    dw_call = pl.pallas_call(
        _bwd_dw_body(tbw, c, hcw, eps, dt),
        grid=(hidden // hcw, n // tbw),
        in_specs=[
            pl.BlockSpec((tbw, c), tokw, memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((tbw, c), tokw, memory_space=pltpu.VMEM),  # attn
            pl.BlockSpec((1, c), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),                  # lns
            pl.BlockSpec((1, c), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),                  # lnb
            pl.BlockSpec((c, hcw), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),                  # W1 chunk
            pl.BlockSpec((1, hcw), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),                  # b1 chunk
            pl.BlockSpec((hcw, c), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),                  # W2 chunk
            pl.BlockSpec((tbw, c), tokw, memory_space=pltpu.VMEM),  # g
        ],
        out_specs=[
            pl.BlockSpec((c, hcw), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),                  # dW1
            pl.BlockSpec((1, hcw), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),                  # db1
            pl.BlockSpec((hcw, c), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),                  # dW2
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, hidden), jnp.float32),
            jax.ShapeDtypeStruct((1, hidden), jnp.float32),
            jax.ShapeDtypeStruct((hidden, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * n * c * hidden,
            bytes_accessed=3 * n * c * itemsize + 2 * c * hidden * itemsize,
            transcendentals=2 * n * hidden,
        ),
        interpret=interpret,
    )
    return dx_call, dw_call


def _kernel_bwd(res, g, *, eps, interpret):
    """Fused Pallas backward; returns None when the geometry doesn't fit
    the VMEM budget (caller falls back to the XLA-recompute twin)."""
    x, attn, ln_scale, ln_bias, w1, b1, w2, b2 = res
    shape = x.shape
    c = shape[-1]
    hidden = w1.shape[-1]
    n = int(np.prod(shape[:-1]))
    dt = x.dtype
    built = _build_bwd_calls(n, c, hidden, eps, str(dt), interpret)
    if built is None:
        return None
    dx_call, dw_call = built
    args = (
        x.reshape(n, c), attn.reshape(n, c).astype(dt),
        ln_scale.reshape(1, c).astype(jnp.float32),
        ln_bias.reshape(1, c).astype(jnp.float32),
        w1.astype(dt), b1.reshape(1, hidden).astype(dt),
        w2.astype(dt), g.reshape(n, c).astype(dt),
    )
    dx, dlns, dlnb, db2 = dx_call(*args)
    dw1, db1, dw2 = dw_call(*args)
    dx = dx.reshape(shape)
    return (dx,
            dx.astype(attn.dtype),
            dlns.reshape(ln_scale.shape).astype(ln_scale.dtype),
            dlnb.reshape(ln_bias.shape).astype(ln_bias.dtype),
            dw1.astype(w1.dtype),
            db1.reshape(b1.shape).astype(b1.dtype),
            dw2.astype(w2.dtype),
            db2.reshape(b2.shape).astype(b2.dtype))


def _xla_forward(x, attn, ln_scale, ln_bias, w1, b1, w2, b2, *, eps):
    """XLA twin of the kernel (f32 LN stats, compute-dtype bias+GELU
    epilogue, f32 matmul accumulation) — differentiated by the custom
    VJP's backward."""
    dt = x.dtype
    x2 = (x + attn.astype(dt)).astype(jnp.float32)
    mean = jnp.mean(x2, axis=-1, keepdims=True)
    var = jnp.mean((x2 - mean) ** 2, axis=-1, keepdims=True)
    ln = ((x2 - mean) * jax.lax.rsqrt(var + eps)
          * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32))
    ln = ln.astype(dt)
    h = jnp.dot(ln, w1.astype(dt), preferred_element_type=jnp.float32)
    h = h.astype(dt) + b1.astype(dt)
    h = _gelu_exact(h)
    part = jnp.dot(h, w2.astype(dt), preferred_element_type=jnp.float32)
    return (x2 + b2.astype(dt).astype(jnp.float32) + part).astype(dt)


@lru_cache(maxsize=None)
def _vjp_fn(eps: float, interpret: bool):
    @jax.custom_vjp
    def f(x, attn, ln_scale, ln_bias, w1, b1, w2, b2):
        shape = x.shape
        c = shape[-1]
        hidden = w1.shape[-1]
        n = int(np.prod(shape[:-1]))
        call = _build_call(n, c, hidden, eps, str(x.dtype), interpret)
        dt = x.dtype
        out = call(
            x.reshape(n, c), attn.reshape(n, c).astype(dt),
            ln_scale.reshape(1, c).astype(jnp.float32),
            ln_bias.reshape(1, c).astype(jnp.float32),
            w1.astype(dt), b1.reshape(1, hidden).astype(dt),
            w2.astype(dt), b2.reshape(1, c).astype(dt),
        )
        return out.reshape(shape)

    def f_fwd(x, attn, ln_scale, ln_bias, w1, b1, w2, b2):
        return f(x, attn, ln_scale, ln_bias, w1, b1, w2, b2), (
            x, attn, ln_scale, ln_bias, w1, b1, w2, b2
        )

    def f_bwd(res, g):
        # FLAIR_FFN_BWD=xla opts out of the Pallas backward (falls back to
        # the XLA-recompute twin); read at trace time, not import time
        import os as _os

        if _os.getenv("FLAIR_FFN_BWD", "kernel") != "xla":
            grads = _kernel_bwd(res, g, eps=eps, interpret=interpret)
            if grads is not None:
                return grads
        _, pullback = jax.vjp(partial(_xla_forward, eps=eps), *res)
        return pullback(g)

    f.defvjp(f_fwd, f_bwd)
    return f


def fused_ln_mlp_residual(x: jax.Array, attn: jax.Array, ln_scale, ln_bias,
                          w1, b1, w2, b2, *, eps: float = 1e-5,
                          interpret: bool | None = None) -> jax.Array:
    """``x2 = x + attn; x2 + fc2(gelu(fc1(LN(x2))))`` over NHWC rasters.
    Differentiable via the custom VJP (XLA-recompute backward)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    return _vjp_fn(eps, interpret)(x, attn, ln_scale, ln_bias, w1, b1, w2, b2)


def supports(n: int, c: int, hidden: int, itemsize: int = 2) -> bool:
    return (c % 128 == 0 and hidden % 128 == 0
            and _pick_tb(n, c, itemsize) > 0
            and hidden % _pick_hc(c, hidden, itemsize) == 0)
