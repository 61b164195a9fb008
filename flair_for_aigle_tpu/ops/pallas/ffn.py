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

Backward (round 5): custom VJP over ONE fused Pallas kernel plus a small
XLA LayerNorm epilogue (flash-style: only the raw inputs are saved as
residuals, everything else recomputes in VMEM). Grid (hidden chunks,
token blocks), hidden chunk OUTER: the chunk's f32 dW1/db1/dW2 stay
VMEM-resident and accumulate across the token axis (the inner,
consecutive grid dimension — the head-chunked attention-backward
pattern); the chunk's dLN contribution (dh0 @ W1c^T) is emitted as
(n_chunks, N, C) f32 partials; db2 accumulates in a constant-index block
during the first chunk pass. The XLA epilogue sums the partials,
recomputes the LN statistics from x+attn, and runs the (elementwise +
row-reduction) LayerNorm backward to produce dx/dattn and
dln_scale/dln_bias.

Five chunk-matmuls total (h0, dh, dW2, dW1, dln) versus the XLA
autodiff's six plus its HBM-materialized (N, 4C) hidden activations and
cotangents. An earlier TWO-kernel split (separate dx and dW kernels)
measured SLOWER than the XLA backward on v5e (62.3 vs 56.9 ms on the
18-block stage-3 train chain) because it duplicated the h0/dh recompute
across kernels — seven matmuls.

DEFAULT IS THE XLA-RECOMPUTE TWIN (round-5 measurement): even this
single-pass kernel measured a LOSS on v5e — full bench train step 184.3
(kernel) vs 181.1 (xla) vs 184.3 (kernel) same-phase A/B/A, stage-3
18-block chain 60.2 vs 56.3-59.3 — unlike the attention scores, the
(N, 4C) hidden tensors are small at swin geometries and XLA's backward
fusion already handles them; the kernel's per-chunk LN recompute and dln
partials round-trip cost more than the saved traffic. Parity is green
on-chip at all four stage geometries (med_rel <= 0.4%), so the kernel
stays available via FLAIR_FFN_BWD=kernel for wider-hidden architectures
where the traffic term dominates.
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


def _pick_bwd(n: int, c: int, hidden: int, itemsize: int
              ) -> tuple[int, int]:
    """(token block, hidden chunk) for the fused backward kernel, or
    (0, 0). The chunk's f32 dW1/dW2 accumulators are j-varying outputs
    (x2 double-buffered, Mosaic) — the dominant term. Prefers the largest
    hidden chunk (fewest LN recomputes and dln partials), then the largest
    token block."""
    budget = int(14.5 * (1 << 20))
    hc = hidden
    while hc >= 128 and hidden % hc == 0:
        for tb in (512, 256, 128, 64, 32, 16, 8):
            if n % tb:
                continue
            est = (tb * c * itemsize * 2 * 3      # x, attn, g (x2 dbl)
                   + tb * c * 4 * 2               # dln partial out (x2 dbl)
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


def _bwd_body(tb: int, c: int, hc: int, eps: float, dt):
    """dW1/db1/dW2 + per-chunk dLN partials + db2. Grid (hidden chunks,
    token blocks), hidden chunk OUTER: the chunk's f32 grads stay
    VMEM-resident and accumulate across the token axis (the inner,
    consecutive grid dimension); the dLN contribution streams out as a
    (n_chunks, N, C) f32 partial; db2 accumulates during the first chunk
    pass. The LayerNorm backward itself runs in an XLA epilogue
    (_kernel_bwd) over the summed partials."""
    from jax import lax

    def body(x_ref, a_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, g_ref,
             dlnp_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
        i = pl.program_id(1)
        j = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            dw1_ref[:] = jnp.zeros_like(dw1_ref)
            db1_ref[:] = jnp.zeros_like(db1_ref)
            dw2_ref[:] = jnp.zeros_like(dw2_ref)

        @pl.when((i == 0) & (j == 0))
        def _init_db2():
            db2_ref[:] = jnp.zeros_like(db2_ref)

        _, _, ln = _ln_recompute(x_ref, a_ref, lns_ref, lnb_ref, eps, dt)
        h0 = jnp.dot(ln, w1_ref[:],
                     preferred_element_type=jnp.float32).astype(dt) + b1_ref[0]
        h = _gelu_exact(h0)
        g = g_ref[:].astype(dt)

        @pl.when(j == 0)
        def _db2():
            db2_ref[0] += jnp.sum(g_ref[:].astype(jnp.float32), axis=0)

        dw2_ref[:] += lax.dot_general(h, g, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dh = lax.dot_general(g, w2_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
        dh0 = dh * _gelu_grad(h0)
        db1_ref[0] += jnp.sum(dh0, axis=0)
        dh0c = dh0.astype(dt)
        dw1_ref[:] += lax.dot_general(ln, dh0c, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dlnp_ref[0] = lax.dot_general(dh0c, w1_ref[:],
                                      (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    return body


@lru_cache(maxsize=None)
def _build_bwd_call(n: int, c: int, hidden: int, eps: float,
                    dtype_str: str, interpret: bool):
    """The fused backward call, or None when no geometry fits VMEM."""
    dt = jnp.dtype(dtype_str)
    itemsize = dt.itemsize
    tb, hc = _pick_bwd(n, c, hidden, itemsize)
    if tb == 0:
        return None
    n_chunks = hidden // hc
    tok = lambda j, i: (i, 0)
    call = pl.pallas_call(
        _bwd_body(tb, c, hc, eps, dt),
        grid=(n_chunks, n // tb),
        in_specs=[
            pl.BlockSpec((tb, c), tok, memory_space=pltpu.VMEM),   # x
            pl.BlockSpec((tb, c), tok, memory_space=pltpu.VMEM),   # attn
            pl.BlockSpec((1, c), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),                 # lns
            pl.BlockSpec((1, c), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),                 # lnb
            pl.BlockSpec((c, hc), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),                 # W1 chunk
            pl.BlockSpec((1, hc), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),                 # b1 chunk
            pl.BlockSpec((hc, c), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),                 # W2 chunk
            pl.BlockSpec((tb, c), tok, memory_space=pltpu.VMEM),   # g
        ],
        out_specs=[
            pl.BlockSpec((1, tb, c), lambda j, i: (j, i, 0),
                         memory_space=pltpu.VMEM),                 # dln part
            pl.BlockSpec((c, hc), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),                 # dW1
            pl.BlockSpec((1, hc), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),                 # db1
            pl.BlockSpec((hc, c), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),                 # dW2
            pl.BlockSpec((1, c), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),                 # db2
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks, n, c), jnp.float32),
            jax.ShapeDtypeStruct((c, hidden), jnp.float32),
            jax.ShapeDtypeStruct((1, hidden), jnp.float32),
            jax.ShapeDtypeStruct((hidden, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * n * c * hidden,
            bytes_accessed=(n_chunks * 3 * n * c * itemsize
                            + n_chunks * n * c * 4
                            + 4 * c * hidden * itemsize),
            transcendentals=2 * n * hidden,
        ),
        interpret=interpret,
    )
    if not interpret:
        # compile-probe safety net (same rationale as the attention
        # backward's, window_attn.py:_probe_compiles): an unmodeled
        # geometry on this opt-in path must degrade to the XLA twin, not
        # fail the caller's whole compile.
        from flair_for_aigle_tpu.ops.pallas.window_attn import _probe_compiles

        sds = jax.ShapeDtypeStruct
        avals = (sds((n, c), dt), sds((n, c), dt),
                 sds((1, c), jnp.float32), sds((1, c), jnp.float32),
                 sds((c, hidden), dt), sds((1, hidden), dt),
                 sds((hidden, c), dt), sds((n, c), dt))
        if not _probe_compiles(call, avals):
            return None
    return call


def _kernel_bwd(res, g, *, eps, interpret):
    """Fused Pallas backward + XLA LayerNorm epilogue; returns None when
    the geometry doesn't fit the VMEM budget (caller falls back to the
    XLA-recompute twin)."""
    x, attn, ln_scale, ln_bias, w1, b1, w2, b2 = res
    shape = x.shape
    c = shape[-1]
    hidden = w1.shape[-1]
    n = int(np.prod(shape[:-1]))
    dt = x.dtype
    call = _build_bwd_call(n, c, hidden, eps, str(dt), interpret)
    if call is None:
        return None
    xf = x.reshape(n, c)
    af = attn.reshape(n, c).astype(dt)
    gf2 = g.reshape(n, c)
    dlnp, dw1, db1, dw2, db2 = call(
        xf, af,
        ln_scale.reshape(1, c).astype(jnp.float32),
        ln_bias.reshape(1, c).astype(jnp.float32),
        w1.astype(dt), b1.reshape(1, hidden).astype(dt),
        w2.astype(dt), gf2.astype(dt),
    )
    # XLA LayerNorm epilogue: sum the chunk partials, recompute the f32 LN
    # statistics from x+attn (forward parity), run the row-reduction
    # backward. One elementwise pass over (N, C) — cheap next to the
    # kernel's matmuls, and XLA fuses it with the partial sum.
    dln = jnp.sum(dlnp, axis=0)
    x2 = (xf + af).astype(jnp.float32)
    mean = jnp.mean(x2, axis=-1, keepdims=True)
    var = jnp.mean((x2 - mean) ** 2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    nrm = (x2 - mean) * rstd
    lnsf = ln_scale.reshape(1, c).astype(jnp.float32)
    dlns = jnp.sum(dln * nrm, axis=0, keepdims=True)
    dlnb = jnp.sum(dln, axis=0, keepdims=True)
    dnrm = dln * lnsf
    m1 = jnp.mean(dnrm, axis=-1, keepdims=True)
    m2 = jnp.mean(dnrm * nrm, axis=-1, keepdims=True)
    dx2 = rstd * (dnrm - m1 - nrm * m2)
    dx = (gf2.reshape(n, c).astype(jnp.float32) + dx2).astype(dt)
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
        # FLAIR_FFN_BWD=kernel opts INTO the Pallas backward; the default
        # is the XLA-recompute twin, which measured FASTER on v5e at swin
        # geometries (see module docstring). Read at trace time.
        import os as _os

        if _os.getenv("FLAIR_FFN_BWD", "xla") == "kernel":
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
