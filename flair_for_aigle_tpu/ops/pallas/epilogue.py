"""Fused zonal epilogue: x4 bilinear upsample + margin crop + argmax /
class-prob quantization (Pallas TPU kernel).

The reference pipeline (and our XLA path) materializes full-resolution
float32 logits per batch: UPerNet head x4 UpsamplingBilinear2d ->
NHWC->NCHW transpose -> margin crop -> argmax/softmax. At swin-base
zonal geometry that is ~3 GB of HBM traffic per batch-16 for a result
that fits in 3 MB of uint8. This kernel reads the stride-4 logits
(B, K, h/4, w/4) once and writes the cropped uint8 prediction directly.

Bilinear-with-align-corners is expressed as two dense interpolation
matmuls (R @ logits_k @ C) so the upsample rides the MXU; R's rows are
offset by the margin so only the kept pixels are ever computed. Numerics
match the unfused path: logits arrive in the compute dtype (bf16 under
compute_dtype=bfloat16) and the interpolation/softmax accumulate in f32,
exactly like the XLA path's float32 epilogue.

argmax ties break to the lowest class index (jnp.argmax parity).
class_prob quantization matches the unfused path within one uint8 step on
f32 logits and two steps on bf16 logits (the online-softmax rescale in
the stats pass adds one extra f32 rounding vs max-then-sum).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@lru_cache(maxsize=None)
def _interp_matrix(in_size: int, scale: int, lo: int, hi: int) -> np.ndarray:
    """(hi-lo, in_size) float32: rows evaluate UpsamplingBilinear2d
    (align_corners=True, factor ``scale``) at output positions [lo, hi)."""
    out_size = in_size * scale
    m = np.zeros((hi - lo, in_size), np.float32)
    for r, i in enumerate(range(lo, hi)):
        src = i * (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        a = int(np.floor(src))
        b = min(a + 1, in_size - 1)
        f = src - a
        m[r, a] += 1.0 - f
        m[r, b] += f
    return m


def _body_argmax(k_cls: int, inner: int):
    def body(lg_ref, r_ref, c_ref, out_ref):
        m = None
        idx = jnp.zeros((inner, inner), jnp.int32)
        for k in range(k_cls):
            u = jnp.dot(
                jnp.dot(r_ref[:], lg_ref[0, k].astype(jnp.float32),
                        preferred_element_type=jnp.float32),
                c_ref[:], preferred_element_type=jnp.float32,
            )
            if m is None:
                m = u
            else:
                idx = jnp.where(u > m, k, idx)
                m = jnp.maximum(m, u)
        out_ref[0] = idx.astype(jnp.uint8)

    return body


def _up(lg_ref, r_ref, c_ref, k):
    return jnp.dot(
        jnp.dot(r_ref[:], lg_ref[0, k].astype(jnp.float32),
                preferred_element_type=jnp.float32),
        c_ref[:], preferred_element_type=jnp.float32,
    )


def _body_softmax_stats(k_cls: int, inner: int):
    """Pass 1 of class_prob: per-pixel max and sum-exp over classes as an
    online softmax over a (image, class) grid — the all-classes-at-once
    form exceeds the 16 MB VMEM budget at 19 classes / 432 px. The m/s
    output blocks revisit across the class dimension (same index map), so
    the running rescale happens in VMEM."""

    def body(lg_ref, r_ref, c_ref, m_ref, s_ref):
        k = pl.program_id(1)
        u = _up(lg_ref, r_ref, c_ref, 0)

        @pl.when(k == 0)
        def _():
            m_ref[0] = u
            s_ref[0] = jnp.ones((inner, inner), jnp.float32)

        @pl.when(k != 0)
        def _():
            m_old = m_ref[0]
            m_new = jnp.maximum(m_old, u)
            s_ref[0] = (s_ref[0] * jnp.exp(m_old - m_new)
                        + jnp.exp(u - m_new))
            m_ref[0] = m_new

    return body


def _body_class_prob_write(inner: int):
    """Pass 2: one grid instance per (image, class) quantizes its plane."""

    def body(lg_ref, r_ref, c_ref, m_ref, s_ref, out_ref):
        u = _up(lg_ref, r_ref, c_ref, 0)
        q = jnp.round(jnp.exp(u - m_ref[0]) * (255.0 / s_ref[0]))
        # Mosaic has no f32->uint8 cast; round through int32
        out_ref[0, 0] = q.astype(jnp.int32).astype(jnp.uint8)

    return body


@lru_cache(maxsize=None)
def _build_argmax_call(b: int, k_cls: int, h4: int, w4: int, margin: int,
                       scale: int, in_dtype_str: str, interpret: bool):
    inner = h4 * scale - 2 * margin
    body = _body_argmax(k_cls, inner)
    return pl.pallas_call(
        body,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k_cls, h4, w4), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((inner, h4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w4, inner), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, inner, inner), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, inner, inner), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k_cls * inner * h4 * (w4 + inner),
            bytes_accessed=b * (k_cls * h4 * w4
                                * jnp.dtype(in_dtype_str).itemsize
                                + inner * inner),
            transcendentals=0,
        ),
        interpret=interpret,
    )


@lru_cache(maxsize=None)
def _build_class_prob_calls(b: int, k_cls: int, h4: int, w4: int, margin: int,
                            scale: int, in_dtype_str: str, interpret: bool):
    inner = h4 * scale - 2 * margin
    lg_spec = pl.BlockSpec((1, k_cls, h4, w4), lambda i, *_: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    r_spec = pl.BlockSpec((inner, h4), lambda i, *_: (0, 0),
                          memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((w4, inner), lambda i, *_: (0, 0),
                          memory_space=pltpu.VMEM)
    plane = pl.BlockSpec((1, inner, inner), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    lg1_spec = pl.BlockSpec((1, 1, h4, w4), lambda i, k: (i, k, 0, 0),
                            memory_space=pltpu.VMEM)
    stats = pl.pallas_call(
        _body_softmax_stats(k_cls, inner),
        grid=(b, k_cls),
        in_specs=[lg1_spec, r_spec, c_spec],
        out_specs=(plane, plane),
        out_shape=(jax.ShapeDtypeStruct((b, inner, inner), jnp.float32),
                   jax.ShapeDtypeStruct((b, inner, inner), jnp.float32)),
        interpret=interpret,
    )
    write = pl.pallas_call(
        _body_class_prob_write(inner),
        grid=(b, k_cls),
        in_specs=[lg1_spec, r_spec, c_spec, plane, plane],
        out_specs=pl.BlockSpec((1, 1, inner, inner),
                               lambda i, k: (i, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k_cls, inner, inner), jnp.uint8),
        interpret=interpret,
    )
    return stats, write


def upsample_crop_convert(logits_s4: jax.Array, *, margin: int, scale: int = 4,
                          output_type: str = "argmax",
                          interpret: bool | None = None) -> jax.Array:
    """logits_s4: (B, K, h/scale, w/scale) stride-``scale`` logits.
    Returns uint8 (B, 1, inner, inner) argmax labels or
    (B, K, inner, inner) round(softmax*255), inner = h - 2*margin."""
    b, k_cls, h4, w4 = logits_s4.shape
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    inner = h4 * scale - 2 * margin
    r = jnp.asarray(_interp_matrix(h4, scale, margin, margin + inner))
    c = jnp.asarray(_interp_matrix(w4, scale, margin, margin + inner)).T
    if output_type == "argmax":
        call = _build_argmax_call(b, k_cls, h4, w4, margin, scale,
                                  str(logits_s4.dtype), interpret)
        return call(logits_s4, r, c)[:, None]
    stats, write = _build_class_prob_calls(b, k_cls, h4, w4, margin, scale,
                                           str(logits_s4.dtype), interpret)
    m, s = stats(logits_s4, r, c)
    return write(logits_s4, r, c, m, s)


def supports(k_cls: int, h4: int, w4: int, margin: int, scale: int) -> bool:
    """VMEM-fit gate (per-instance buffers must fit comfortably)."""
    inner = h4 * scale - 2 * margin
    if inner <= 0:
        return False
    est = (k_cls * h4 * w4 * 4 + 2 * inner * h4 * 4
           + 4 * inner * inner * 4)
    return est <= 10 * (1 << 20)
