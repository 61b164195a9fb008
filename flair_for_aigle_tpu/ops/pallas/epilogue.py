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


def _body_class_prob(k_cls: int, inner: int):
    def body(lg_ref, r_ref, c_ref, out_ref):
        def up(k):
            return jnp.dot(
                jnp.dot(r_ref[:], lg_ref[0, k].astype(jnp.float32),
                        preferred_element_type=jnp.float32),
                c_ref[:], preferred_element_type=jnp.float32,
            )

        m = up(0)
        for k in range(1, k_cls):
            m = jnp.maximum(m, up(k))
        s = jnp.zeros((inner, inner), jnp.float32)
        for k in range(k_cls):
            s = s + jnp.exp(up(k) - m)
        inv = 255.0 / s
        for k in range(k_cls):
            out_ref[0, k] = jnp.round(jnp.exp(up(k) - m) * inv).astype(jnp.uint8)

    return body


@lru_cache(maxsize=None)
def _build_call(b: int, k_cls: int, h4: int, w4: int, margin: int, scale: int,
                output_type: str, in_dtype_str: str, interpret: bool):
    inner = h4 * scale - 2 * margin
    body = (_body_argmax if output_type == "argmax" else
            _body_class_prob)(k_cls, inner)
    out_c = 1 if output_type == "argmax" else k_cls
    call = pl.pallas_call(
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
        out_specs=pl.BlockSpec(
            (1, out_c, inner, inner) if output_type != "argmax"
            else (1, inner, inner),
            (lambda i: (i, 0, 0, 0)) if output_type != "argmax"
            else (lambda i: (i, 0, 0)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, out_c, inner, inner) if output_type != "argmax"
            else (b, inner, inner), jnp.uint8,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k_cls * inner * h4 * (w4 + inner)
            * (3 if output_type != "argmax" else 1),
            bytes_accessed=b * (k_cls * h4 * w4
                                * jnp.dtype(in_dtype_str).itemsize
                                + out_c * inner * inner),
            transcendentals=(2 * b * k_cls * inner * inner
                             if output_type != "argmax" else 0),
        ),
        interpret=interpret,
    )
    return call


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
    call = _build_call(b, k_cls, h4, w4, margin, scale, output_type,
                       str(logits_s4.dtype), interpret)
    out = call(logits_s4, r, c)
    if output_type == "argmax":
        out = out[:, None]
    return out


def supports(k_cls: int, h4: int, w4: int, margin: int, scale: int) -> bool:
    """VMEM-fit gate (per-instance buffers must fit comfortably)."""
    inner = h4 * scale - 2 * margin
    if inner <= 0:
        return False
    est = (k_cls * h4 * w4 * 4 + 2 * inner * h4 * 4
           + 4 * inner * inner * 4)
    return est <= 10 * (1 << 20)
