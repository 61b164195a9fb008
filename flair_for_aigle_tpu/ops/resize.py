"""Image resizing primitives with PyTorch / SciPy-compatible semantics.

The reference stack leans on three distinct resampling conventions that are
NOT interchangeable:

* ``F.interpolate(mode="bilinear", align_corners=False)`` — used throughout
  the model zoo (reference flair_hub/models/flair_model.py:327,
  multitemp_model.py:613) and for fusion feature-map alignment.
* ``F.interpolate(mode="nearest")`` — smp U-Net decoder upsampling.
* ``scipy.ndimage.zoom(order=0)`` — output-resolution rescale of predictions
  in the zonal writer (reference flair_zonal_detection/inference.py:212-226).

We implement all three as gather-based ops on the two spatial axes of an
NHWC tensor. Gathers along a single axis lower to efficient dynamic-slice /
take ops on TPU and fuse with surrounding elementwise work; no antialiasing
is applied (matching torch defaults, unlike ``jax.image.resize``).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


def _torch_bilinear_weights(in_size: int, out_size: int):
    """Source indices + lerp weights for align_corners=False half-pixel mapping."""
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = (src - lo).astype(np.float32)
    return lo, hi, w_hi


def _torch_nearest_index(in_size: int, out_size: int):
    """torch mode='nearest' index map: floor(dst * in/out)."""
    scale = in_size / out_size
    idx = np.floor(np.arange(out_size, dtype=np.float64) * scale).astype(np.int64)
    return np.minimum(idx, in_size - 1)


def _scipy_zoom0_index(in_size: int, out_size: int):
    """scipy.ndimage.zoom(order=0, grid_mode=False) index map.

    scipy (grid_mode=False) maps output coordinate i to input coordinate
    i * (in-1)/(out-1) (endpoint-aligned), then rounds (spline order 0).
    """
    if out_size == 1 or in_size == 1:
        return np.zeros(out_size, dtype=np.int64)
    src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    idx = np.round(src).astype(np.int64)
    return np.clip(idx, 0, in_size - 1)


@lru_cache(maxsize=None)
def _bilinear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) float32 two-tap interpolation matrix (align_corners=False,
    torch weights via _torch_bilinear_weights)."""
    lo, hi, f = _torch_bilinear_weights(in_size, out_size)
    m = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, lo), 1.0 - f)
    np.add.at(m, (rows, hi), f)
    return m


@lru_cache(maxsize=None)
def _bilinear_ac_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) float32 two-tap interpolation matrix, align_corners=True
    (torch nn.UpsamplingBilinear2d endpoint mapping)."""
    if out_size == 1:
        src = np.zeros(1)
    else:
        src = np.arange(out_size, dtype=np.float64) * (
            (in_size - 1) / (out_size - 1))
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    f = (src - lo).astype(np.float32)
    m = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, lo), 1.0 - f)
    np.add.at(m, (rows, hi), f)
    return m


@partial(jax.jit, static_argnums=(1, 2))
def resize_bilinear_ac_nhwc(x: jax.Array, out_h: int, out_w: int
                            ) -> jax.Array:
    """Bilinear resize of (..., H, W, C), torch align_corners=TRUE
    semantics, as two dense f32 interpolation matmuls. The gather+lerp
    form's BACKWARD is a scatter-add over the source grid — measured
    pathological on TPU (the UPerNet head's x4 upsample dominated the
    train step's decoder+head cost, tools/exp_train_decomp.py 2026-08-19);
    the matmul transpose rides the MXU instead. Same two-tap weights."""
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mh = jnp.asarray(_bilinear_ac_matrix(h, out_h))
    mw = jnp.asarray(_bilinear_ac_matrix(w, out_w))
    out = jnp.einsum("oh,...hwc->...owc", mh, xf)
    out = jnp.einsum("pw,...owc->...opc", mw, out)
    return out.astype(dtype)


@partial(jax.jit, static_argnums=(1, 2))
def resize_bilinear_nhwc(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize of (..., H, W, C), torch align_corners=False
    semantics. Expressed as two dense f32 interpolation matmuls so it rides
    the MXU — the gather+lerp form materializes four full-size f32
    intermediates per call, which dominated the UPerNet decoder's HBM
    traffic on TPU (same weights, same two-term sums)."""
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mh = jnp.asarray(_bilinear_matrix(h, out_h))
    mw = jnp.asarray(_bilinear_matrix(w, out_w))
    out = jnp.einsum("oh,...hwc->...owc", mh, xf)
    out = jnp.einsum("pw,...owc->...opc", mw, out)
    return out.astype(dtype)


@partial(jax.jit, static_argnums=(1, 2))
def resize_nearest_nhwc(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Nearest resize of (..., H, W, C), torch mode='nearest' semantics."""
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    if out_h % h == 0 and out_w % w == 0:
        # integer upscale: torch's floor(i*in/out) == i // k, i.e. exactly
        # a repeat. jnp.repeat lowers to broadcast+reshape whose BACKWARD
        # is a window reduce-sum — the gather form's backward is a
        # scatter-add, measured pathological on TPU in the FPN/U-Net
        # decoder backward (tools/exp_train_decomp.py 2026-08-19).
        out = jnp.repeat(x, out_h // h, axis=-3)
        return jnp.repeat(out, out_w // w, axis=-2)
    idx_h = jnp.asarray(_torch_nearest_index(h, out_h))
    idx_w = jnp.asarray(_torch_nearest_index(w, out_w))
    out = jnp.take(x, idx_h, axis=-3)
    out = jnp.take(out, idx_w, axis=-2)
    return out


def interpolate(
    x: jax.Array,
    size: tuple[int, int],
    mode: str = "bilinear",
    channel_axis: int = -1,
) -> jax.Array:
    """General entry point mirroring ``F.interpolate(align_corners=False)``.

    Accepts NHWC (channel_axis=-1, native layout) or NCHW (channel_axis=1).
    """
    out_h, out_w = size
    if channel_axis in (-1, x.ndim - 1):
        nhwc = x
    elif channel_axis == 1 and x.ndim == 4:
        nhwc = jnp.transpose(x, (0, 2, 3, 1))
    else:
        raise ValueError(f"Unsupported channel_axis={channel_axis} for ndim={x.ndim}")

    if mode == "bilinear":
        out = resize_bilinear_nhwc(nhwc, out_h, out_w)
    elif mode == "nearest":
        out = resize_nearest_nhwc(nhwc, out_h, out_w)
    else:
        raise ValueError(f"Unknown interpolation mode: {mode}")

    if channel_axis == 1 and x.ndim == 4:
        out = jnp.transpose(out, (0, 3, 1, 2))
    return out


def zoom_nearest(x: np.ndarray | jax.Array, scale: float) -> jax.Array:
    """scipy.ndimage.zoom(order=0) equivalent on the last two axes.

    Matches the reference's ``resample_prediction`` (inference.py:212-226):
    output size = round(in * scale), coordinate mapping i/zoom with rounding.
    """
    x = jnp.asarray(x)
    h, w = x.shape[-2], x.shape[-1]
    out_h = int(round(h * scale))
    out_w = int(round(w * scale))
    if (out_h, out_w) == (h, w):
        return x
    idx_h = jnp.asarray(_scipy_zoom0_index(h, out_h))
    idx_w = jnp.asarray(_scipy_zoom0_index(w, out_w))
    out = jnp.take(x, idx_h, axis=-2)
    out = jnp.take(out, idx_w, axis=-1)
    return out


def adaptive_avg_pool_nhwc(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """torch ``AdaptiveAvgPool2d`` semantics on (..., H, W, C).

    Bin i covers input range [floor(i*H/out), ceil((i+1)*H/out)). Implemented
    as two dense averaging matmuls so it rides the MXU for the PSP pyramid.
    """
    h, w = x.shape[-3], x.shape[-2]

    def pool_matrix(in_size, out_size):
        m = np.zeros((out_size, in_size), dtype=np.float32)
        for i in range(out_size):
            lo = int(np.floor(i * in_size / out_size))
            hi = int(np.ceil((i + 1) * in_size / out_size))
            m[i, lo:hi] = 1.0 / (hi - lo)
        return jnp.asarray(m)

    mh = pool_matrix(h, out_h)
    mw = pool_matrix(w, out_w)
    xf = x.astype(jnp.float32)
    out = jnp.einsum("oh,...hwc->...owc", mh, xf)
    out = jnp.einsum("pw,...owc->...opc", mw, out)
    return out.astype(x.dtype)
