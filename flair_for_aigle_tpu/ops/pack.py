"""5-bit label packing for canvas D2H over slow links.

Zonal argmax canvases are uint8 class ids (< 32 classes for every FLAIR
nomenclature); packing 8 pixels into 5 bytes cuts the device-to-host bytes
of each canvas stripe by 1.6x — material when the chip sits behind a
shared tunnel running at tens of MB/s (the reference's A100 never ships
the canvas: it writes per-tile from the host, which is what the on-device
stitch replaced).

Device side packs in-jit (``pack_labels5``); the host unpacks with cheap
vectorized numpy (``unpack_labels5``). Byte order is explicit (no
bitcasts), so the pair round-trips on any backend.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def packed_width(w: int) -> int:
    """Packed byte count for a row of ``w`` pixels (next multiple of 8)."""
    return -(-w // 8) * 5


def pack_labels5(x: jnp.ndarray) -> jnp.ndarray:
    """(C, H, W) uint8 labels < 32, W % 8 == 0 -> (C, H, W//8*5) uint8."""
    c, h, w = x.shape
    g = x.reshape(c, h, w // 8, 8).astype(jnp.uint32)
    lo = (g[..., 0] | (g[..., 1] << 5) | (g[..., 2] << 10)
          | (g[..., 3] << 15) | (g[..., 4] << 20) | (g[..., 5] << 25)
          | ((g[..., 6] & 3) << 30))
    hi = ((g[..., 6] >> 2) | (g[..., 7] << 3)).astype(jnp.uint8)
    parts = [(lo >> (8 * i)).astype(jnp.uint8) for i in range(4)] + [hi]
    return jnp.stack(parts, axis=-1).reshape(c, h, w // 8 * 5)


def unpack_labels5(p: np.ndarray, w: int) -> np.ndarray:
    """(C, H, W8//8*5) packed -> (C, H, w) uint8 labels."""
    c, h, pw = p.shape
    out = np.empty((c, h, w), np.uint8)
    unpack_labels5_into(p, out)
    return out


def unpack_labels5_into(p: np.ndarray, dst: np.ndarray) -> None:
    """Unpack (C, H, PW) 5-bit rows straight into a (C, h, w) uint8 view.

    ``dst`` may be a strided row-slice of the output canvas (rows must be
    contiguous); the native loop writes it in place, skipping the full-width
    intermediate the numpy path allocates. ~15x faster than numpy on the
    1-core host (0.7 s -> 0.05 s per km2 canvas), which matters because the
    unpack sits between striped D2H waits on the zonal critical path."""
    c, h, pw = p.shape
    cd, hd, w = dst.shape
    assert c == cd and h == hd and pw // 5 * 8 >= w
    lib = _native()
    if lib is not None and p.flags.c_contiguous and dst.strides[2] == 1:
        row_stride = dst.strides[1]
        for ci in range(c):
            lib.fl_unpack5_rows(
                p[ci].ctypes.data, dst[ci].ctypes.data, h, pw, w, row_stride,
            )
        return
    g = p.reshape(c, h, pw // 5, 5).astype(np.uint32)
    lo = g[..., 0] | (g[..., 1] << 8) | (g[..., 2] << 16) | (g[..., 3] << 24)
    hi = g[..., 4]
    px = np.empty((c, h, pw // 5, 8), np.uint8)
    for i in range(6):
        px[..., i] = (lo >> (5 * i)) & 31
    px[..., 6] = ((lo >> 30) & 3) | ((hi & 7) << 2)
    px[..., 7] = (hi >> 3) & 31
    dst[...] = px.reshape(c, h, -1)[:, :, :w]


def _native():
    try:
        from flair_for_aigle_tpu.geo.native import load

        return load()
    except Exception:  # missing toolchain: numpy fallback
        return None
