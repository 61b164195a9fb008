"""On-device canvas stitching for sliding-window inference.

The reference stitches per tile on the host with numpy windowed writes
(flair_zonal_detection/inference.py:297-352) — a major host bottleneck.
Here the margin-cropped per-tile predictions are scattered into a
device-resident uint8 canvas inside jit (sequential ``lax.fori_loop`` of
``dynamic_update_slice`` — preserving the reference's last-write-wins
ordering) and the canvas crosses D2H once per raster.

A Pallas variant was tried and deleted (round 2): the tile grid offsets
are geo-derived and arbitrary, so the uint8 stores are inherently
lane-unaligned, which Mosaic rejects on v5e; making them legal needs a
read-modify-write over aligned blocks — not worth it for an op measured at
~5 ms/batch that XLA already fuses into the inference dispatch.
"""

from __future__ import annotations

from functools import partial

import jax
from jax import lax


@partial(jax.jit, donate_argnums=(0,))
def stitch_tiles(canvas: jax.Array, tiles: jax.Array, offsets: jax.Array) -> jax.Array:
    """Scatter tiles into canvas, last-write-wins in batch order.

    canvas: (C, H, W); tiles: (B, C, th, tw); offsets: (B, 2) int32 (row, col)
    into the padded canvas — callers pad the canvas so every write is
    in-bounds (dynamic_update_slice clamps otherwise).
    """

    def body(i, cv):
        return lax.dynamic_update_slice(
            cv, tiles[i], (0, offsets[i, 0], offsets[i, 1])
        )

    return lax.fori_loop(0, tiles.shape[0], body, canvas)
