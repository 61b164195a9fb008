"""On-device canvas stitching for sliding-window inference.

The reference stitches per tile on the host with numpy windowed writes
(flair_zonal_detection/inference.py:297-352) — the single biggest
host-bottleneck in the pipeline. Here the margin-cropped per-tile
predictions are scattered into a device-resident uint8 canvas inside jit
(sequential ``lax.fori_loop`` of ``dynamic_update_slice`` — preserving the
reference's last-write-wins ordering) and the canvas crosses D2H once per
raster.

A Pallas variant (``stitch_tiles_pallas``) performs the same scatter with a
grid over tiles and scalar-prefetched offsets. As of this round Mosaic
rejects the unaligned dynamic uint8 stores on real v5e hardware (it passes
in interpret mode and matches the lax oracle), so ``stitch_tiles`` (lax
``dynamic_update_slice`` loop — already a single fused loop under XLA and
not the pipeline bottleneck at ~5ms/batch) is the production path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def stitch_tiles_pallas(canvas: jax.Array, tiles: jax.Array,
                        offsets: jax.Array, *, interpret: bool = False) -> jax.Array:
    """Pallas scatter: one grid step per tile, offsets scalar-prefetched."""
    b, c, th, tw = tiles.shape

    def kernel(offs_ref, tiles_ref, canvas_in_ref, canvas_ref):
        i = pl.program_id(0)
        row = offs_ref[i, 0]
        col = offs_ref[i, 1]
        canvas_ref[:, pl.ds(row, th), pl.ds(col, tw)] = tiles_ref[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, th, tw), lambda i, offs: (i, 0, 0, 0)),
            pl.BlockSpec(canvas.shape, lambda i, offs: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(canvas.shape, lambda i, offs: (0, 0, 0)),
    )
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(canvas.shape, canvas.dtype),
        input_output_aliases={2: 0},  # alias canvas input -> output
        interpret=interpret,
    )
    return fn(offsets, tiles, canvas)
