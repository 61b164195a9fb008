"""Device-side run-length encoding for canvas D2H over slow links.

Zonal argmax canvases are piecewise-constant class maps; their
run-length entropy is far below the 5 bits/px of ``ops.pack``. Encoding
runs on device cuts stripe D2H by another 4-1000x depending on map
complexity — decisive when the chip sits behind a tunnel moving single-
digit MB/s (the reference never ships a canvas at all: it writes
per-tile from the host, reference inference.py:297-352; the on-device
stitch replaced that and must land the canvas once).

Fixed-capacity design keeps everything static-shaped and sync-free: the
encoder emits a ``(max_runs, 5)`` uint8 buffer (little-endian uint32 run
length + class byte) plus the true run count. The caller sizes
``max_runs`` for the expected compression (1 run per 32 px is the
break-even vs 5-bit packing at the default capacity) and falls back to
the packed stripe when a map overflows — both encodings are computed on
device; only the chosen one crosses the link at full size. The run-count
scalar ships asynchronously alongside, so no host round-trip gates the
stripe pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def default_max_runs(n_px: int) -> int:
    """Capacity giving a guaranteed >=4x cut vs 5-bit packing: 5 bytes per
    run, one run per 32 px -> 0.156 B/px vs 0.625 B/px packed."""
    return max(64, n_px // 32)


def rle_encode5(x: jnp.ndarray, max_runs: int):
    """(C, h, w) uint8 -> ((max_runs, 5) uint8 runs, int32 n_runs).

    Runs span the flattened row-major raster (they cross row ends — the
    decoder reshapes, so nothing is lost). Each entry is 4 bytes of
    little-endian uint32 length + 1 value byte; entries past ``n_runs``
    are zero-length. When ``n_runs > max_runs`` the buffer is truncated
    and the caller must use its fallback encoding.
    """
    flat = x.reshape(-1)
    n = flat.shape[0]
    b = jnp.concatenate(
        [jnp.ones((1,), bool), flat[1:] != flat[:-1]]
    )
    n_runs = b.sum(dtype=jnp.int32)
    starts = jnp.nonzero(b, size=max_runs, fill_value=n)[0].astype(jnp.int32)
    ends = jnp.concatenate(
        [starts[1:], jnp.full((1,), n, jnp.int32)]
    )
    lengths = jnp.maximum(ends - starts, 0).astype(jnp.uint32)
    vals = flat[jnp.minimum(starts, n - 1)]
    parts = [(lengths >> (8 * i)).astype(jnp.uint8) for i in range(4)]
    return jnp.stack(parts + [vals], axis=-1), n_runs


def rle_decode_into(runs: np.ndarray, n_runs: int, dst: np.ndarray) -> None:
    """Expand a fetched run buffer into a contiguous uint8 view.

    ``dst`` must be C-contiguous (a full-width canvas row block is);
    ``runs`` may be the fixed-capacity buffer or any prefix >= n_runs.
    """
    k = int(n_runs)
    arr = runs[:k]
    lengths = (
        arr[:, 0].astype(np.int64)
        | (arr[:, 1].astype(np.int64) << 8)
        | (arr[:, 2].astype(np.int64) << 16)
        | (arr[:, 3].astype(np.int64) << 24)
    )
    flat = np.repeat(arr[:, 4], lengths)
    view = dst.reshape(-1)
    assert flat.size == view.size, (flat.size, view.size)
    view[:] = flat
