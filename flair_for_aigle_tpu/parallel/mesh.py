"""Device mesh + sharding helpers (GSPMD data parallelism).

Replaces the reference's Lightning DDP/NCCL setup (trainers.py:81-91,
README.md:112-117): training is compiled with ``jit`` over a
``jax.sharding.Mesh`` with a ``dp`` axis — batches are sharded over ``dp``,
parameters replicated, and XLA inserts the gradient all-reduces over ICI
(DCN across slices in multi-host runs). An optional ``fsdp`` axis is laid
out for parameter sharding at larger scales (models here are <=366M params
— reference README.md:410-437 — so replication is the default).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, fsdp: int = 1,
              devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    arr = np.asarray(devices)
    dp = len(arr) // fsdp
    return Mesh(arr.reshape(dp, fsdp), ("dp", "fsdp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place array entries batch-sharded over dp; passthrough non-arrays."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1:
            out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def pad_batch_to(batch: dict, size: int) -> tuple[dict, int]:
    """Pad the leading axis of every array to ``size`` (repeat last row) so
    fixed-shape jit steps accept ragged final batches."""
    import numpy as np

    out = {}
    valid = None
    for k, v in batch.items():
        if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1:
            b = v.shape[0]
            valid = b if valid is None else valid
            if b < size:
                reps = np.concatenate(
                    [v] + [v[-1:]] * (size - b), axis=0
                )
                out[k] = reps
            else:
                out[k] = v
        else:
            out[k] = v
    return out, (valid if valid is not None else size)
