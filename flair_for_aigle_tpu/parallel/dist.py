"""Distributed runtime helpers (replaces Lightning rank-zero + torch.distributed).

Multi-host TPU: call ``initialize()`` once per host process
(jax.distributed); rank-zero gating uses ``jax.process_index``. In-program
collectives are compiled into the step functions (psum over the mesh) —
see parallel/mesh.py — not exposed as eager ops.
"""

from __future__ import annotations

import functools
import os


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize for multi-host runs; no-op when single."""
    import jax

    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def is_rank_zero() -> bool:
    return process_index() == 0


def all_sum_host(array):
    """Sum a host numpy array across all processes.

    TPU-native equivalent of the reference's predict-path confusion-matrix
    reduction (torch.distributed.all_gather + rank-0 sum,
    /root/reference/flair_hub/writer/prediction_writer.py:68-87). Identity
    in single-process runs; otherwise an allgather over the process axis
    (every process returns the same global sum).
    """
    import numpy as np

    try:
        import jax

        n_proc = jax.process_count()
    except Exception:
        n_proc = 1
    if n_proc == 1:
        return np.asarray(array)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(array))
    return np.asarray(gathered).sum(axis=0)


def rank_zero_only(fn):
    """Decorator: run only on process 0 (reference uses Lightning's)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if is_rank_zero():
            return fn(*args, **kwargs)
        return None

    return wrapper
