# -*- coding: utf-8 -*-
"""Multi-host (multi-process) execution support.

The reference scales across nodes with MPI dynamic process management
(remo3d.py:592, mpiexec in the examples). The TPU-native equivalent is JAX's
single-controller-per-process model: every host runs the same program, calls
:func:`initialize_distributed` once, and the executor's device mesh then spans
ALL hosts' devices (ICI within a slice, DCN across slices); the batch axis is
data-parallel so the only cross-host traffic is the initial shard staging and
the result gather.

Single-process runs are unaffected — every helper degrades to a no-op.
"""

from __future__ import annotations

import jax
import numpy as np


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize `jax.distributed` for multi-host runs (idempotent).

    With no arguments, relies on the cluster environment (TPU pods auto-detect
    coordinator/process ranks). No-op if already initialized or single-host.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # Already initialized, or a single-process environment without a
        # coordinator: both are fine - run single-host.
        pass


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def stage_sharded(arrays: list[np.ndarray], shardings: list) -> list[jax.Array]:
    """Place host arrays onto (possibly multi-host) shardings.

    Single-process: plain ``device_put``. Multi-process: every process holds the
    FULL logical array (the executor stages identical chunk data on all hosts —
    batches are cheap host-side), and each process contributes its local shard
    via ``jax.make_array_from_callback``.
    """
    if not is_multiprocess():
        return [jax.device_put(a, s) for a, s in zip(arrays, shardings)]
    out = []
    for a, s in zip(arrays, shardings):
        out.append(
            jax.make_array_from_callback(a.shape, s, lambda idx, a=a: a[idx])
        )
    return out


def gather_result(x: jax.Array) -> np.ndarray:
    """Fetch a (possibly multi-host sharded) result to every host."""
    if not is_multiprocess():
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
