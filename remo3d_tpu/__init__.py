# -*- coding: utf-8 -*-
"""remo3d_tpu — TPU-native forward modeling of normal and lateral resistivity logs.

A from-scratch JAX/XLA/Pallas re-implementation of the capability surface of ReMo3D
(synthetic DC resistivity borehole logs for 2D axisymmetric and 3D dipping-layer
models), designed TPU-first: structured boundary-fitted grids, stencil FEM, batched
preconditioned CG sharded over the device mesh. See DESIGN.md.

Public API parity: ``Model`` mirrors the reference package's single exported class
(/root/reference/remo3d/__init__.py:15).
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: the solve programs are large (multigrid
# V-cycles inside CG loops) and compile in minutes on the TPU toolchain; caching
# them across processes turns every later run into a pure-execute run.
_cache_dir = _os.environ.get(
    "REMO3D_TPU_CACHE", _os.path.join(_os.path.expanduser("~"), ".cache", "remo3d_tpu_xla")
)
if _os.environ.get("JAX_PLATFORMS", "").strip().lower() != "cpu":
    # TPU sessions only: CPU AOT cache entries replay with mismatched
    # machine-feature metadata (xla cpu_aot_loader warns about possible SIGILL),
    # so pure-CPU runs (tests, the driver's multichip dryrun) skip the cache.
    try:  # pragma: no cover - depends on jax build
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        # The default min-entry-size filter drops every artifact produced by
        # the axon remote-compile path (observed: no cache writes without it).
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

from .diff import DifferentiableLog  # noqa: F401,E402
from .model import Model  # noqa: F401,E402

__all__ = ["Model", "DifferentiableLog"]
