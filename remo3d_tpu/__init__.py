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

try:  # model.py lands after the numerics foundation
    from .model import Model  # noqa: F401
    __all__ = ["Model"]
except ImportError:  # pragma: no cover - during bootstrap only
    __all__ = []
