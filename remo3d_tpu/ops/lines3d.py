# -*- coding: utf-8 -*-
"""Line (tridiagonal) relaxation for the 27-point 3D stencil.

Parallel-cyclic-reduction solves (see :mod:`.lines`) along each of the three grid
directions. The sheared-cylindrical grids carry anisotropy in all three orientations
(thin radial stations, tiny azimuthal arcs near the axis, fine source z-bands), so
the multigrid smoother composes all three additively.
"""

from __future__ import annotations

import jax.numpy as jnp

from .lines import pcr_solve
from .stencil3d import entry_index


def _expand(C, b):
    extra = b.ndim - (C.ndim - 1)
    return C if extra == 0 else jnp.expand_dims(C, -5)


def _solve(C, b, lo, hi, axis, max_steps=None):
    Cb = _expand(C, b)
    return pcr_solve(
        jnp.broadcast_to(Cb[..., entry_index(*lo)], b.shape),
        jnp.broadcast_to(Cb[..., entry_index(0, 0, 0)], b.shape),
        jnp.broadcast_to(Cb[..., entry_index(*hi)], b.shape),
        b,
        axis=axis,
        max_steps=max_steps,
    )


def line_solve_r3(C, b, max_steps=None):
    """Radial lines: couplings (0,0,-1), diag, (0,0,+1) along the last axis."""
    return _solve(C, b, (0, 0, -1), (0, 0, 1), -1, max_steps)


def line_solve_p3(C, b, max_steps=None):
    """Azimuthal lines: couplings (0,-1,0), diag, (0,+1,0) along axis -2."""
    return _solve(C, b, (0, -1, 0), (0, 1, 0), -2, max_steps)


def line_solve_z3(C, b, max_steps=None):
    """Axial lines: couplings (-1,0,0), diag, (+1,0,0) along axis -3."""
    return _solve(C, b, (-1, 0, 0), (1, 0, 0), -3, max_steps)
