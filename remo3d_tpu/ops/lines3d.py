# -*- coding: utf-8 -*-
"""Line (tridiagonal) relaxation for the 27-point 3D stencil.

Parallel-cyclic-reduction solves (see :mod:`.lines`) along each of the three grid
directions. The sheared-cylindrical grids carry anisotropy in all three orientations
(thin radial stations, tiny azimuthal arcs near the axis, fine source z-bands), so
the multigrid smoother composes all three additively.
"""

from __future__ import annotations

import jax.numpy as jnp

from .lines import pcr_apply, pcr_factor, pcr_solve
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


_LINE_AXES = {  # direction -> (lower offset, upper offset, grid axis)
    "z": ((-1, 0, 0), (1, 0, 0), -3),
    "p": ((0, -1, 0), (0, 1, 0), -2),
    "r": ((0, 0, -1), (0, 0, 1), -1),
}


def line_factor3(C, direction: str, max_steps=None):
    """Factorize the tridiagonal line part of the 27-pt stencil along a direction.

    The factorization is computed once per assembled operator (shape = C's batch +
    grid shape) and then applied to any number of RHS via :func:`line_apply3` —
    the hot path of the 3D CG preconditioner.
    """
    lo, hi, axis = _LINE_AXES[direction]
    steps, dinv = pcr_factor(
        C[..., entry_index(*lo)],
        C[..., entry_index(0, 0, 0)],
        C[..., entry_index(*hi)],
        axis=axis,
        max_steps=max_steps,
    )
    return steps, dinv, axis


def line_apply3(factors, b):
    """Apply a :func:`line_factor3` factorization to b (extra solve axis OK)."""
    steps, dinv, axis = factors
    extra = b.ndim - dinv.ndim
    if extra:
        steps = [
            (jnp.expand_dims(al, -4), jnp.expand_dims(be, -4)) for al, be in steps
        ]
        dinv = jnp.expand_dims(dinv, -4)
    return pcr_apply(steps, dinv, b, axis=axis)
