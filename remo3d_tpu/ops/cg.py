# -*- coding: utf-8 -*-
"""Batched preconditioned conjugate gradients on stencil operators.

Replaces NGSolve's CGSolver (ngsolve_functions.py:50, reference caps at
maxsteps=1000 with no exposed tolerance; we expose both). All solves in the batch run
lock-step inside one ``lax.while_loop``; converged/empty lanes are frozen via
masking, so padded (NaN) measurement slots cost nothing numerically and the loop
exits when every lane is done.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from .stencil import stencil_apply, stencil_diag


def pcg(
    C: jnp.ndarray,
    b: jnp.ndarray,
    M_inv: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    tol: float = 1e-7,
    maxiter: int = 1000,
    n_grid_axes: int = 2,
    matvec: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
):
    """Solve A u = b with A given by stencil C, for batched right-hand sides.

    2D: C (..., NZ, NR, 3, 3), b (..., [S,] NZ, NR). 3D (n_grid_axes=3): pass a
    custom ``matvec`` (e.g. the pole-projected 27-point apply) and a Jacobi or MG
    ``M_inv``. Returns (u, info); info = dict(iterations, rel_residual) with b's
    batch shape.
    """
    axes = tuple(range(-n_grid_axes, 0))

    def _dot(a, c):
        return jnp.sum(a * c, axis=axes)

    if matvec is None:
        matvec = lambda u: stencil_apply(C, u)

    if M_inv is None:
        diag = stencil_diag(C)
        if b.ndim == C.ndim - n_grid_axes + 1:  # solve axis present
            diag = jnp.expand_dims(diag, axis=-(n_grid_axes + 1))
        safe_diag = jnp.where(diag != 0, diag, 1.0)
        M_inv = lambda r: r / safe_diag

    b_norm2 = _dot(b, b)
    active0 = b_norm2 > 0
    tol2 = (tol * tol) * jnp.where(active0, b_norm2, 1.0)

    def _bc(s):  # broadcast a batch scalar over the grid axes
        return s[(...,) + (None,) * n_grid_axes]

    u0 = jnp.zeros_like(b)
    r0 = b
    z0 = M_inv(r0)
    p0 = z0
    rz0 = _dot(r0, z0)

    def cond(state):
        u, r, p, rz, k = state
        rr = _dot(r, r)
        not_done = jnp.logical_and(active0, rr > tol2)
        return jnp.logical_and(k < maxiter, jnp.any(not_done))

    def body(state):
        u, r, p, rz, k = state
        Ap = matvec(p)
        pAp = _dot(p, Ap)
        rr = _dot(r, r)
        live = jnp.logical_and(active0, jnp.logical_and(rr > tol2, pAp > 0))
        alpha = jnp.where(live, rz / jnp.where(pAp > 0, pAp, 1.0), 0.0)
        u = u + _bc(alpha) * p
        r = r - _bc(alpha) * Ap
        z = M_inv(r)
        rz_new = _dot(r, z)
        beta = jnp.where(live, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        p = z + _bc(beta) * p
        # Freeze p on finished lanes so their (masked) updates stay benign.
        rz = jnp.where(live, rz_new, rz)
        return u, r, p, rz, k + 1

    u, r, p, rz, k = jax.lax.while_loop(cond, body, (u0, r0, p0, rz0, jnp.int32(0)))
    rel = jnp.sqrt(_dot(r, r) / jnp.where(active0, b_norm2, 1.0))
    return u, {"iterations": k, "rel_residual": rel}
