# -*- coding: utf-8 -*-
"""Line (tridiagonal) solvers on stencil operators — anisotropy-robust smoothing.

The boundary-fitted grids have cell aspect ratios up to ~10^3 (thin radial stations
along multi-meter axial cells), which defeats point smoothers. Line relaxation
solves the strong-coupling direction exactly: for each grid line, the tridiagonal
part of the stencil along that line. Implemented as a Thomas algorithm under
``lax.scan``, vectorized over every other axis — the scan is the only sequential
dimension, everything else rides the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _thomas(dl, d, du, b):
    """Tridiagonal solve along axis 0, batched over remaining axes.

    dl[0] and du[-1] are ignored. All inputs shape (m, ...).
    """
    eps = jnp.asarray(1e-30, dtype=d.dtype)

    def fwd(carry, inp):
        c_prev, r_prev = carry
        dl_j, d_j, du_j, b_j = inp
        denom = d_j - dl_j * c_prev
        denom = jnp.where(jnp.abs(denom) > eps, denom, eps)
        c_j = du_j / denom
        r_j = (b_j - dl_j * r_prev) / denom
        return (c_j, r_j), (c_j, r_j)

    zeros = jnp.zeros_like(b[0])
    (_, _), (c, r) = jax.lax.scan(fwd, (zeros, zeros), (dl, d, du, b))

    def bwd(x_next, inp):
        c_j, r_j = inp
        x_j = r_j - c_j * x_next
        return x_j, x_j

    _, x_rev = jax.lax.scan(bwd, zeros, (c, r), reverse=True)
    return x_rev


def line_solve_r(C, b):
    """Solve the radial-line tridiagonal part: couplings (1,0),(1,1),(1,2).

    C: (..., NZ, NR, 3, 3); b: (..., [S,] NZ, NR). Solves along the NR axis for
    every z-line independently.
    """
    extra = b.ndim - (C.ndim - 2)
    Cb = C if extra == 0 else jnp.expand_dims(C, -5)
    dl = jnp.broadcast_to(Cb[..., 1, 0], b.shape)
    d = jnp.broadcast_to(Cb[..., 1, 1], b.shape)
    du = jnp.broadcast_to(Cb[..., 1, 2], b.shape)
    # Move the radial axis to the front for the scan.
    x = _thomas(
        jnp.moveaxis(dl, -1, 0),
        jnp.moveaxis(d, -1, 0),
        jnp.moveaxis(du, -1, 0),
        jnp.moveaxis(b, -1, 0),
    )
    return jnp.moveaxis(x, 0, -1)


def line_solve_z(C, b):
    """Solve the axial-line tridiagonal part: couplings (0,1),(1,1),(2,1)."""
    extra = b.ndim - (C.ndim - 2)
    Cb = C if extra == 0 else jnp.expand_dims(C, -5)
    dl = jnp.broadcast_to(Cb[..., 0, 1], b.shape)
    d = jnp.broadcast_to(Cb[..., 1, 1], b.shape)
    du = jnp.broadcast_to(Cb[..., 2, 1], b.shape)
    x = _thomas(
        jnp.moveaxis(dl, -2, 0),
        jnp.moveaxis(d, -2, 0),
        jnp.moveaxis(du, -2, 0),
        jnp.moveaxis(b, -2, 0),
    )
    return jnp.moveaxis(x, 0, -2)
