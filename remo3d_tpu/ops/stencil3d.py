# -*- coding: utf-8 -*-
"""27-point stencil operator on (NZ, NP, NR) node grids + the pole projector.

3D counterpart of :mod:`.stencil` for the sheared-cylindrical half-ball grids:
axes are (axial z-line i, azimuth j, radial station k). The stencil is stored with a
FLATTENED entry axis ``C[..., NZ, NP, NR, 27]`` (entry e = ((dz+1)*3+(dp+1))*3+dr+1)
— the axon TPU compiler is unstable on rank-7 arrays, and rank-5 layouts are also
friendlier to tile.

The radial station k=0 is the borehole axis, where all azimuth copies of a node
coincide physically; the orthogonal projector :func:`pole_project` ties them
(average over the azimuth), turning the full-grid operator into the exact reduced
FEM system on the tied subspace.
"""

from __future__ import annotations

import jax.numpy as jnp

_OFFSETS = [(dz, dp, dr) for dz in (-1, 0, 1) for dp in (-1, 0, 1) for dr in (-1, 0, 1)]


def entry_index(dz: int, dp: int, dr: int) -> int:
    """Flattened stencil entry for neighbor offset (dz, dp, dr) in {-1,0,1}^3."""
    return ((dz + 1) * 3 + (dp + 1)) * 3 + (dr + 1)


DIAG = entry_index(0, 0, 0)


def stencil3d_apply(C: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """y = A u.  C: (..., NZ, NP, NR, 27); u: (..., [S,] NZ, NP, NR)."""
    nz, np_, nr = C.shape[-4], C.shape[-3], C.shape[-2]
    extra = u.ndim - (C.ndim - 1)
    if extra not in (0, 1):
        raise ValueError(f"rank mismatch: C {C.shape}, u {u.shape}")
    Cb = C if extra == 0 else jnp.expand_dims(C, axis=-5)
    u_pad = jnp.pad(u, [(0, 0)] * (u.ndim - 3) + [(1, 1), (1, 1), (1, 1)])
    y = jnp.zeros_like(u)
    for dz, dp, dr in _OFFSETS:
        e = entry_index(dz, dp, dr)
        y = y + Cb[..., e] * u_pad[
            ..., 1 + dz : 1 + dz + nz, 1 + dp : 1 + dp + np_, 1 + dr : 1 + dr + nr
        ]
    return y


def stencil3d_diag(C: jnp.ndarray) -> jnp.ndarray:
    return C[..., DIAG]


def pole_project(u: jnp.ndarray) -> jnp.ndarray:
    """Average the coincident axis DOFs over the azimuth (radial station 0)."""
    pole_mean = jnp.mean(u[..., :, :, 0], axis=-1, keepdims=True)
    return u.at[..., :, :, 0].set(jnp.broadcast_to(pole_mean, u[..., :, :, 0].shape))
