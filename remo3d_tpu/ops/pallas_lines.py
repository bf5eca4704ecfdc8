# -*- coding: utf-8 -*-
"""Pallas TPU kernel: fused parallel-cyclic-reduction apply along the axial axis.

The factored PCR line solve (``lines.pcr_apply``) performs ``log2(NZ)`` shifted
multiply-add levels; in XLA each level is a separate HBM pass over the RHS
array. This kernel keeps a (NZ, 128-lane) tile resident in VMEM across ALL
levels — one HBM read + one write for the whole solve, ~8x less line-solve
traffic on the production 3D grids (NZ=193 -> 8 levels).

Layout: grid over (batch*solve, lane blocks); the axial axis sits in sublanes so
the per-level shifts are static sublane shifts (pad+slice). The factor arrays
are per-batch (shared across the solve axis) — their index maps divide the grid
coordinate by S.

Used by the 3D chunk solver's line preconditioner with a transparent fallback
to the jnp path (CPU backends, or if the kernel is unavailable).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _kernel(nz: int, n_levels: int, b_ref, a_ref, be_ref, dv_ref, o_ref):
    x = b_ref[0]  # (NZ, 128)
    for level in range(n_levels):
        s = 1 << level
        al = a_ref[level, 0]
        be = be_ref[level, 0]
        xm = jnp.pad(x, ((s, 0), (0, 0)))[:nz]  # x[i-s], zero fill
        xp = jnp.pad(x, ((0, s), (0, 0)))[s:]  # x[i+s], zero fill
        x = x + al * xm + be * xp
    o_ref[0] = x * dv_ref[0]


@partial(jax.jit, static_argnames=("n_solves",))
def pcr_apply_z_pallas(alphas, betas, dinv, b, *, n_solves: int):
    """Apply the factored z-line PCR to b.

    alphas/betas: (L, B, NZ, NP, NR); dinv: (B, NZ, NP, NR);
    b: (B, S, NZ, NP, NR) with S == n_solves. Returns the solved array.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, B = alphas.shape[0], alphas.shape[1]
    S = n_solves
    nz, np_, nr = b.shape[-3], b.shape[-2], b.shape[-1]
    npr = np_ * nr
    lanes = 128
    n_lane_blocks = (npr + lanes - 1) // lanes
    pad = n_lane_blocks * lanes - npr

    bf = b.reshape(B * S, nz, npr)
    af = alphas.reshape(L, B, nz, npr)
    bef = betas.reshape(L, B, nz, npr)
    dvf = dinv.reshape(B, nz, npr)
    if pad:
        bf = jnp.pad(bf, ((0, 0), (0, 0), (0, pad)))
        af = jnp.pad(af, ((0, 0), (0, 0), (0, 0), (0, pad)))
        bef = jnp.pad(bef, ((0, 0), (0, 0), (0, 0), (0, pad)))
        dvf = jnp.pad(dvf, ((0, 0), (0, 0), (0, pad)))

    out = pl.pallas_call(
        partial(_kernel, nz, L),
        out_shape=jax.ShapeDtypeStruct(bf.shape, bf.dtype),
        grid=(B * S, n_lane_blocks),
        in_specs=[
            pl.BlockSpec(
                (1, nz, lanes), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (L, 1, nz, lanes),
                lambda i, j: (0, i // S, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (L, 1, nz, lanes),
                lambda i, j: (0, i // S, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nz, lanes), lambda i, j: (i // S, 0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, nz, lanes), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
    )(bf, af, bef, dvf)

    if pad:
        out = out[..., :npr]
    return out.reshape(b.shape)


def stack_factors(steps, dinv):
    """Stack a lines.pcr_factor result into (L, ...) arrays for the kernel."""
    alphas = jnp.stack([a for a, _ in steps])
    betas = jnp.stack([be for _, be in steps])
    return alphas, betas, dinv
