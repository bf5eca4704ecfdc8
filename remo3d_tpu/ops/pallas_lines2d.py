# -*- coding: utf-8 -*-
"""Pallas TPU kernels: single-pass application of factored PCR line solves (2D).

The 2D multigrid smoother is additive line relaxation (``line_rz``): per
Chebyshev degree step it solves the radial and axial tridiagonal parts of the
9-point stencil. The XLA ``pcr_apply`` path (ops/lines.py) materializes the
solution array in HBM at EVERY reduction level — ~10 levels x (read alpha/beta
+ read/write x) ≈ 3 GB of HBM traffic per line solve on the production
761x161 grid. These kernels run all reduction levels inside VMEM:

* the elimination coefficients (alpha_k, beta_k per level + the reduced
  inverse diagonal) are stacked into ONE ``(B, 2L+1, NZ, NR)`` array, stored
  bfloat16 (they only steer a *preconditioner* — CG controls the accuracy),
  and their block index map is constant over the solve axis, so Mosaic keeps
  them VMEM-resident across the S inner grid steps;
* the right-hand side streams through once: read b, write x — the per-level
  intermediate never touches HBM.

Per-direction blocking: the axial solve (sublane shifts via pad+slice) tiles
the lane axis at 128 stations; the radial solve (lane shifts via masked
``pltpu.roll``) tiles the sublane axis at 128 rows and needs the full padded
lane extent in-block. Zero-padded factor lanes make the circular roll
equivalent to the zero-fill shift of the XLA path: alpha=beta=0 in pad lanes
keeps pad entries exactly zero through every level, so real lanes pulling
from the pad region read the correct zero fill.

Replaces the hot smoother of the reference's NGSolve multigrid-preconditioned
CG (remo3d/ngsolve_functions.py:46-50) on the 2D axisymmetric path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def stack_factors(steps, dinv, dtype=jnp.bfloat16, lane_multiple: int = 128):
    """Pack a :func:`~remo3d_tpu.ops.lines.pcr_factor` result for the kernels.

    steps: [(alpha_k, beta_k)] each (B, NZ, NR); dinv (B, NZ, NR).
    Returns (B, 2L+1, NZ, NL) with NL the lane-padded station count — pad
    lanes are ZERO, which the kernels rely on (see module docstring).
    """
    planes = []
    for alpha, beta in steps:
        planes += [alpha, beta]
    planes.append(dinv)
    F = jnp.stack(planes, axis=-3).astype(dtype)
    nr = F.shape[-1]
    nl = ((nr + lane_multiple - 1) // lane_multiple) * lane_multiple
    if nl != nr:
        F = jnp.pad(F, ((0, 0), (0, 0), (0, 0), (0, nl - nr)))
    return F


def pcr_apply_stacked(F, b, axis: int):
    """XLA reference apply of a stacked factor array (any batch rank).

    Used for the rank-3 callers (power iteration) and as the interpreter-mode
    cross-check of the kernels; numerically identical to
    :func:`~remo3d_tpu.ops.lines.pcr_apply` up to the bfloat16 factor storage.
    """
    from .lines import _shift

    nr = b.shape[-1]
    L = (F.shape[-3] - 1) // 2
    extra = b.ndim - (F.ndim - 1)
    Fb = F if extra == 0 else jnp.expand_dims(F, -4)
    x = b
    s = 1
    for k in range(L):
        alpha = Fb[..., 2 * k, :, :nr].astype(b.dtype)
        beta = Fb[..., 2 * k + 1, :, :nr].astype(b.dtype)
        x = x + alpha * _shift(x, s, axis, 0.0) + beta * _shift(x, -s, axis, 0.0)
        s *= 2
    return x * Fb[..., 2 * L, :, :nr].astype(b.dtype)


def _sub_shift(x, s: int):
    """x[i - s] along sublanes (axis 0 of a (Z, L) tile), zero fill."""
    if s == 0:
        return x
    z = x.shape[0]
    if s > 0:
        return jnp.pad(x, ((s, 0), (0, 0)))[:z]
    return jnp.pad(x, ((0, -s), (0, 0)))[-s:]


def _lane_shift(x, s: int):
    """x[i - s] along lanes, zero fill (masked circular roll)."""
    from jax.experimental.pallas import tpu as pltpu

    nl = x.shape[-1]
    ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    rolled = pltpu.roll(x, s % nl, 1)
    if s >= 0:
        return jnp.where(ids >= s, rolled, 0.0)
    return jnp.where(ids < nl + s, rolled, 0.0)


def _apply_kernel(L: int, lanes: bool, f_ref, b_ref, o_ref):
    x = b_ref[0, 0]
    shift = _lane_shift if lanes else _sub_shift
    s = 1
    for k in range(L):
        alpha = f_ref[0, 2 * k].astype(x.dtype)
        beta = f_ref[0, 2 * k + 1].astype(x.dtype)
        x = x + alpha * shift(x, s) + beta * shift(x, -s)
        s *= 2
    o_ref[0, 0] = x * f_ref[0, 2 * L].astype(x.dtype)


@partial(jax.jit, static_argnames=("axis", "n_solves", "row_block"))
def pcr_apply_pallas(F, b, *, axis: int, n_solves: int, row_block: int | None = None):
    """x = T^{-1} b with stacked PCR factors, solving along ``axis``.

    F: (B, 2L+1, NZ, NL) from :func:`stack_factors` (NL lane-padded);
    b: (B, S, NZ, NR) float32. axis -2 = axial lines, -1 = radial lines.
    ``row_block`` tiles the sublane axis of the radial solve (None = 128;
    rows are independent there, so a partial final tile is safe).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S = b.shape[0], b.shape[1]
    assert S == n_solves
    nz, nr = b.shape[-2], b.shape[-1]
    P, nl = F.shape[1], F.shape[-1]
    L = (P - 1) // 2

    bf = b if nl == nr else jnp.pad(b, ((0, 0), (0, 0), (0, 0), (0, nl - nr)))

    if axis == -2:
        # Axial solve: lanes independent -> tile them; full z extent in-block.
        grid = (B, nl // 128, S)
        f_spec = pl.BlockSpec(
            (1, P, nz, 128), lambda bb, t, s: (bb, 0, 0, t), memory_space=pltpu.VMEM
        )
        b_spec = pl.BlockSpec(
            (1, 1, nz, 128), lambda bb, t, s: (bb, s, 0, t), memory_space=pltpu.VMEM
        )
        kern = partial(_apply_kernel, L, False)
    elif axis == -1:
        # Radial solve: rows independent -> tile them; full lane extent in-block.
        zb = min(row_block or 128, nz)
        grid = (B, -(-nz // zb), S)
        f_spec = pl.BlockSpec(
            (1, P, zb, nl), lambda bb, t, s: (bb, 0, t, 0), memory_space=pltpu.VMEM
        )
        b_spec = pl.BlockSpec(
            (1, 1, zb, nl), lambda bb, t, s: (bb, s, t, 0), memory_space=pltpu.VMEM
        )
        kern = partial(_apply_kernel, L, True)
    else:  # pragma: no cover
        raise ValueError(f"axis must be -1 or -2, got {axis}")

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(bf.shape, bf.dtype),
        grid=grid,
        in_specs=[f_spec, b_spec],
        out_specs=b_spec,
    )(F, bf)
    if nl != nr:
        out = out[..., :nr]
    return out


def line_rz_apply_pallas(F_z, F_r, b, *, n_solves: int):
    """Additive ADI line relaxation 0.5*(T_r^{-1} + T_z^{-1}) b, both kernels."""
    xz = pcr_apply_pallas(F_z, b, axis=-2, n_solves=n_solves)
    xr = pcr_apply_pallas(F_r, b, axis=-1, n_solves=n_solves)
    return 0.5 * (xz + xr)
