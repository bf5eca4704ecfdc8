# -*- coding: utf-8 -*-
"""Pallas TPU kernels: single-pass factored PCR line solves (3D grids).

3D counterpart of :mod:`.pallas_lines2d` for the ADI preconditioner of the
dipping-model CG (parallel/runtime.py ``_pcg3``): each preconditioner
application performs five tridiagonal line solves on (B, S, NZ, NP, NR)
arrays, and the XLA factored apply writes the intermediate solution to HBM at
every PCR reduction level. These kernels run all levels VMEM-resident.

Layout follows :mod:`.pallas_stencil`: (NP, NR) flatten into lanes, NZ on
sublanes. Axial solves reuse the 2D sublane kernel on the flattened arrays;
azimuthal/radial solves shift lanes by ``s*NR`` / ``s`` with a validity mask
decoded from the lane coordinate (a pull across a line boundary is zero fill,
exactly the out-of-range identity rows of the XLA PCR). The stacked
elimination coefficients are stored bfloat16 (they only steer the
preconditioner; the tolerance-controlled CG sets the accuracy) and stay
VMEM-resident across the solve axis.

Replaces the hot smoother of the reference's accelerator solve path
(remo3d/ngsolve_functions.py:46-50 with ngscuda offload) on dipping models.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def stack_factors3(steps, dinv, dtype=jnp.bfloat16, lane_multiple: int = 128):
    """Pack a 3D :func:`~remo3d_tpu.ops.lines.pcr_factor` result for the kernels.

    steps: [(alpha_k, beta_k)] each (B, NZ, NP, NR); dinv (B, NZ, NP, NR).
    Returns (B, 2L+1, NZ, NL) with (NP, NR) flattened into zero-padded lanes.
    """
    planes = []
    for alpha, beta in steps:
        planes += [alpha, beta]
    planes.append(dinv)
    F = jnp.stack(planes, axis=-4).astype(dtype)
    B, P, nz = F.shape[0], F.shape[1], F.shape[2]
    npr = F.shape[-2] * F.shape[-1]
    F = F.reshape(B, P, nz, npr)
    nl = ((npr + lane_multiple - 1) // lane_multiple) * lane_multiple
    if nl != npr:
        F = jnp.pad(F, ((0, 0), (0, 0), (0, 0), (0, nl - npr)))
    return F


def _apply_kernel_lanes(L: int, stride: int, size: int, nr: int, f_ref, b_ref, o_ref):
    """PCR apply along lanes with stride ``stride`` (1 = radial, NR = azimuthal);
    ``size`` = line length, ``nr`` decodes the (p, r) lane coordinate."""
    from jax.experimental.pallas import tpu as pltpu

    x = b_ref[0, 0]
    nl = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    p = lane // nr
    coord = lane - p * nr if stride == 1 else p
    s = 1
    for k in range(L):
        alpha = f_ref[0, 2 * k].astype(x.dtype)
        beta = f_ref[0, 2 * k + 1].astype(x.dtype)
        sh = s * stride
        xm = jnp.where(coord >= s, pltpu.roll(x, sh % nl, 1), 0.0)
        xp = jnp.where(coord + s < size, pltpu.roll(x, (nl - sh) % nl, 1), 0.0)
        x = x + alpha * xm + beta * xp
        s *= 2
    o_ref[0, 0] = x * f_ref[0, 2 * L].astype(x.dtype)


@partial(jax.jit, static_argnames=("direction", "np_", "nr", "n_solves", "row_block"))
def line_apply3_pallas(
    F, b, *, direction: str, np_: int, nr: int, n_solves: int,
    row_block: int | None = None,
):
    """x = T^{-1} b along ``direction`` with stacked PCR factors.

    F: (B, 2L+1, NZ, NL) from :func:`stack_factors3`; b: (B, S, NZ, NP, NR).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .pallas_lines2d import pcr_apply_pallas

    B, S, nz = b.shape[0], b.shape[1], b.shape[2]
    assert S == n_solves
    npr = np_ * nr
    nl = F.shape[-1]
    bf = b.reshape(B, S, nz, npr)

    if direction == "z":
        out = pcr_apply_pallas(F, bf, axis=-2, n_solves=n_solves)
        return out.reshape(b.shape)

    P = F.shape[1]
    L = (P - 1) // 2
    stride, size = (1, nr) if direction == "r" else (nr, np_)
    if nl != npr:
        bf = jnp.pad(bf, ((0, 0), (0, 0), (0, 0), (0, nl - npr)))
    zb = min(row_block or 64, nz)
    grid = (B, -(-nz // zb), S)
    f_spec = pl.BlockSpec(
        (1, P, zb, nl), lambda bb, t, s: (bb, 0, t, 0), memory_space=pltpu.VMEM
    )
    b_spec = pl.BlockSpec(
        (1, 1, zb, nl), lambda bb, t, s: (bb, s, t, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        partial(_apply_kernel_lanes, L, stride, size, nr),
        out_shape=jax.ShapeDtypeStruct(bf.shape, bf.dtype),
        grid=grid,
        in_specs=[f_spec, b_spec],
        out_specs=b_spec,
    )(F, bf)
    if nl != npr:
        out = out[..., :npr]
    return out.reshape(b.shape)
