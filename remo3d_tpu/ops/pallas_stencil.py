# -*- coding: utf-8 -*-
"""Pallas TPU kernel: symmetric-storage 27-point stencil apply.

The assembled FEM stencil is symmetric: ``C[n, d] == C[n+d, -d]``. The XLA
apply (:func:`..stencil3d.stencil3d_apply`) reads 27 coefficient planes per
application — the dominant HBM traffic of a 3D CG iteration (the ADI
preconditioner applies the operator 5x per iteration). This kernel stores only
the diagonal + the 13 lexicographically-positive offset planes and uses each
TWICE while the tile is VMEM-resident:

    y  = C_diag * u
    y += C_d * shift(u, +d)          (coupling n -> n+d)
    y += shift(C_d * u, -d)          (the mirrored coupling n+d -> n)

Layout: the (NP, NR) axes are flattened into lanes (padded to 128k); azimuthal
and radial neighbor shifts become lane shifts with edge masks, axial shifts are
sublane shifts. One grid step per (batch, solve); the coefficient block's index
map is constant over the solve axis, so Mosaic keeps it resident across the S
inner steps — the per-iteration C traffic drops by ~2*S/27 relative to XLA.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .stencil3d import entry_index

# Diagonal + 13 positive offsets (lexicographic order over (dz, dp, dr)).
POS_OFFSETS = [
    (dz, dp, dr)
    for dz in (-1, 0, 1)
    for dp in (-1, 0, 1)
    for dr in (-1, 0, 1)
    if (dz, dp, dr) > (0, 0, 0)
]
HALF_ENTRIES = [entry_index(0, 0, 0)] + [entry_index(*d) for d in POS_OFFSETS]


def half_planes(C):
    """(..., NZ, NP, NR, 27) stencil -> (..., 14, NZ, NP*NR) half storage."""
    sel = jnp.stack([C[..., e] for e in HALF_ENTRIES], axis=-4)
    shp = sel.shape
    return sel.reshape(shp[:-2] + (shp[-2] * shp[-1],))


def _shift2(x, dz: int, dlane: int, nz: int):
    """Shift x (NZ, L) by +dz sublanes (zero fill) and +dlane lanes.

    Lane shifts use a CIRCULAR roll (Mosaic cannot concatenate on the lane
    dimension): the caller guarantees >= |dlane| zero-padded lanes at the end
    of the array, so the wrapped values are zeros and the roll is equivalent
    to a zero-fill shift.
    """
    from jax.experimental.pallas import tpu as pltpu

    if dz > 0:
        x = jnp.pad(x, ((dz, 0), (0, 0)))[:nz]
    elif dz < 0:
        x = jnp.pad(x, ((0, -dz), (0, 0)))[-dz:]
    if dlane != 0:
        x = pltpu.roll(x, dlane % x.shape[-1], 1)  # roll requires shift >= 0
    return x


def _kernel(nz, np_, nr, n_lane, offsets, with_diag, c_ref, u_ref, o_ref):
    # Lane-coordinate decode for the edge masks (lanes flatten (p, r)).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_lane), 1)
    p = lane // nr
    r = lane - p * nr

    def mask(dp, dr):
        # Valid iff the neighbor (p+dp, r+dr) exists (no lane wrap, no padding).
        ok = (r + dr >= 0) & (r + dr < nr) & (p + dp >= 0) & (p + dp < np_)
        return (ok & (p < np_)).astype(jnp.float32)

    u = u_ref[0, 0]
    if with_diag:
        y = c_ref[0, 0] * u
        k0 = 1
    else:
        y = jnp.zeros_like(u)
        k0 = 0
    for k, (dz, dp, dr) in enumerate(offsets):
        cplane = c_ref[0, k + k0]
        s = dp * nr + dr
        # u(n+d): pull from lane+s; valid where the +d neighbor exists.
        up = _shift2(u, -dz, -s, nz) * mask(dp, dr)
        y = y + cplane * up
        # mirrored coupling: scatter C_d(n)*u(n) to n+d; at the destination m
        # the -d neighbor (the origin) must exist.
        t = cplane * u
        y = y + _shift2(t, dz, s, nz) * mask(-dp, -dr)
    o_ref[0, 0] = y


def padded_lanes(np_: int, nr: int, lanes: int = 128) -> int:
    """Lane extent of the kernel's flattened (NP, NR) axis (see apply below)."""
    npr = np_ * nr
    n_lane = -(-npr // lanes) * lanes
    if n_lane - npr < nr + 1:  # circular lane rolls need >= nr+1 zero lanes
        n_lane += lanes
    return n_lane


def fits_tpu_vmem(nz: int, np_: int, nr: int) -> bool:
    """Whether the half-plane kernel's working set fits v5e VMEM.

    Measured cliff (round 4, scratch/screen3d_tpu.py + /tmp remote-compile
    logs): the remote compiler accepts nz*n_lane = 247k floats per plane
    (GridSpec3D.accurate(), 193x25x49 -> lanes 1280) and crashes
    (tpu_compile_helper HTTP 500) at 329k (257x17x65). The executor's auto
    mode (parallel/runtime.py dispatch) uses this to fall back to the XLA
    27-plane apply — which compiles at any size — for refined grids.
    """
    return nz * padded_lanes(np_, nr) <= 280_000


@partial(jax.jit, static_argnames=("n_solves",))
def stencil3d_apply_pallas(C_half, u, *, n_solves: int):
    """y = A u with half-plane stencil storage.

    C_half: (B, 14, NZ, NP*NR) from :func:`half_planes`; u: (B, S, NZ, NP, NR).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S = u.shape[0], u.shape[1]
    assert S == n_solves
    nz, np_, nr = u.shape[-3], u.shape[-2], u.shape[-1]
    npr = np_ * nr
    n_lane = padded_lanes(np_, nr)
    pad = n_lane - npr

    uf = u.reshape(B, S, nz, npr)
    cf = C_half
    if pad:
        uf = jnp.pad(uf, ((0, 0), (0, 0), (0, 0), (0, pad)))
        cf = jnp.pad(cf, ((0, 0), (0, 0), (0, 0), (0, pad)))

    # Two half-calls (7 coefficient planes each) keep the VMEM footprint under
    # the 16 MB/core budget at production grid sizes; u is re-read once, which
    # is still far cheaper than the 13 extra coefficient planes of the XLA path.
    def call(cf_part, offsets, with_diag):
        n_planes = cf_part.shape[1]
        return pl.pallas_call(
            partial(_kernel, nz, np_, nr, n_lane, offsets, with_diag),
            out_shape=jax.ShapeDtypeStruct(uf.shape, uf.dtype),
            grid=(B, S),
            in_specs=[
                pl.BlockSpec(
                    (1, n_planes, nz, n_lane), lambda b, s: (b, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, nz, n_lane), lambda b, s: (b, s, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, nz, n_lane), lambda b, s: (b, s, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )(cf_part, uf)

    # diag+4 | 5 | 4 offsets: each call holds <= 5 coefficient planes resident,
    # which fits VMEM with pipelining headroom even inside large CG programs.
    out = (
        call(cf[:, :5], tuple(POS_OFFSETS[:4]), True)
        + call(cf[:, 5:10], tuple(POS_OFFSETS[4:9]), False)
        + call(cf[:, 10:], tuple(POS_OFFSETS[9:]), False)
    )

    if pad:
        out = out[..., :npr]
    return out.reshape(u.shape)
