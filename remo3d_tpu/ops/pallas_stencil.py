# -*- coding: utf-8 -*-
"""Pallas TPU kernel: symmetric-storage 27-point stencil apply (z-tiled).

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
sublane shifts.

Z-TILING (round 5): the axial axis is cut into ``ZB`` slabs of ``nzc`` rows
with one halo row on each side, sized by :func:`choose_nz_chunk` so the
VMEM-resident working set stays under the measured v5e cliff at ANY grid size
(round 4's un-tiled kernel required the full (NZ, n_lane) plane resident and
crashed the remote compiler past nz*n_lane = 280k floats — exactly the
refined-meridian grids the dip-aware auto-select picks). Coefficient slabs are
staged ONCE per chunk (:func:`stage_half_plane_slabs`, loop-invariant — called
outside the CG while_loop); per apply only the u slab gather is rebuilt. The
grid is (B, ZB, S) with the solve axis innermost and a coefficient index map
constant over S, so Mosaic keeps each C slab resident across the S inner steps
— per-iteration C traffic stays ~14/27 of the XLA apply independent of NZ.
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

# VMEM budget per (slab rows x n_lane) plane, in f32 elements. Measured on
# v5e (round 5, scratch/repro_stencil3d_tiled.py): at 247k floats/plane the
# kernel compiles for small grids (B=1, S=2) but the pipelined program's
# scoped-VMEM stack hits 17.58M vs the 16M limit once the (B, ZB, S) grid is
# large enough for full double-buffering (B=2, S=8) — i.e. the working set is
# ~17.8 plane-equivalents (5 C planes + u + out, each double-buffered, plus
# scratch). 200k keeps the worst case near 14M with margin.
SLAB_BUDGET_FLOATS = 200_000


def half_planes(C):
    """(..., NZ, NP, NR, 27) stencil -> (..., 14, NZ, NP*NR) half storage."""
    sel = jnp.stack([C[..., e] for e in HALF_ENTRIES], axis=-4)
    shp = sel.shape
    return sel.reshape(shp[:-2] + (shp[-2] * shp[-1],))


def _shift2(x, dz: int, dlane: int, nrows: int):
    """Shift x (nrows, L) by +dz sublanes (zero fill) and +dlane lanes.

    Lane shifts use a CIRCULAR roll (Mosaic cannot concatenate on the lane
    dimension): the caller guarantees >= |dlane| zero-padded lanes at the end
    of the array, so the wrapped values are zeros and the roll is equivalent
    to a zero-fill shift.
    """
    from jax.experimental.pallas import tpu as pltpu

    if dz > 0:
        x = jnp.pad(x, ((dz, 0), (0, 0)))[:nrows]
    elif dz < 0:
        x = jnp.pad(x, ((0, -dz), (0, 0)))[-dz:]
    if dlane != 0:
        x = pltpu.roll(x, dlane % x.shape[-1], 1)  # roll requires shift >= 0
    return x


def _kernel(nrows, np_, nr, n_lane, offsets, with_diag, c_ref, u_ref, o_ref):
    """One (batch, z-slab, solve) step on an (nrows, n_lane) slab.

    The slab carries one halo row on each side; axial (dz) shifts zero-fill at
    the slab edges, which only corrupts the halo OUTPUT rows — the caller
    discards them, and every interior row sees its true +/-1 neighbors.
    """
    # Lane-coordinate decode for the edge masks (lanes flatten (p, r)).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_lane), 1)
    p = lane // nr
    r = lane - p * nr

    def mask(dp, dr):
        # Valid iff the neighbor (p+dp, r+dr) exists (no lane wrap, no padding).
        ok = (r + dr >= 0) & (r + dr < nr) & (p + dp >= 0) & (p + dp < np_)
        return (ok & (p < np_)).astype(jnp.float32)

    u = u_ref[0, 0, 0]
    if with_diag:
        y = c_ref[0, 0, 0] * u
        k0 = 1
    else:
        y = jnp.zeros_like(u)
        k0 = 0
    for k, (dz, dp, dr) in enumerate(offsets):
        cplane = c_ref[0, 0, k + k0]
        s = dp * nr + dr
        # u(n+d): pull from lane+s; valid where the +d neighbor exists.
        up = _shift2(u, -dz, -s, nrows) * mask(dp, dr)
        y = y + cplane * up
        # mirrored coupling: scatter C_d(n)*u(n) to n+d; at the destination m
        # the -d neighbor (the origin) must exist.
        t = cplane * u
        y = y + _shift2(t, dz, s, nrows) * mask(-dp, -dr)
    o_ref[0, 0, 0] = y


def padded_lanes(np_: int, nr: int, lanes: int = 128) -> int:
    """Lane extent of the kernel's flattened (NP, NR) axis (see apply below)."""
    npr = np_ * nr
    n_lane = -(-npr // lanes) * lanes
    if n_lane - npr < nr + 1:  # circular lane rolls need >= nr+1 zero lanes
        n_lane += lanes
    return n_lane


def choose_nz_chunk(nz: int, np_: int, nr: int) -> tuple[int, int]:
    """Pick the z-slab extent: returns (nzc, ZB) with ZB*nzc >= nz.

    Slabs satisfy ``(nzc+2) * padded_lanes <= SLAB_BUDGET_FLOATS`` so the
    per-step VMEM working set fits at any grid size (this REPLACES round 4's
    ``fits_tpu_vmem`` hard fallback: grids past the old 280k cliff now tile
    instead of dropping to the XLA 27-plane apply). Within the budget the
    slab count is minimized and the extent balanced so zero-padding waste
    stays a few percent.
    """
    def ceil_div(a, b):
        return -(-a // b)

    n_lane = padded_lanes(np_, nr)
    max_rows = max(SLAB_BUDGET_FLOATS // n_lane, 24)
    if nz + 2 <= max_rows:
        return nz, 1
    zb = ceil_div(nz, max_rows - 2)
    while True:
        # Balanced slab extent rounded up to whole sublanes; if the round-up
        # pushes the slab past the budget, add a slab instead.
        nzc = ceil_div(ceil_div(nz, zb), 8) * 8
        if nzc + 2 <= max_rows or zb >= nz:
            break
        zb += 1
    return nzc, ceil_div(nz, nzc)


@partial(jax.jit, static_argnames=("np_", "nr", "nz_chunk"))
def stage_half_plane_slabs(C_half, *, np_: int, nr: int, nz_chunk: int | None = None):
    """(B, 14, NZ, NP*NR) half storage -> (B, ZB, 14, nzc+2, n_lane) z-slabs.

    Loop-invariant: call ONCE per assembled operator (outside the CG loop).
    Slab i covers global rows [i*nzc - 1, i*nzc + nzc] (one halo row each
    side); rows past the grid and the lane tail are zero-padded, so halo
    contributions at the global edges vanish exactly like the un-tiled
    kernel's zero-fill shifts.
    """
    B = C_half.shape[0]
    nz, npr = C_half.shape[-2], C_half.shape[-1]
    assert npr == np_ * nr, (npr, np_, nr)
    n_lane = padded_lanes(np_, nr)
    if nz_chunk is None:
        nzc, zb = choose_nz_chunk(nz, np_, nr)
    else:
        nzc, zb = nz_chunk, -(-nz // nz_chunk)
    zfull = zb * nzc
    cf = jnp.pad(
        C_half, ((0, 0), (0, 0), (1, zfull + 1 - nz), (0, n_lane - npr))
    )
    slabs = jnp.stack(
        [cf[:, :, i * nzc : i * nzc + nzc + 2] for i in range(zb)], axis=1
    )
    return slabs  # (B, ZB, 14, nzc+2, n_lane)


@partial(jax.jit, static_argnames=("n_solves",))
def stencil3d_apply_pallas(C_slabs, u, *, n_solves: int):
    """y = A u with z-tiled half-plane stencil storage.

    C_slabs: (B, ZB, 14, nzc+2, n_lane) from :func:`stage_half_plane_slabs`;
    u: (B, S, NZ, NP, NR).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S = u.shape[0], u.shape[1]
    assert S == n_solves
    nz, np_, nr = u.shape[-3], u.shape[-2], u.shape[-1]
    npr = np_ * nr
    zb = C_slabs.shape[1]
    nzc = C_slabs.shape[-2] - 2
    n_lane = C_slabs.shape[-1]
    assert n_lane == padded_lanes(np_, nr), (n_lane, np_, nr)
    zfull = zb * nzc
    nrows = nzc + 2

    # Per-apply u slab gather (the only non-hoisted layout work): pad one halo
    # row in front and zeros out to ZB*nzc+2 rows / n_lane lanes, then window.
    uf = u.reshape(B, S, nz, npr)
    uf = jnp.pad(uf, ((0, 0), (0, 0), (1, zfull + 1 - nz), (0, n_lane - npr)))
    u_slabs = jnp.stack(
        [uf[:, :, i * nzc : i * nzc + nrows] for i in range(zb)], axis=2
    )  # (B, S, ZB, nzc+2, n_lane)

    # Grid (B, ZB, S): the solve axis is innermost and the coefficient index
    # map is constant over it, so Mosaic keeps each C slab resident across the
    # S inner steps. Three calls of <= 5 coefficient planes each keep the
    # per-step VMEM footprint under the measured budget (choose_nz_chunk).
    def call(cf_part, offsets, with_diag):
        n_planes = cf_part.shape[2]
        return pl.pallas_call(
            partial(_kernel, nrows, np_, nr, n_lane, offsets, with_diag),
            out_shape=jax.ShapeDtypeStruct(u_slabs.shape, u_slabs.dtype),
            grid=(B, zb, S),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, n_planes, nrows, n_lane),
                    lambda b, z, s: (b, z, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, 1, nrows, n_lane),
                    lambda b, z, s: (b, s, z, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, 1, nrows, n_lane),
                lambda b, z, s: (b, s, z, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )(cf_part, u_slabs)

    # diag+4 | 5 | 4 offsets per call.
    out = (
        call(C_slabs[:, :, :5], tuple(POS_OFFSETS[:4]), True)
        + call(C_slabs[:, :, 5:10], tuple(POS_OFFSETS[4:9]), False)
        + call(C_slabs[:, :, 10:], tuple(POS_OFFSETS[9:]), False)
    )

    # Drop the halo rows, unwindow, trim the z/lane padding.
    out = out[..., 1 : 1 + nzc, :].reshape(B, S, zfull, n_lane)
    return out[..., :nz, :npr].reshape(u.shape)
