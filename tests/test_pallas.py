# -*- coding: utf-8 -*-
"""Pallas kernel parity vs the XLA paths (interpreter on CPU).

The production 3D stencil kernel (ops/pallas_stencil.py — the default CG
operator on accelerators, runtime.py dispatch) is tested BY DEFAULT on a small
grid; the interpreter run costs a few seconds and is pinned to the CPU device.
On real TPU hardware the kernel is bit-exact vs the XLA path (verified on v5e).
"""

import jax
import jax.numpy as jnp
import numpy as np

from remo3d_tpu.ops.stencil import stencil_apply
from remo3d_tpu.ops.stencil3d import entry_index, stencil3d_apply


def _random_symmetric_stencil_2d(rng, B, NZ, NR):
    """Random 9-point stencil with FEM symmetry C[n, d] == C[n+d, -d] and zero
    coupling across the grid boundary."""
    C = np.zeros((B, NZ, NR, 3, 3), dtype=np.float32)
    C[..., 1, 1] = 10.0 + rng.random((B, NZ, NR))
    for dz, dr in [(0, 1), (1, -1), (1, 0), (1, 1)]:
        h = rng.standard_normal((B, NZ, NR)).astype(np.float32)
        sl = [slice(None)] * 3
        for ax, d, n in ((1, dz, NZ), (2, dr, NR)):
            if d > 0:
                sl[ax] = slice(0, n - d)
            elif d < 0:
                sl[ax] = slice(-d, n)
        mask = np.zeros((B, NZ, NR), dtype=bool)
        mask[tuple(sl)] = True
        h *= mask
        C[..., 1 + dz, 1 + dr] = h
        hm = np.zeros_like(h)
        src = [slice(None)] * 3
        dst = [slice(None)] * 3
        for ax, d, n in ((1, dz, NZ), (2, dr, NR)):
            if d > 0:
                src[ax], dst[ax] = slice(0, n - d), slice(d, n)
            elif d < 0:
                src[ax], dst[ax] = slice(-d, n), slice(0, n + d)
        hm[tuple(dst)] = h[tuple(src)]
        C[..., 1 - dz, 1 - dr] = hm
    return C


def test_pallas_stencil2d_matches_xla_apply():
    """The 2D half-plane stencil kernel (the default 2D CG/MG operator on
    accelerators) vs the plain XLA 9-point apply, via the Pallas interpreter.
    Pinned to CPU (remote-compile avoidance, see the 3D test)."""
    from unittest import mock

    from jax.experimental import pallas as pl

    from remo3d_tpu.ops import pallas_stencil2d

    rng = np.random.default_rng(11)
    B, S, NZ, NR = 1, 2, 7, 5
    with jax.default_device(jax.devices("cpu")[0]):
        C = jnp.asarray(_random_symmetric_stencil_2d(rng, B, NZ, NR))
        u = jnp.asarray(rng.standard_normal((B, S, NZ, NR)).astype(np.float32))

        ref = stencil_apply(C, u)
        C_half = pallas_stencil2d.half_planes_2d(C)

        orig = pl.pallas_call
        with mock.patch.object(
            pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True})
        ):
            out = pallas_stencil2d.stencil_apply_pallas_2d(C_half, u, n_solves=S)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-5
        )


def _random_symmetric_stencil(rng, B, NZ, NP, NR):
    """Random 27-point stencil with FEM symmetry C[n, d] == C[n+d, -d] and
    zero coupling across the grid boundary (the structure half_planes assumes)."""
    C = np.zeros((B, NZ, NP, NR, 27), dtype=np.float32)
    C[..., entry_index(0, 0, 0)] = 10.0 + rng.random((B, NZ, NP, NR))
    offs = [
        (dz, dp, dr)
        for dz in (-1, 0, 1)
        for dp in (-1, 0, 1)
        for dr in (-1, 0, 1)
        if (dz, dp, dr) > (0, 0, 0)
    ]
    for dz, dp, dr in offs:
        h = rng.standard_normal((B, NZ, NP, NR)).astype(np.float32)
        # Zero the entries whose +d neighbor would fall outside the grid.
        sl = [slice(None)] * 4
        for ax, d, n in ((1, dz, NZ), (2, dp, NP), (3, dr, NR)):
            if d > 0:
                sl[ax] = slice(0, n - d)
            elif d < 0:
                sl[ax] = slice(-d, n)
        mask = np.zeros((B, NZ, NP, NR), dtype=bool)
        mask[tuple(sl)] = True
        h *= mask
        C[..., entry_index(dz, dp, dr)] = h
        # Mirror: the coupling seen from the neighbor node.
        hm = np.zeros_like(h)
        src = [slice(None)] * 4
        dst = [slice(None)] * 4
        for ax, d, n in ((1, dz, NZ), (2, dp, NP), (3, dr, NR)):
            if d > 0:
                src[ax], dst[ax] = slice(0, n - d), slice(d, n)
            elif d < 0:
                src[ax], dst[ax] = slice(-d, n), slice(0, n + d)
        hm[tuple(dst)] = h[tuple(src)]
        C[..., entry_index(-dz, -dp, -dr)] = hm
    return C


def test_pallas_stencil3d_matches_xla_apply():
    """The production symmetric half-plane stencil kernel (the default 3D CG
    matvec on accelerators) vs the plain XLA 27-plane apply, via the Pallas
    interpreter. Runs by default — this is the hot operator of the 3D path.
    Pinned to CPU: on the remote-TPU (axon) host every un-jitted op would
    otherwise dispatch a remote compile."""
    from unittest import mock

    from jax.experimental import pallas as pl

    from remo3d_tpu.ops import pallas_stencil

    rng = np.random.default_rng(7)
    B, S, NZ, NP, NR = 1, 2, 6, 3, 5
    with jax.default_device(jax.devices("cpu")[0]):
        C = jnp.asarray(_random_symmetric_stencil(rng, B, NZ, NP, NR))
        u = jnp.asarray(rng.standard_normal((B, S, NZ, NP, NR)).astype(np.float32))

        ref = stencil3d_apply(C, u)
        C_half = pallas_stencil.half_planes(C)

        orig = pl.pallas_call
        with mock.patch.object(
            pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True})
        ):
            # Auto slab choice (ZB=1 at this size) AND a forced 2-row chunk
            # (ZB=3) so the halo'd z-tiling path is exercised even though the
            # test grid is far below the VMEM budget.
            slabs_auto = pallas_stencil.stage_half_plane_slabs(C_half, np_=NP, nr=NR)
            out = pallas_stencil.stencil3d_apply_pallas(slabs_auto, u, n_solves=S)
            slabs_tiled = pallas_stencil.stage_half_plane_slabs(
                C_half, np_=NP, nr=NR, nz_chunk=2
            )
            assert slabs_tiled.shape[1] == 3  # ZB
            out_tiled = pallas_stencil.stencil3d_apply_pallas(
                slabs_tiled, u, n_solves=S
            )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_tiled), np.asarray(ref), rtol=2e-5, atol=1e-5
        )


def test_pallas_stencil3d_slab_padded_tail():
    """Slabbed apply with zb*nzc > nz (padded tail slab) — the production
    high_dip shape is nz=257, nzc picked by budget, tail slab part-empty; the
    base test above only covers zfull == nz. Rows past the grid are zero-padded
    in staging, so the tail halo must contribute exactly nothing."""
    from unittest import mock

    from jax.experimental import pallas as pl

    from remo3d_tpu.ops import pallas_stencil

    rng = np.random.default_rng(11)
    B, S, NP, NR = 1, 2, 3, 5
    with jax.default_device(jax.devices("cpu")[0]):
        orig = pl.pallas_call
        for NZ, chunk in [(7, 2), (11, 4), (9, 8)]:  # zb*nzc = 8/12/16 > nz
            C = jnp.asarray(_random_symmetric_stencil(rng, B, NZ, NP, NR))
            u = jnp.asarray(rng.standard_normal((B, S, NZ, NP, NR)).astype(np.float32))
            ref = stencil3d_apply(C, u)
            C_half = pallas_stencil.half_planes(C)
            with mock.patch.object(
                pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True})
            ):
                slabs = pallas_stencil.stage_half_plane_slabs(
                    C_half, np_=NP, nr=NR, nz_chunk=chunk
                )
                out = pallas_stencil.stencil3d_apply_pallas(slabs, u, n_solves=S)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-5
            )


def test_stencil3d_slab_chunking():
    """The z-slab chooser keeps every slab under the measured VMEM budget and
    tiles the refined grids that crashed round 4's un-tiled kernel (280k
    remote-compiler cliff) instead of rejecting them."""
    from remo3d_tpu.ops.pallas_stencil import (
        SLAB_BUDGET_FLOATS,
        choose_nz_chunk,
        padded_lanes,
    )

    assert padded_lanes(17, 49) == 896  # default grid: 833 -> 896 (pad 63 >= 50)
    assert padded_lanes(25, 49) == 1280  # accurate(): 1225 -> 1280 (pad 55 >= 50)
    assert padded_lanes(17, 65) == 1280  # 1105 -> 1152 pad 47 < 66 -> +128
    # The default grid stays single-slab (no tiling overhead); accurate()
    # (193x25x49 = 247k floats/plane) tiles into 2 slabs under the measured
    # 200k budget — at 247k the pipelined (B=2, S=8) program's scoped-VMEM
    # stack overflowed 16M (17.58M, scratch/repro_stencil3d_tiled.py).
    assert choose_nz_chunk(193, 17, 49) == (193, 1)
    nzc_acc, zb_acc = choose_nz_chunk(193, 25, 49)
    assert zb_acc == 2 and (nzc_acc + 2) * padded_lanes(25, 49) <= SLAB_BUDGET_FLOATS
    # Grids past the round-4 cliff now tile; every slab fits the budget and
    # the slabs cover the grid with a few percent of padding at most.
    for nz, np_, nr in [(257, 17, 65), (257, 25, 65), (321, 17, 81)]:
        nzc, zb = choose_nz_chunk(nz, np_, nr)
        assert zb > 1
        assert (nzc + 2) * padded_lanes(np_, nr) <= SLAB_BUDGET_FLOATS
        assert zb * nzc >= nz
        assert zb * nzc <= nz + nzc  # bounded padding waste
