# -*- coding: utf-8 -*-
"""Isolated TPU driver for the z-tiled half-plane stencil kernel.

Runs stage_half_plane_slabs + stencil3d_apply_pallas at a chosen grid shape
against the XLA 27-plane apply, so compile failures localize to the kernel
rather than the full CG program.

Usage: python scratch/repro_stencil3d_tiled.py [B S NZ NP NR [nz_chunk]]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from remo3d_tpu.ops import pallas_stencil
from remo3d_tpu.ops.stencil3d import stencil3d_apply


def main(B=1, S=2, NZ=257, NP=25, NR=65, nz_chunk=None):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_pallas import _random_symmetric_stencil

    rng = np.random.default_rng(3)
    C = jnp.asarray(_random_symmetric_stencil(rng, B, NZ, NP, NR))
    u = jnp.asarray(rng.standard_normal((B, S, NZ, NP, NR)).astype(np.float32))
    nzc, zb = pallas_stencil.choose_nz_chunk(NZ, NP, NR)
    print(
        f"shape B{B} S{S} {NZ}x{NP}x{NR}  n_lane {pallas_stencil.padded_lanes(NP, NR)}"
        f"  auto chunk (nzc {nzc}, ZB {zb})  forced {nz_chunk}",
        flush=True,
    )
    C_half = pallas_stencil.half_planes(C)
    slabs = pallas_stencil.stage_half_plane_slabs(
        C_half, np_=NP, nr=NR, nz_chunk=nz_chunk
    )
    print(f"slabs {slabs.shape} — launching kernel...", flush=True)
    out = np.asarray(pallas_stencil.stencil3d_apply_pallas(slabs, u, n_solves=S))
    ref = np.asarray(stencil3d_apply(C, u))
    err = np.max(np.abs(out - ref)) / max(np.max(np.abs(ref)), 1e-30)
    print(f"OK  max rel err vs XLA apply: {err:.2e}", flush=True)


if __name__ == "__main__":
    args = [int(x) for x in sys.argv[1:]]
    main(*args)
