# -*- coding: utf-8 -*-
"""3D invasion-zone + varying-caliper gate (CPU, coarse grid).

The last untested corner of the physics surface (VERDICT r3 item 5): a dipping
model with INVASION ZONES and a depth-VARYING borehole wall. The reference
meshes 3D invasion half-cylinders (remo3d/gmsh_functions.py:625-629) and a
caliper-following wall (gmsh_functions.py:33-88); our grid3d implements both
(meshing/grid3d.py:249-258 per-(i,j) wall + invasion snapping).

Model: BM2's invaded beds with a sinusoidal +-15% caliper
(benchmarks/bm2_dip_oracle.py). Gate: the 3D path at dip=1e-3 (which exercises
the FULL 3D machinery) against the 2D axisymmetric solver on the SAME model —
the 2D solver is itself anchored to the f64 FV oracle with the same varying
wall (production-grid numbers: 2D-vs-FV worst 0.21%, 3D-vs-2D 2.35% max on the
default grid, recorded in README).

Coarse-grid CPU expectations (measured): shoulder and the 0.5 m-radius invaded
bed ~1.0%, the THIN 0.2 m-radius invaded bed 5.6% (its one-cell-thick annulus
at nr=33 is purely radial-resolution limited; the production grid more than
halves it).
"""

import numpy as np

from benchmarks.bm2_dip_oracle import fem_log
from remo3d_tpu.meshing.grid3d import GridSpec3D

DEPTHS = np.array([20.0, 50.0])  # thin-FZ bed mid, 0.5 m-FZ bed mid


def test_bm2_dip_varying_caliper_matches_2d_on_cpu():
    f2 = fem_log(0.0, DEPTHS, platform="cpu")
    f3 = fem_log(
        1e-3,
        DEPTHS,
        platform="cpu",
        tol=1e-6,
        grid_spec3d=GridSpec3D(nz=97, np_=9, nr=33, n_wall_cells=4, n_blend_cells=2),
        executor_overrides={"chunk_size_3d": 1},
    )
    assert np.all(np.isfinite(f2)) and np.all(np.isfinite(f3))
    gap = np.abs(f3 / f2 - 1)
    # Thin 0.2 m invaded annulus: radial-resolution limited (measured 3.71%
    # on the current grids; the round-4 comment recorded 5.55%).
    assert gap[0] < 0.08, gap
    # 0.5 m invaded bed: comfortably resolved (measured 0.73%).
    assert gap[1] < 0.02, gap

    # The thin-annulus ANCHOR-LOCAL refinement (fz_h_radial + a modest nr
    # bump, the auto rule's mechanism) must improve BOTH beds — the round-5
    # finding is that the station pattern near the invasion radii, not raw
    # count, controls the error: a plain nr=41 bump regresses the 0.5 m bed
    # to 3.4% while nr=41 + fz_h_radial=0.02 measures [3.31, 0.53]% vs the
    # stock grid's [3.71, 0.73]% (scratch/screen_bm2_thin.py; the spec
    # mirrors the production rule's nr 49->65 + thin-anchor h proportions).
    f3r = fem_log(
        1e-3,
        DEPTHS,
        platform="cpu",
        tol=1e-6,
        grid_spec3d=GridSpec3D(
            nz=97, np_=9, nr=41, n_wall_cells=4, n_blend_cells=2, fz_h_radial=0.02
        ),
        executor_overrides={"chunk_size_3d": 1},
    )
    gap_r = np.abs(f3r / f2 - 1)
    assert gap_r[0] < 0.045, gap_r      # thin bed (measured 3.31%)
    assert gap_r[0] < gap[0], (gap_r, gap)
    assert gap_r[1] < 0.008, gap_r      # resolved bed: no collateral (measured 0.53%)
