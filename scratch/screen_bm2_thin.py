# -*- coding: utf-8 -*-
"""Screen radial-refinement candidates for the thin-invaded-annulus rule.

VERDICT r4 item 3: the 0.2 m invasion annulus of BM2 (thickness ~0.09 m over
the sinusoidal caliper's wall) sits at 2.35% max vs the FV-anchored 2D solver
on the default 3D grid — radially under-resolved (3D h_min_radial=0.03 vs the
2D anchor's 0.008). This screens candidate specs on the bm2_dip_oracle (b)
gate (3D dip->0 vs 2D, 5 spot depths) + their pts/s cost, to pick the
auto-selected thin-invasion refinement.

Usage: python scratch/screen_bm2_thin.py [variant ...]
"""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

from benchmarks.bm2_dip_oracle import SPOT_DEPTHS, fem_log
from remo3d_tpu.meshing.grid3d import GridSpec3D

D = GridSpec3D()
AUTO = dataclasses.replace(D, nr=65, fz_h_radial=0.085 / 4)  # the shipped anchor-local rule
# (spec_or_None, simulate_logs extra kwargs). The *_nostencil variants
# disambiguate the z=20 shoulder regression (0.66% stock -> 2.09% auto):
# the auto grid is strictly FINER radially, but at nr=65 (213k nodes) the
# z-tiled Pallas stencil kernel activates where the stock grid used the
# round-4 untiled kernel — if nostencil recovers the shoulder, the slab
# kernel computes a wrong operator at slabbed shapes.
VARIANTS = {
    "default": None,
    "default_nostencil": (None, {"executor_overrides": {"use_pallas_stencil": False}}),
    # z=20 reads 13.15 ohmm vs 59-169 elsewhere — the smallest amplitude is
    # where leftover CG residual surfaces first; tighter tol disambiguates.
    "default_tol8": (None, {"executor_overrides": {"tol": 1e-8, "maxiter": 3000}}),
    "stock": D,  # explicit default spec — bypasses the thin-annulus auto-refine
    "stock_nostencil": (D, {"executor_overrides": {"use_pallas_stencil": False}}),
    "auto_nr49": dataclasses.replace(AUTO, nr=49),
    "auto_s50": dataclasses.replace(AUTO, slope_radial=0.5),
    "auto_np25": dataclasses.replace(AUTO, np_=25),
    "auto_nz257": dataclasses.replace(AUTO, nz=257),
    "nr65": dataclasses.replace(D, nr=65),
    "nr65_h015": dataclasses.replace(D, nr=65, h_min_radial=0.015),
    "nr65_h012_s35": dataclasses.replace(
        D, nr=65, h_min_radial=0.012, slope_radial=0.35
    ),
    "nr81_h010_s25": dataclasses.replace(
        D, nr=81, h_min_radial=0.010, slope_radial=0.25
    ),
    "h015_only": dataclasses.replace(D, h_min_radial=0.015),
    "wall8": dataclasses.replace(D, nr=65, h_min_radial=0.015, n_wall_cells=8,
                                 n_blend_cells=4),
}


ANCHOR_CACHE = "/tmp/bm2_thin_anchor.npy"


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or list(VARIANTS)
    if os.path.exists(ANCHOR_CACHE):
        fem2d = np.load(ANCHOR_CACHE)
        print(f"2D anchor (cached): {np.round(fem2d, 4)}", flush=True)
    else:
        t0 = time.time()
        fem2d = fem_log(0.0, SPOT_DEPTHS)
        np.save(ANCHOR_CACHE, fem2d)
        print(f"2D anchor: {np.round(fem2d, 4)}  [{time.time()-t0:.0f}s]", flush=True)
    for name in names:
        spec = VARIANTS[name]
        kw = {}
        if isinstance(spec, tuple):
            spec, kw = spec
        t0 = time.time()
        f3 = fem_log(1e-3, SPOT_DEPTHS, grid_spec3d=spec, **kw)
        el = time.time() - t0
        gap = np.abs(f3 / fem2d - 1) * 100
        print(
            f"[{name:16s}] max {gap.max():5.2f}%  per-depth "
            f"{np.round(gap, 2)}  [{el:.0f}s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
