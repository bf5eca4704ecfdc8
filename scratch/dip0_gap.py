# -*- coding: utf-8 -*-
"""dip->0 consistency gap vs 3D grid resolution (VERDICT r2 weak #4).

At dip ~ 0 the 3D problem is axisymmetric, so the azimuth count is
irrelevant and the 3D-vs-2D gap isolates the z/r discretization mismatch
against the much finer 2D grid (761x161 vs the 3D default 193x_x49). This
sweep measures how (nz, nr) refinement closes the gap on the BM3 stack —
the direct 3D preconditioner (4 CG iterations) makes it CPU-feasible.

Usage: python scratch/dip0_gap.py [nz,nr ...]   (default sweep below)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")  # never claim an attached TPU
import numpy as np

from remo3d_tpu import Model
from remo3d_tpu.meshing.grid3d import GridSpec3D

BM = "/root/reference/Examples/Benchmark models/Benchmark model 3"
TOOL = "A2.0M0.5N"
DEPTHS = np.array([8.0, 10.0, 11.5, 12.5, 13.5, 15.0, 17.0])


def run2d():
    m = Model([TOOL])
    m.set_model_parameters(os.path.join(BM, "Formation_BM3_00.txt"),
                           os.path.join(BM, "Borehole_BM3.txt"))
    m.initialize_workers()
    m.simulate_logs(DEPTHS, platform="cpu", verbose=False)
    return m.logs[TOOL][:, 1]


def run3d(nz, nr, np_=9):
    m = Model([TOOL])
    m.set_model_parameters(os.path.join(BM, "Formation_BM3_00.txt"),
                           os.path.join(BM, "Borehole_BM3.txt"), dip=1e-3)
    m.initialize_workers()
    m.simulate_logs(
        DEPTHS, platform="cpu", verbose=False,
        grid_spec3d=GridSpec3D(nz=nz, np_=np_, nr=nr),
        # 2 tasks -> chunk 2 (not padded to 8): 4x less factorization work.
        executor_overrides={"chunk_size_3d": 2},
    )
    return m.logs[TOOL][:, 1]


def main():
    sweep = [(193, 49), (257, 65), (321, 81)]
    if len(sys.argv) > 1:
        sweep = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]]
    t0 = time.time()
    v2 = run2d()
    print(f"2D (761x161 default): {np.round(v2, 4)}  [{time.time()-t0:.0f}s]")
    for nz, nr in sweep:
        t0 = time.time()
        v3 = run3d(nz, nr)
        gap = np.abs(v3 / v2 - 1)
        print(
            f"3D nz={nz} nr={nr} np_=9: max gap {gap.max()*100:.2f}%  "
            f"mean {gap.mean()*100:.2f}%  [{time.time()-t0:.0f}s]"
        )


if __name__ == "__main__":
    main()
