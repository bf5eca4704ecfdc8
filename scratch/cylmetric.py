# -*- coding: utf-8 -*-
"""Cylindrical vs Cartesian 3D assembly metric: dip->0 gap at coarse azimuth.

The cylindrical metric makes the discrete domain the exact solid of revolution
(ops/assembly3d.py) — azimuth then carries only interpolation error, which
vanishes for the axisymmetric component. Measured against the independent 2D
axisymmetric solver on the BM3 stack at dip ~ 0.

Usage: python scratch/cylmetric.py [np_ ...]   (default 9)
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
V2D = np.array([11.8358, 10.4425, 18.0425, 34.4703, 123.1659, 43.6761, 15.1487])


def run3d(np_, metric3d):
    m = Model([TOOL])
    m.set_model_parameters(os.path.join(BM, "Formation_BM3_00.txt"),
                           os.path.join(BM, "Borehole_BM3.txt"), dip=1e-3)
    m.initialize_workers()
    m.simulate_logs(
        DEPTHS, platform="cpu", verbose=False,
        grid_spec3d=GridSpec3D(np_=np_),
        executor_overrides={"chunk_size_3d": 2, "metric3d": metric3d},
    )
    return m.logs[TOOL][:, 1]


def main():
    nps = [int(a) for a in sys.argv[1:]] or [9]
    for np_ in nps:
        for metric in ("cartesian", "cylindrical"):
            t0 = time.time()
            v3 = run3d(np_, metric)
            gap = np.abs(v3 / V2D - 1)
            print(
                f"3D np_={np_:2d} {metric:11s}: max gap {gap.max()*100:.2f}%  "
                f"mean {gap.mean()*100:.2f}%  [{time.time()-t0:.0f}s]",
                flush=True,
            )


if __name__ == "__main__":
    main()
