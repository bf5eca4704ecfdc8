# 3D accuracy oracles on TPU: uniform medium, dip->0 vs 2D, BM3 ladder slice.
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from remo3d_tpu import Model

which = sys.argv[1] if len(sys.argv) > 1 else "uniform"

TOOL = "A2.0M0.5N"
depths = np.arange(10.0, 12.01, 0.5)


def make_uniform(res=5.0, mud=5.0):
    formation = np.array([[-1000.0, 1000.0, np.nan, np.nan, res]])
    borehole = np.array([[-1000.0, 0.2, mud], [1000.0, 0.2, mud]])
    return formation, borehole


if which == "uniform":
    for mud in (5.0, 0.5):
        formation, borehole = make_uniform(5.0, mud)
        m = Model([TOOL])
        m.set_model_parameters(formation, borehole, dip=30)
        m.initialize_workers()
        m.simulate_logs(depths, verbose=False)
        vals = m.logs[TOOL][:, 1]
        print(f"uniform 5ohmm (mud {mud}): {vals}  err% {(vals/5.0-1)*100}")

elif which == "dip0":
    # Layered model, dip tiny -> must match the 2D axisymmetric solve.
    formation = np.array(
        [
            [-1000.0, 10.5, np.nan, np.nan, 10.0],
            [10.5, 11.5, np.nan, np.nan, 100.0],
            [11.5, 1000.0, np.nan, np.nan, 10.0],
        ]
    )
    borehole = np.array([[-1000.0, 0.2, 0.5], [1000.0, 0.2, 0.5]])
    m2 = Model([TOOL])
    m2.set_model_parameters(formation, borehole, dip=0)
    m2.initialize_workers()
    m2.simulate_logs(depths, verbose=False)
    v2 = m2.logs[TOOL][:, 1]

    m3 = Model([TOOL])
    m3.set_model_parameters(formation, borehole, dip=0.001)
    m3.initialize_workers()
    t0 = time.time()
    m3.simulate_logs(depths, verbose=False)
    v3 = m3.logs[TOOL][:, 1]
    print(f"2D: {v2}")
    print(f"3D(dip~0): {v3}  ({time.time()-t0:.0f}s)")
    print(f"rel diff %: {(v3/v2-1)*100}")
