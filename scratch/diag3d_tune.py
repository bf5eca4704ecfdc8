# Scan GridSpec3D variants + tol on BM3 dip=30: values, drift vs baseline, warm time.
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from remo3d_tpu import Model
from remo3d_tpu.meshing.grid3d import GridSpec3D

BM = "/root/reference/Examples/Benchmark models"
depths = np.arange(10.0, 12.01, 0.25)

variants = {
    "base": (GridSpec3D(), 3e-7),
    "tol1e-5": (GridSpec3D(), 1e-5),
    "np9": (GridSpec3D(np_=9), 3e-7),
    "nz161_np13_nr41": (GridSpec3D(nz=161, np_=13, nr=41), 3e-7),
    "nz161_np9_nr41": (GridSpec3D(nz=161, np_=9, nr=41), 3e-7),
    "nz129_np9_nr33": (GridSpec3D(nz=129, np_=9, nr=33), 3e-7),
}
names = sys.argv[1:] if len(sys.argv) > 1 else list(variants)

base_vals = None
for name in names:
    spec, tol = variants[name]
    m = Model(["A2.0M0.5N"])
    m.set_model_parameters(
        os.path.join(BM, "Benchmark model 3", "Formation_BM3_30.txt"),
        os.path.join(BM, "Benchmark model 3", "Borehole_BM3.txt"),
        dip=30,
    )
    m.initialize_workers()
    m.simulate_logs(depths, grid_spec3d=spec, tol=tol, verbose=False)  # warm-up/compile
    t0 = time.time()
    m.simulate_logs(depths, grid_spec3d=spec, tol=tol, verbose=False)
    el = time.time() - t0
    vals = m.logs["A2.0M0.5N"][:, 1]
    if base_vals is None:
        base_vals = vals
        print(f"{name:>18}: {el:6.1f}s  vals {np.array2string(vals, precision=3)}")
    else:
        drift = np.nanmax(np.abs(vals / base_vals - 1)) * 100
        print(f"{name:>18}: {el:6.1f}s  max drift {drift:.3f}%  nan={np.isnan(vals).sum()}")
