# Thin-bed accuracy scan: GridSpec2D variants vs the committed Logs 1 golden.
import os
import sys
import time

import numpy as np

try:
    import remo3d_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from remo3d_tpu import Model
from remo3d_tpu.meshing.grid2d import GridSpec2D

TB = "/root/reference/Examples/Benchmark models/Thin-bedded model"
TOOLS = ["A0.4M6.0N", "A1.62M6.0N", "A4.0M0.5N", "A8.0M1.0N"]

variants = {
    "base": {},
    "nz1537": dict(nz=1537),
    "nz1537_b003": dict(nz=1537, h_min_boundary=0.03, slope_boundary=0.5),
    "nz1153_e001": dict(nz=1153, h_min_electrode=0.01, slope_electrode=0.25),
    "nr241": dict(nr=241),
    "tol1e-8": {},  # tol override below
}
names = sys.argv[1:] if len(sys.argv) > 1 else ["base", "nz1537"]

golden = np.loadtxt(os.path.join(TB, "Logs", "Logs 1", "Results_1.txt"), skiprows=2)
depths = golden[:, 0][:: int(os.environ.get("STRIDE", "3"))]
gsel = golden[:: int(os.environ.get("STRIDE", "3"))]

for name in names:
    kw = dict(variants[name])
    tol = 1e-8 if name == "tol1e-8" else None
    spec = GridSpec2D(**kw)
    m = Model(TOOLS)
    m.set_model_parameters(
        os.path.join(TB, "Formation", "Formation_model_1.txt"),
        os.path.join(TB, "Borehole", "Borehole_model_correct_rm.txt"),
    )
    m.initialize_workers()
    t0 = time.time()
    m.simulate_logs(depths, grid_spec=spec, tol=tol, verbose=False)
    el = time.time() - t0
    line = f"{name:>14} ({el:5.1f}s): "
    for j, t in enumerate(TOOLS):
        rel = np.abs(m.logs[t][:, 1] - gsel[:, 1 + j]) / gsel[:, 1 + j]
        line += f"{t.split('M')[0]}: {np.nanmax(rel)*100:5.2f}%  "
    print(line, flush=True)
