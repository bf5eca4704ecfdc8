"""CPU screening: Schur fixed-point pass count on the production 2D grid.

The exact-scan direct path needs 4 CG iterations on Example_01 (761-line
graded grid); find the smallest pass count whose CG iteration count matches.
"""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
from remo3d_tpu import Model

base = "/root/reference/Examples/Example_01"
depths = np.arange(0, 0.51, 0.1)
ref_logs = None
for k in [int(a) for a in sys.argv[1:]] or [4, 8, 12]:
    t0 = time.perf_counter()
    m = Model(["B5.7A0.4M", "A2.0M0.5N"])
    m.set_model_parameters(base + "/Input/Formation.txt", base + "/Input/Borehole.txt")
    m.initialize_workers(cpu_workers=1)
    m.simulate_logs(depths, platform="cpu", verbose=False,
                    executor_overrides={"chunk_size": 4, "preconditioner": "direct",
                                        "direct_factor_passes": k})
    rep = m._executor.last_report
    iters = [c["iterations"] for c in rep["chunks"]]
    worst = max(c["worst_residual"] for c in rep["chunks"])
    nan = sum(int(np.isnan(v[:, 1]).sum()) for v in m.logs.values())
    logs = {kk: np.array(v) for kk, v in m.logs.items()}
    if ref_logs is None:
        ref_logs = logs
        rel = 0.0
    else:
        rel = max(float(np.nanmax(np.abs(logs[kk][:, 1] / ref_logs[kk][:, 1] - 1)))
                  for kk in logs)
    print(f"[fp k={k}] iters {iters} worst {worst:.2e} nan {nan} "
          f"rel-vs-first {rel:.2e} wall {time.perf_counter()-t0:.0f}s", flush=True)
