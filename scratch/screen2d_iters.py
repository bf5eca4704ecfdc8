"""CPU screening of 2D MG smoother variants: CG iteration counts only.

Iteration counts are implementation-independent; this tells us which variants
are worth TPU wall-clock experiments (and which would crash-risk the service
for nothing).
"""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
from remo3d_tpu import Model

VARIANTS = {
    "base":   {},
    "d2":     {"mg_degree": 2},
    "t5":     {"mg_line_steps": 5},
    "t4":     {"mg_line_steps": 4},
    "d2t5":   {"mg_degree": 2, "mg_line_steps": 5},
    "d4":     {"mg_degree": 4},
}
base = "/root/reference/Examples/Example_01"
depths = np.arange(0, 0.51, 0.1)
for name, kw in VARIANTS.items():
    t0 = time.perf_counter()
    m = Model(["B5.7A0.4M", "A2.0M0.5N"])
    m.set_model_parameters(base + "/Input/Formation.txt", base + "/Input/Borehole.txt")
    m.initialize_workers(cpu_workers=1)
    m.simulate_logs(depths, platform="cpu", verbose=False,
                    executor_overrides={"chunk_size": 4, **kw})
    rep = m._executor.last_report
    iters = [c["iterations"] for c in rep["chunks"]]
    worst = max(c["worst_residual"] for c in rep["chunks"])
    nan = sum(int(np.isnan(v[:, 1]).sum()) for v in m.logs.values())
    print(f"[{name}] iters {iters} worst {worst:.2e} nan {nan} "
          f"wall {time.perf_counter()-t0:.0f}s", flush=True)
