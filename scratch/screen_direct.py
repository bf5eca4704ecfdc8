"""CPU screening: the block-direct preconditioner on the production 2D grid."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
from remo3d_tpu import Model

base = "/root/reference/Examples/Example_01"
depths = np.arange(0, 0.51, 0.1)
t0 = time.perf_counter()
m = Model(["B5.7A0.4M", "A2.0M0.5N"])
m.set_model_parameters(base + "/Input/Formation.txt", base + "/Input/Borehole.txt")
m.initialize_workers(cpu_workers=1)
m.simulate_logs(depths, platform="cpu", verbose=False,
                executor_overrides={"chunk_size": 4, "preconditioner": "direct"})
rep = m._executor.last_report
iters = [c["iterations"] for c in rep["chunks"]]
worst = max(c["worst_residual"] for c in rep["chunks"])
nan = sum(int(np.isnan(v[:, 1]).sum()) for v in m.logs.values())
logs_direct = {k: np.array(v) for k, v in m.logs.items()}
print(f"[direct] iters {iters} worst {worst:.2e} nan {nan} wall {time.perf_counter()-t0:.0f}s", flush=True)

# Cross-check values vs the multigrid path (same depths).
m2 = Model(["B5.7A0.4M", "A2.0M0.5N"])
m2.set_model_parameters(base + "/Input/Formation.txt", base + "/Input/Borehole.txt")
m2.initialize_workers(cpu_workers=1)
m2.simulate_logs(depths, platform="cpu", verbose=False,
                 executor_overrides={"chunk_size": 4})
rel = max(
    float(np.nanmax(np.abs(logs_direct[k][:, 1] - np.array(v)[:, 1]) / np.abs(np.array(v)[:, 1])))
    for k, v in m2.logs.items()
)
print(f"[direct-vs-mg] max rel diff {rel:.2e}", flush=True)
