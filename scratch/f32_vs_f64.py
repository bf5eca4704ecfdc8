"""Arithmetic-fidelity check: f32 production solve vs f64, same discretization.

BASELINE.md's north star asks for ~1e-6 relative potential parity of the solve
itself (the discretization accuracy is anchored separately by the independent
oracles). Ra = |K * delta-u| is a potential-level functional, so its f32/f64
relative difference IS the potential parity of the end-to-end solve.
"""
import sys
import numpy as np
sys.path.insert(0, "/root/repo")
from remo3d_tpu import Model

base = "/root/reference/Examples/Example_01"
tools = ["B5.7A0.4M", "A2.0M0.5N", "M1.0A0.1B", "M4.0A0.5B"]
depths = np.arange(5.0, 6.1, 0.2)

def run(dtype, tol):
    m = Model(tools)
    m.set_model_parameters(base + "/Input/Formation.txt", base + "/Input/Borehole.txt")
    m.initialize_workers(cpu_workers=1)
    m.simulate_logs(depths, platform="cpu", verbose=False, dtype=dtype, tol=tol,
                    executor_overrides={"chunk_size": 8, "preconditioner": "direct"})
    return {t: np.array(v[:, 1]) for t, v in m.logs.items()}

f64 = run("float64", 1e-12)
f32 = run("float32", 3e-7)
worst = 0.0
for t in tools:
    rel = np.abs(f32[t] / f64[t] - 1)
    print(f"{t}: max {rel.max():.2e} mean {rel.mean():.2e}", flush=True)
    worst = max(worst, rel.max())
print(f"WORST f32-vs-f64 relative Ra (potential-level) diff: {worst:.2e}", flush=True)
