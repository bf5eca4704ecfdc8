"""3D arithmetic-fidelity: f32 production solve vs f64, BM3 dip=30, direct."""
import sys
import numpy as np
sys.path.insert(0, "/root/repo")
from remo3d_tpu import Model

bm = "/root/reference/Examples/Benchmark models"
depths = np.arange(14.0, 14.6, 0.25)  # 3 points in the dipping stack

def run(dtype, tol):
    m = Model(["A2.0M0.5N"])
    m.set_model_parameters(
        bm + "/Benchmark model 3/Formation_BM3_30.txt",
        bm + "/Benchmark model 3/Borehole_BM3.txt", dip=30)
    m.initialize_workers(cpu_workers=1)
    m.simulate_logs(depths, verbose=False, platform="cpu", dtype=dtype, tol=tol,
                    executor_overrides={"chunk_size_3d": 2, "precond3d": "direct"})
    worst = max(c["worst_residual"] for c in m._executor.last_report["chunks"])
    iters = [c["iterations"] for c in m._executor.last_report["chunks"]]
    print(f"  [{dtype}] iters {iters} worst {worst:.2e}", flush=True)
    return np.array(m.logs["A2.0M0.5N"][:, 1])

f64 = run("float64", 1e-12)
f32 = run("float32", 1e-5)
rel = np.abs(f32 / f64 - 1)
print(f"3D f32-vs-f64 Ra parity: max {rel.max():.2e} mean {rel.mean():.2e}", flush=True)
