"""CPU screening: 3D banded-block direct preconditioner on BM3 dip=30."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
from remo3d_tpu import Model

bm = "/root/reference/Examples/Benchmark models"
depths = np.arange(14.0, 15.1, 0.25)  # 5 points in the dipping-layer stack

def run(precond):
    t0 = time.perf_counter()
    m = Model(["A2.0M0.5N"])
    m.set_model_parameters(
        bm + "/Benchmark model 3/Formation_BM3_30.txt",
        bm + "/Benchmark model 3/Borehole_BM3.txt", dip=30)
    m.initialize_workers(cpu_workers=1)
    m.simulate_logs(depths, verbose=False, platform="cpu",
                    executor_overrides={"chunk_size_3d": 2, "precond3d": precond})
    rep = m._executor.last_report
    iters = [c["iterations"] for c in rep["chunks"]]
    worst = max(c["worst_residual"] for c in rep["chunks"])
    vals = m.logs["A2.0M0.5N"][:, 1]
    print(f"[3d {precond}] iters {iters} worst {worst:.2e} "
          f"nan {int(np.isnan(vals).sum())} wall {time.perf_counter()-t0:.0f}s",
          flush=True)
    return vals

v_direct = run("direct")
v_adi = run("adi")
rel = np.nanmax(np.abs(v_direct - v_adi) / np.abs(v_adi))
print(f"[3d direct-vs-adi] max rel diff {rel:.2e}", flush=True)
