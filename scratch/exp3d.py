"""3D experiment on the attached TPU: BM3 dip=30, 100-pt log (the bench workload).

Usage: python scratch/exp3d.py <variant>
variants: base (adi) | plines (adi + pallas line kernels) | direct
"""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
from remo3d_tpu import Model

variant = sys.argv[1] if len(sys.argv) > 1 else "base"
kw = {}
if "direct" in variant:
    kw["precond3d"] = "direct"
if "fp" in variant:  # e.g. direct_fp6: batched Schur fixed-point, 6 passes
    kw["direct_factor_passes"] = int(variant.split("fp")[-1].split("_")[0] or 6)
if "bcr" in variant:  # direct_bcr: block cyclic reduction (log-depth)
    kw["direct_schedule"] = "bcr"
elif "direct" in variant and "fp" not in variant:
    # plain "direct" keeps meaning the sequential scan factor (the "auto"
    # default now resolves to bcr on accelerators).
    kw["direct_schedule"] = "scan"

bm = "/root/reference/Examples/Benchmark models"
depths = np.arange(5.0, 29.76, 0.25)  # 100 measurement points (bench.py workload)
m = Model(["A2.0M0.5N"])
m.set_model_parameters(
    bm + "/Benchmark model 3/Formation_BM3_30.txt",
    bm + "/Benchmark model 3/Borehole_BM3.txt", dip=30)
m.initialize_workers(cpu_workers=4)
m.simulate_logs(depths, verbose=False, executor_overrides=kw or None)  # warm-up
t0 = time.perf_counter()
m.simulate_logs(depths, verbose=False, executor_overrides=kw or None)
el = time.perf_counter() - t0
rep = m._executor.last_report
iters = [c["iterations"] for c in rep["chunks"]]
worst = max(c["worst_residual"] for c in rep["chunks"])
vals = m.logs["A2.0M0.5N"][:, 1]
print(f"[3d {variant}] elapsed {el:.2f}s  pts/s {len(depths)/el:.2f}  iters {iters}")
print(f"  worst_res {worst:.2e}  n_nan {int(np.isnan(vals).sum())}  "
      f"range {np.nanmin(vals):.1f}..{np.nanmax(vals):.1f}")
print("timers", {k: round(v, 3) for k, v in m._executor.timers.seconds.items()})
