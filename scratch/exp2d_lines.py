"""2D smoother experiment matrix on the attached TPU.

Usage: python scratch/exp2d_lines.py <variant>
variants: base | plines | plines_d2 | plines_p8 | plines_d2p8 | d2 | p8
          | plines_t5 | plines_t4 (PCR truncation, pallas-only) | *_c96 (chunk 96)
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from remo3d_tpu import Model

variant = sys.argv[1] if len(sys.argv) > 1 else "base"
kw = {}
if "plines" in variant:
    kw["use_pallas_lines"] = True
if "d2" in variant:
    kw["mg_degree"] = 2
if "p8" in variant:
    kw["mg_power_iters"] = 8
if "t5" in variant:
    kw["mg_line_steps"] = 5
if "t4" in variant:
    kw["mg_line_steps"] = 4
if "c96" in variant:
    kw["chunk_size"] = 96
if "direct" in variant:
    kw["preconditioner"] = "direct"
if "fp" in variant:  # e.g. direct_fp8: batched Schur fixed-point, 8 passes
    kw["direct_factor_passes"] = int(variant.split("fp")[-1].split("_")[0] or 8)
if "bcr" in variant:  # direct_bcr: block cyclic reduction (log-depth)
    kw["direct_schedule"] = "bcr"
elif "direct" in variant and "fp" not in variant:
    # plain "direct" keeps meaning the sequential scan factor (the "auto"
    # default now resolves to bcr on accelerators).
    kw["direct_schedule"] = "scan"
if "dm" in variant:
    kw["device_meshing"] = True

base = "/root/reference/Examples/Example_01"
tools = ["B5.7A0.4M", "B4.48A1.62M", "M1.0A0.1B", "A2.0M0.5N", "N0.5M2.0A", "M4.0A0.5B"]
depths = np.arange(0, 25.1, 0.1)[:101]
m = Model(tools)
m.set_model_parameters(base + "/Input/Formation.txt", base + "/Input/Borehole.txt")
m.initialize_workers(cpu_workers=4)
m.simulate_logs(depths, verbose=False, executor_overrides=kw or None)  # warm-up
t0 = time.perf_counter()
m.simulate_logs(depths, verbose=False, executor_overrides=kw or None)
el = time.perf_counter() - t0
rep = m._executor.last_report
n_solves = sum(c["solves"] for c in rep["chunks"])
iters = [c["iterations"] for c in rep["chunks"]]
worst = max(c["worst_residual"] for c in rep["chunks"])
vals = np.concatenate([v[:, 1] for v in m.logs.values()])
print(f"[{variant}] elapsed {el:.2f}s  solves/s {n_solves/el:.1f}  iters {iters}  "
      f"worst_res {worst:.2e}  n_nan {int(np.isnan(vals).sum())}")
print("timers", {k: round(v, 3) for k, v in m._executor.timers.seconds.items()})
