# -*- coding: utf-8 -*-
"""TPU screening of 2D solver config variants on the bench_2d workload.

Each variant runs the Example_01 6-tool x 101-depth workload twice (warm-up
compile + timed) and prints solves/s, CG iteration counts, worst residual and
NaN count. Values are cross-checked against the base variant (max rel diff).

Usage: python scratch/screen2d_tpu.py [variant ...]   (default: all)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from remo3d_tpu import Model

BASE = "/root/reference/Examples/Example_01"
TOOLS = ["B5.7A0.4M", "B4.48A1.62M", "M1.0A0.1B", "A2.0M0.5N", "N0.5M2.0A", "M4.0A0.5B"]
DEPTHS = np.arange(0, 25.1, 0.1)[:101]

VARIANTS = {
    "base": {},
    "deg2": {"mg_degree": 2},
    "pow6": {"mg_power_iters": 6},
    "deg2pow6": {"mg_degree": 2, "mg_power_iters": 6},
    "chunk96": {"chunk_size": 96},
    "chunk96deg2pow6": {"chunk_size": 96, "mg_degree": 2, "mg_power_iters": 6},
    "chunk192": {"chunk_size": 192},
    "jacobi": {"mg_smoother": "jacobi"},
    "jacobi_deg5": {"mg_smoother": "jacobi", "mg_degree": 5},
    "line_r": {"mg_smoother": "line_r"},
    "jacobi_chunk192": {"mg_smoother": "jacobi", "chunk_size": 192},
    # Round-4 hardware screening: the direct/BCR factorization and on-device
    # meshing, both previously blocked by the remote compiler/service.
    "direct_bcr": {"preconditioner": "direct", "direct_schedule": "bcr"},
    "direct_bcr_c48": {
        "preconditioner": "direct", "direct_schedule": "bcr", "chunk_size": 48,
    },
    "direct_bcr_c192": {
        "preconditioner": "direct", "direct_schedule": "bcr", "chunk_size": 192,
    },
    "devmesh": {"device_meshing": True},
    # Round-5 structural latency attack (VERDICT r4 item 5): the 761x161
    # chunks are latency-bound, so vary the dispatch structure itself —
    # deeper pipelining (more chunks in flight over the axon tunnel),
    # no pipelining (quantifies what the window already buys), and the
    # deepest window at the measured-best chunk/devmesh config.
    "win1": {"pipeline_window": 1},
    "win6": {"pipeline_window": 6},
    "win12": {"pipeline_window": 12},
    "win6_devmesh": {"pipeline_window": 6, "device_meshing": True},
    "win12_c48": {"pipeline_window": 12, "chunk_size": 48},
    "direct_bcr_c16": {
        "preconditioner": "direct", "direct_schedule": "bcr", "chunk_size": 16,
    },
    "direct_bcr_c24": {
        "preconditioner": "direct", "direct_schedule": "bcr", "chunk_size": 24,
    },
    "direct_bcr_c32": {
        "preconditioner": "direct", "direct_schedule": "bcr", "chunk_size": 32,
    },
    "direct_bcr_c16_devmesh": {
        "preconditioner": "direct", "direct_schedule": "bcr", "chunk_size": 16,
        "device_meshing": True,
    },
    "direct_bcr_devmesh": {
        "preconditioner": "direct", "direct_schedule": "bcr",
        "device_meshing": True,
    },
}


def run(name, overrides):
    model = Model(TOOLS)
    model.set_model_parameters(BASE + "/Input/Formation.txt", BASE + "/Input/Borehole.txt")
    model.initialize_workers(cpu_workers=4)
    kw = dict(executor_overrides=overrides) if overrides else {}
    model.simulate_logs(DEPTHS, verbose=False, **kw)  # warm-up (compile)
    t0 = time.perf_counter()
    model.simulate_logs(DEPTHS, verbose=False, **kw)
    el = time.perf_counter() - t0
    rep = model._executor.last_report
    n_solves = sum(c["solves"] for c in rep["chunks"])
    iters = [c["iterations"] for c in rep["chunks"]]
    worst = max(c["worst_residual"] for c in rep["chunks"])
    n_nan = int(sum(np.isnan(v[:, 1]).sum() for v in model.logs.values()))
    logs = {k: np.array(v) for k, v in model.logs.items()}
    model.shutdown_workers()
    print(
        f"[{name:16s}] {n_solves/el:6.1f} solves/s  elapsed {el:5.2f}s  "
        f"iters {iters}  worst_res {worst:.2e}  nan {n_nan}",
        flush=True,
    )
    return logs


def main():
    names = sys.argv[1:] or list(VARIANTS)
    ref = None
    for name in names:
        logs = run(name, VARIANTS[name])
        if ref is None:
            ref = logs
        else:
            rel = max(
                float(np.nanmax(np.abs(v[:, 1] - ref[k][:, 1]) / np.abs(ref[k][:, 1])))
                for k, v in logs.items()
            )
            print(f"    vs base: max rel diff {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
