# -*- coding: utf-8 -*-
"""Benchmark: the north-star 3D metric + 2D throughput, on the attached accelerator.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...extras}.

Primary metric — the BASELINE.md north star: a 100-measurement-point 3D dipping
log of moderate complexity (Benchmark model 3, dip=30, one lateral tool). The
reference takes 15-30 min for this workload on an AMD Ryzen 2600
(/root/reference/README.md:26) => midpoint ~0.074 points/s.

Secondary fields: 2D Example_01 throughput, reported BOTH as tool-readout
points/s (6 tools share each solve via SEC dedup) and as solves/s — the honest
apples-to-apples number vs the reference's ~5 single-tool points/s midpoint.
"""

import json
import os
import sys
import time

import numpy as np

try:  # installed package (pip install -e .) or repo-root fallback
    import remo3d_tpu  # noqa: F401
except ImportError:  # pragma: no cover
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_3D_POINTS_PER_S = 0.074  # 100 pts / 22.5 min midpoint (README.md:26)
REFERENCE_2D_POINTS_PER_S = 5.0  # 100 pts / 15-30 s midpoint (README.md:26)


def bench_3d():
    from remo3d_tpu import Model

    bm = "/root/reference/Examples/Benchmark models"
    depths = np.arange(5.0, 29.76, 0.25)  # 100 measurement points
    model = Model(["A2.0M0.5N"])
    model.set_model_parameters(
        os.path.join(bm, "Benchmark model 3", "Formation_BM3_30.txt"),
        os.path.join(bm, "Benchmark model 3", "Borehole_BM3.txt"),
        dip=30,
    )
    model.initialize_workers(cpu_workers=4)
    # Warm-up: compile the chunk programs (cached by shape across runs).
    model.simulate_logs(depths, verbose=False)
    t0 = time.perf_counter()
    model.simulate_logs(depths, verbose=False)
    elapsed = time.perf_counter() - t0
    vals = model.logs["A2.0M0.5N"][:, 1]
    # Phase split (mesh/stage/solve/readout) of the timed run: the recorded
    # evidence that host meshing is negligible (VERDICT r2 #9 — if mesh ever
    # exceeds ~10% of wall-clock, port grid3d to native/ like the 2D builder).
    phases = {k: round(v, 3) for k, v in model._executor.timers.seconds.items()}
    model.shutdown_workers()
    return elapsed, len(depths), int(np.isnan(vals).sum()), phases


def bench_2d():
    from remo3d_tpu import Model

    base = "/root/reference/Examples/Example_01"
    tools = ["B5.7A0.4M", "B4.48A1.62M", "M1.0A0.1B", "A2.0M0.5N", "N0.5M2.0A", "M4.0A0.5B"]
    n_depths = int(os.environ.get("BENCH_DEPTHS", "101"))
    depths = np.arange(0, 25.1, 0.1)[:n_depths]

    model = Model(tools)
    model.set_model_parameters(base + "/Input/Formation.txt", base + "/Input/Borehole.txt")
    model.initialize_workers(cpu_workers=4)
    # Warm-up at full size: chunk shapes depend on the task count, so a smaller
    # warm-up would leave the timed run paying the compile.
    model.simulate_logs(depths, verbose=False)
    t0 = time.perf_counter()
    model.simulate_logs(depths, verbose=False)
    elapsed = time.perf_counter() - t0
    n_solves = sum(c["solves"] for c in model._executor.last_report["chunks"])
    n_nan = int(sum(np.isnan(v[:, 1]).sum() for v in model.logs.values()))
    phases = {k: round(v, 3) for k, v in model._executor.timers.seconds.items()}
    model.shutdown_workers()
    return elapsed, len(depths) * len(tools), n_solves, n_nan, phases


def main():
    el3, n3, nan3, phases3 = bench_3d()
    el2, n2_readouts, n2_solves, nan2, phases2 = bench_2d()
    pts3 = n3 / el3
    print(
        json.dumps(
            {
                "metric": "3D dipping-log points/sec (BM3 dip=30, 100 pts, 1 tool)",
                "value": round(pts3, 3),
                "unit": "points/s",
                "vs_baseline": round(pts3 / REFERENCE_3D_POINTS_PER_S, 1),
                "elapsed_3d_s": round(el3, 2),
                "n_nan_3d": nan3,
                "phases_3d_s": phases3,
                "pts2d_per_s": round(n2_readouts / el2, 1),
                "solves2d_per_s": round(n2_solves / el2, 1),
                "vs_baseline_2d_readouts": round(n2_readouts / el2 / REFERENCE_2D_POINTS_PER_S, 2),
                "elapsed_2d_s": round(el2, 2),
                "n_nan_2d": nan2,
                "phases_2d_s": phases2,
            }
        )
    )


if __name__ == "__main__":
    main()
