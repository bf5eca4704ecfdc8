# -*- coding: utf-8 -*-
"""Benchmark: 2D measurement-point throughput on the Example_01 workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference processes ~100 measurement points of a single tool on a 2D
model of moderate complexity in 15-30 s on an AMD Ryzen 2600 (README.md:26) with 4
CPU workers => ~5 points/s midpoint. We run the actual Example_01 model (6 tools,
borehole + invasion zones) and count tool-measurement points.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_2D_POINTS_PER_S = 5.0  # midpoint of README.md:26 (100 pts / 15-30 s)


def main():
    from remo3d_tpu import Model

    base = "/root/reference/Examples/Example_01"
    tools = ["B5.7A0.4M", "B4.48A1.62M", "M1.0A0.1B", "A2.0M0.5N", "N0.5M2.0A", "M4.0A0.5B"]
    n_depths = int(os.environ.get("BENCH_DEPTHS", "101"))
    depths = np.arange(0, 25.1, 0.1)[:n_depths]

    model = Model(tools)
    model.set_model_parameters(base + "/Input/Formation.txt", base + "/Input/Borehole.txt")
    model.initialize_workers(cpu_workers=4)

    # Warm-up: compile the solve chunk on a tiny depth range (cached by shape).
    model.simulate_logs(depths[:11], verbose=False)

    t0 = time.perf_counter()
    model.simulate_logs(depths, verbose=False)
    elapsed = time.perf_counter() - t0
    model.shutdown_workers()

    n_points = len(depths) * len(tools)
    n_nan = int(sum(np.isnan(v[:, 1]).sum() for v in model.logs.values()))
    pts_per_s = n_points / elapsed

    print(
        json.dumps(
            {
                "metric": "2D measurement points/sec (Example_01, 6 tools)",
                "value": round(pts_per_s, 3),
                "unit": "points/s",
                "vs_baseline": round(pts_per_s / REFERENCE_2D_POINTS_PER_S, 3),
                "elapsed_s": round(elapsed, 3),
                "n_points": n_points,
                "n_nan": n_nan,
            }
        )
    )


if __name__ == "__main__":
    main()
