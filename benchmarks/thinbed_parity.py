# -*- coding: utf-8 -*-
"""Thin-bedded benchmark model parity vs the reference's committed logs.

The reference ships four precomputed log sets for its thin-bedded verification model
(Examples/Benchmark models/Thin-bedded model/README.txt): Logs 1 (no boundary
effects, aligned depths, Formation_model_1 — the variant with thick uniform end
layers) and Logs 2 (boundary effects, Formation_model_2), both with the 0.35 ohmm
mud borehole, tools
A0.4M6.0N / A1.62M6.0N / A4.0M0.5N / A8.0M1.0N at 81 depths (0..20 m step 0.25).

Usage: python benchmarks/thinbed_parity.py [logs_set(1|2)]
"""

import os
import sys
import time

import numpy as np

try:  # installed package (pip install -e .) or repo-root fallback
    import remo3d_tpu  # noqa: F401
except ImportError:  # pragma: no cover
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TB = "/root/reference/Examples/Benchmark models/Thin-bedded model"
TOOLS = ["A0.4M6.0N", "A1.62M6.0N", "A4.0M0.5N", "A8.0M1.0N"]


def main(logs_set=1):
    from remo3d_tpu import Model

    formation = os.path.join(
        TB, "Formation", f"Formation_model_{1 if logs_set == 1 else 2}.txt"
    )
    borehole = os.path.join(TB, "Borehole", "Borehole_model_correct_rm.txt")
    golden = np.loadtxt(
        os.path.join(TB, "Logs", f"Logs {logs_set}", "Results_1.txt"), skiprows=2
    )
    depths = golden[:, 0]

    model = Model(TOOLS)
    model.set_model_parameters(formation, borehole)
    model.initialize_workers()
    t0 = time.time()
    model.simulate_logs(depths, verbose=False)
    elapsed = time.time() - t0

    print(f"Logs {logs_set}: {len(depths)} depths x {len(TOOLS)} tools in {elapsed:.1f}s")
    worst = 0.0
    for j, t in enumerate(TOOLS):
        ours = model.logs[t][:, 1]
        ref = golden[:, 1 + j]
        rel = (ours - ref) / ref
        worst = max(worst, np.nanmax(np.abs(rel)))
        print(
            f"  {t:>10}: mean {np.nanmean(rel)*100:+.3f}%  max {np.nanmax(np.abs(rel))*100:.3f}%"
            f"  nan={np.isnan(ours).sum()}"
        )
    print(f"  WORST: {worst*100:.3f}%")
    return worst


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
