# -*- coding: utf-8 -*-
"""Definitive Example_02 attribution: ABSOLUTE golden/ours/FV comparison.

Stage 2 of scratch/ex02_attrib.py. The FV oracle now supports the REAL model:
the varying-caliper wall as an rw_profile staircase and the per-solve scalar
mud resistivity (the reference itself scalarizes RM at the source depth,
remo3d.py:806: mud = np.interp(sim_depths, ...), so scalar mud IS the model).
With a disc-shaped Dirichlet boundary the FV solves the SAME truncated BVP as
the FEM and the reference at each domain radius.

Columns: for each of the worst Ex02 depths (M4.0A0.5B), golden/ours/FV at
R=50 and R=25, everything relative to FV at the matching radius.

Usage: python scratch/ex02_attrib2.py [z ...]
"""
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

from fv_oracle import fv_apparent_resistivity  # noqa: E402
from remo3d_tpu import Model  # noqa: E402
from remo3d_tpu.io import load_formation_parameters  # noqa: E402

BASE = "/root/reference/Examples"
TOOL = "M4.0A0.5B"
TOOLS = ["B5.7A0.4M", "B4.48A1.62M", "M1.0A0.1B", "A2.0M0.5N", "N0.5M2.0A", "M4.0A0.5B"]
DEPTHS = np.arange(0, 25.1, 0.1)


def load_golden(example):
    f = glob.glob(os.path.join(BASE, f"Example_{example:02d}", "Output", "Results_*", "Results_1.txt"))[0]
    return np.loadtxt(f, skiprows=2)[:, 1 + TOOLS.index(TOOL)]


def run_ours(radius, batch):
    model = Model(TOOLS)
    model.set_model_parameters(
        os.path.join(BASE, "Example_01", "Input", "Formation.txt"),
        os.path.join(BASE, "Example_01", "Input", "Borehole.txt"),
    )
    model.initialize_workers()
    model.simulate_logs(DEPTHS, domain_radius=radius, batch_size=batch, verbose=False)
    out = np.array(model.logs[TOOL])[:, 1]
    model.shutdown_workers()
    return out


def main():
    zs = [float(a) for a in sys.argv[1:]] or [3.0, 3.2, 3.4, 4.0, 12.0, 20.0]
    g = {50.0: load_golden(1), 25.0: load_golden(2)}
    ours = {50.0: run_ours(50.0, 5), 25.0: run_ours(25.0, 10)}

    formation = load_formation_parameters(os.path.join(BASE, "Example_01", "Input", "Formation.txt"))
    bh = np.loadtxt(os.path.join(BASE, "Example_01", "Input", "Borehole.txt"), skiprows=2)
    rw_profile = np.column_stack([bh[:, 0], bh[:, 1] / 2000.0])

    from remo3d_tpu.tools import parse_tool
    tp = parse_tool(TOOL, force_single_electrode_configuration=True)

    print(f"{'z':>6} {'R':>4} {'FV':>9} {'golden':>9} {'ours':>9} "
          f"{'gold-FV%':>9} {'ours-FV%':>9} {'ours-gold%':>10}")
    for z in zs:
        i = int(round(z * 10))
        z_src = z + tp.depth_shift
        rho_mud = float(np.interp(z_src, bh[:, 0], bh[:, 2]))
        for R in (50.0, 25.0):
            fv = fv_apparent_resistivity(
                TOOL, z, formation, rw=float(np.mean(rw_profile[:, 1])),
                rho_mud=rho_mud, domain_radius=R, subtract=True,
                disc_domain=True, rw_profile=rw_profile,
            )
            print(f"{z:6.1f} {R:4.0f} {fv:9.4f} {g[R][i]:9.4f} {ours[R][i]:9.4f} "
                  f"{(g[R][i]/fv-1)*100:9.3f} {(ours[R][i]/fv-1)*100:9.3f} "
                  f"{(ours[R][i]/g[R][i]-1)*100:10.3f}", flush=True)


if __name__ == "__main__":
    main()
