# -*- coding: utf-8 -*-
"""Attribute the Example_02 0.50% M4.0A0.5B outlier (VERDICT r3 item 6).

Example_01 and Example_02 share the SAME formation/borehole model; the goldens
differ only in configuration: R=50/batch=5 (Ex01) vs R=25/batch=10 (Ex02).
Our solver matches the Ex01 golden to 0.07% but the Ex02 golden only to 0.50%
(M4.0A0.5B). Question: does the Ex02 golden carry its own R=25 truncation
error, or is our solver wrong at small domain radius?

Method — compare TRUNCATION DELTAS, which cancel the shared model/mesh error:
  d_golden(z) = golden25/golden50 - 1       (reference's own R=25 response)
  d_ours(z)   = ours25/ours50 - 1           (same batch_size=10 both radii)
  d_fv(z)     = FV_disc(R=25)/FV_disc(R=50) - 1   (independent f64 oracle,
                disc-shaped Dirichlet boundary like the FEM/reference; scalar
                borehole rw/rho_mud — truncation acts at R=25 m where the
                +-4 mm caliper variation is irrelevant)
plus the absolute check ours25 vs golden25 at the worst depths.

Usage: python scratch/ex02_attrib.py [n_fv_depths]
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
    g = np.loadtxt(f, skiprows=2)
    col = 1 + TOOLS.index(TOOL)
    return g[:, col]


def run_ours(radius):
    model = Model(TOOLS)
    model.set_model_parameters(
        os.path.join(BASE, "Example_01", "Input", "Formation.txt"),
        os.path.join(BASE, "Example_01", "Input", "Borehole.txt"),
    )
    model.initialize_workers()
    model.simulate_logs(DEPTHS, domain_radius=radius, batch_size=10, verbose=False)
    out = np.array(model.logs[TOOL])[:, 1]
    model.shutdown_workers()
    return out


def main(n_fv=6):
    g50 = load_golden(1)
    g25 = load_golden(2)
    d_golden = g25 / g50 - 1.0

    ours25 = run_ours(25.0)
    ours50 = run_ours(50.0)
    d_ours = ours25 / ours50 - 1.0

    rel25 = ours25 / g25 - 1.0
    rel50 = ours50 / g50 - 1.0
    worst = np.argsort(-np.abs(rel25))[:n_fv]
    worst = np.sort(worst)
    print(f"{TOOL}: ours vs golden  R=50 max {np.nanmax(np.abs(rel50))*100:.3f}%  "
          f"R=25 max {np.nanmax(np.abs(rel25))*100:.3f}%")
    print(f"worst R=25 depths: {DEPTHS[worst]}")

    formation = load_formation_parameters(os.path.join(BASE, "Example_01", "Input", "Formation.txt"))
    bh = np.loadtxt(os.path.join(BASE, "Example_01", "Input", "Borehole.txt"), skiprows=2)
    rw = float(np.mean(bh[:, 1])) / 2000.0  # mean caliper, mm diameter -> m radius
    rho_mud = float(np.mean(bh[:, 2]))
    print(f"FV scalar borehole: rw={rw:.4f} m  rho_mud={rho_mud:.4f} ohmm")

    hdr = (f"{'z':>6} {'golden50':>9} {'golden25':>9} {'ours25':>9} "
           f"{'d_gold%':>8} {'d_ours%':>8} {'d_fv%':>8} {'ours25-g25%':>11} {'ours25-fv25%':>12}")
    print(hdr)
    for i in worst:
        z = DEPTHS[i]
        fv = {}
        for R in (25.0, 50.0):
            fv[R] = fv_apparent_resistivity(
                TOOL, z, formation, rw=rw, rho_mud=rho_mud,
                domain_radius=R, subtract=True, disc_domain=True,
            )
        d_fv = fv[25.0] / fv[50.0] - 1.0
        print(f"{z:6.1f} {g50[i]:9.4f} {g25[i]:9.4f} {ours25[i]:9.4f} "
              f"{d_golden[i]*100:8.3f} {d_ours[i]*100:8.3f} {d_fv*100:8.3f} "
              f"{rel25[i]*100:11.3f} {(ours25[i]/fv[25.0]-1)*100:12.3f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 6)
