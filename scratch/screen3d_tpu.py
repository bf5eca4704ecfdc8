# -*- coding: utf-8 -*-
"""TPU screening of 3D solver config variants on the bench_3d workload.

Same protocol as screen2d_tpu.py: warm-up (compile) + timed run per variant,
points/s + CG iterations + worst residual, cross-checked against the base
variant.

Usage: python scratch/screen3d_tpu.py [variant ...]   (default: all)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from remo3d_tpu import Model

BM = "/root/reference/Examples/Benchmark models/Benchmark model 3"
TOOL = "A2.0M0.5N"
DEPTHS = np.arange(5.0, 29.76, 0.25)  # the bench_3d 100-point workload

from remo3d_tpu.meshing.grid3d import GridSpec3D

VARIANTS = {
    "base": {},
    "chunk12": {"chunk_size_3d": 12},
    # Refined-meridian grids (VERDICT r3 #7): the dip->0 study's 257x65 point
    # closes the default-grid gap 1.01% -> 0.51%; this measures its pts/s cost
    # on the flagship workload so the preset ships with a recorded price.
    "grid257x65": {"spec3d": GridSpec3D(nz=257, nr=65)},
    "grid257x65_np25": {"spec3d": GridSpec3D(nz=257, np_=25, nr=65)},
    "grid321x81": {"spec3d": GridSpec3D(nz=321, nr=81)},
    # Diagnosis: the 284k-node grid fails the remote compile even at B=2;
    # is the Pallas half-plane stencil (VMEM-bound) or the XLA program at
    # fault? Plus intermediate sizes bracketing the capacity cliff.
    "grid257x65_nopallas": {
        "spec3d": GridSpec3D(nz=257, nr=65), "use_pallas_stencil": False,
    },
    # Round 5: the z-tiled Pallas stencil removed the VMEM cliff; find the
    # chunk-size knee for the auto-selected high_dip grid.
    "highdip_chunk2": {"spec3d": GridSpec3D.high_dip(), "chunk_size_3d": 2},
    "highdip_chunk4": {"spec3d": GridSpec3D.high_dip(), "chunk_size_3d": 4},
    "highdip_chunk8": {"spec3d": GridSpec3D.high_dip(), "chunk_size_3d": 8},
    "highdip_nopallas4": {
        "spec3d": GridSpec3D.high_dip(), "chunk_size_3d": 4,
        "use_pallas_stencil": False,
    },
    "grid257x49": {"spec3d": GridSpec3D(nz=257, nr=49)},
    "grid225x57": {"spec3d": GridSpec3D(nz=225, nr=57)},
}

if os.environ.get("SCREEN3D_QUICK"):
    DEPTHS = np.arange(11.0, 14.76, 0.5)  # 8 points - single chunk, fast iteration


def run(name, overrides):
    model = Model([TOOL])
    model.set_model_parameters(
        os.path.join(BM, "Formation_BM3_30.txt"),
        os.path.join(BM, "Borehole_BM3.txt"),
        dip=30,
    )
    model.initialize_workers(cpu_workers=4)
    kw = dict(executor_overrides=overrides) if overrides else {}
    model.simulate_logs(DEPTHS, verbose=False, **kw)  # warm-up (compile)
    t0 = time.perf_counter()
    model.simulate_logs(DEPTHS, verbose=False, **kw)
    el = time.perf_counter() - t0
    rep = model._executor.last_report
    iters = [c["iterations"] for c in rep["chunks"]]
    worst = max(c["worst_residual"] for c in rep["chunks"])
    vals = np.array(model.logs[TOOL])[:, 1]
    model.shutdown_workers()
    print(
        f"[{name:22s}] {len(DEPTHS)/el:5.1f} pts/s  elapsed {el:5.2f}s  "
        f"iters {iters}  worst_res {worst:.2e}  nan {int(np.isnan(vals).sum())}",
        flush=True,
    )
    return vals


def main():
    names = sys.argv[1:] or list(VARIANTS)
    ref = None
    for name in names:
        vals = run(name, VARIANTS[name])
        if ref is None:
            ref = vals
        else:
            rel = float(np.nanmax(np.abs(vals - ref) / np.abs(ref)))
            print(f"    vs base: max rel diff {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
