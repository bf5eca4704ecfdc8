# Time the 3D chunk stages at production shapes on TPU.
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8

from remo3d_tpu.meshing.carve import carve_local_model
from remo3d_tpu.meshing.grid3d import GridSpec3D, build_grid3d
from remo3d_tpu.io import load_formation_parameters, load_borehole_parameters, set_dip, add_points_to_borehole
from remo3d_tpu.planner import plan_tasks
from remo3d_tpu.tools import parse_tools
from remo3d_tpu.parallel.runtime import MAX_SOURCES, _assemble3, _build_rhs3_subtract, _pcg3

BM = "/root/reference/Examples/Benchmark models"
dip = 30
formation = load_formation_parameters(os.path.join(BM, "Benchmark model 3", f"Formation_BM3_{dip:02d}.txt"))
borehole = load_borehole_parameters(os.path.join(BM, "Benchmark model 3", "Borehole_BM3.txt"))
borehole = add_points_to_borehole(borehole)
dip_deg, dip_rad = set_dip(dip)
tools, sec = parse_tools(["A2.0M0.5N"], True)
depths = np.arange(5.0, 20.01, 0.25)
sim_depths, tasks = plan_tasks(tools, sec, depths, 5)
mud = np.interp(sim_depths, borehole[:, 0], borehole[:, 2])
print(len(tasks), "tasks")

grids = []
for t in tasks[:B]:
    lm = carve_local_model(formation, borehole[:, :2], float(mud[t.batch_index]), t.center_depth, 50.0, dip_rad=dip_rad, active_geometry_window=0.99)
    sources = np.unique(np.concatenate([s.source_positions for s in t.solves]))
    grids.append(build_grid3d(GridSpec3D(), 50.0, lm, dip_rad, t.electrode_positions, sources))

dtype = np.float32
g0 = grids[0]
S = max(len(t.solves) for t in tasks[:B])
coords = np.zeros((B,) + g0.coords.shape, dtype=dtype)
sigma = np.zeros((B,) + g0.sigma_cells.shape, dtype=dtype)
free = np.zeros((B,) + g0.free_mask.shape, dtype=bool)
src_i = np.zeros((B, S, MAX_SOURCES), dtype=np.int32)
src_fac = np.zeros((B, S, MAX_SOURCES), dtype=dtype)
for bi, (t, g) in enumerate(zip(tasks[:B], grids)):
    coords[bi] = g.coords
    sigma[bi] = g.sigma_cells
    free[bi] = g.free_mask
    for si, s in enumerate(t.solves):
        for k, (pos, fac) in enumerate(zip(s.source_positions, s.source_terms)):
            src_i[bi, si, k] = g.axis_node_index(pos)
            src_fac[bi, si, k] = fac

args = [jnp.asarray(a) for a in (coords, sigma, free, src_i, src_fac)]
coords, sigma, free, src_i, src_fac = args

for rep in range(3):
    t0 = time.time()
    C_raw, C = _assemble3(coords, sigma, free)
    jax.block_until_ready(C)
    t1 = time.time()
    print(f"rep{rep} assemble {t1-t0:.1f}s", flush=True)
    b, off = _build_rhs3_subtract(coords, sigma, free, src_i, src_fac, C_raw)
    jax.block_until_ready(b)
    t2 = time.time()
    print(f"rep{rep} rhs {t2-t1:.1f}s", flush=True)
    u_axis, rel, iters = _pcg3(C, b, off, tol=3e-7, maxiter=1000)
    jax.block_until_ready(u_axis)
    t3 = time.time()
    print(f"rep{rep} pcg {t3-t2:.1f}s iters={int(iters)} rel_max={float(np.max(np.asarray(rel))):.2e}", flush=True)
