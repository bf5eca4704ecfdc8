# Compare 3D CG preconditioners on a real BM3 chunk (TPU): additive vs palindrome.
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from remo3d_tpu.meshing.carve import carve_local_model
from remo3d_tpu.meshing.grid3d import GridSpec3D, build_grid3d
from remo3d_tpu.io import load_formation_parameters, load_borehole_parameters, set_dip, add_points_to_borehole
from remo3d_tpu.planner import plan_tasks
from remo3d_tpu.tools import parse_tools
from remo3d_tpu.parallel.runtime import MAX_SOURCES, _assemble3, _build_rhs3_subtract
from remo3d_tpu.ops.cg import pcg
from remo3d_tpu.ops.lines3d import line_apply3, line_factor3
from remo3d_tpu.ops.stencil3d import pole_project, stencil3d_apply

B = 8
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
C_raw, C = _assemble3(coords, sigma, free)
b, off = _build_rhs3_subtract(coords, sigma, free, src_i, src_fac, C_raw)
jax.block_until_ready(b)


@partial(jax.jit, static_argnames=("kind", "tol", "maxiter", "damp"))
def run_pcg(C, b, *, kind, tol, maxiter, damp=1.0):
    factors = {d: line_factor3(C, d) for d in ("z", "p", "r")}

    def matvec(p):
        return pole_project(stencil3d_apply(C, pole_project(p)))

    if kind == "factored":
        from remo3d_tpu.ops.stencil3d import DIAG

        D = C[..., DIAG][:, None]

        def M_inv(r):
            z = pole_project(line_apply3(factors["z"], pole_project(r)))
            z = pole_project(line_apply3(factors["p"], D * z))
            z = pole_project(line_apply3(factors["r"], D * z))
            z = pole_project(line_apply3(factors["p"], D * z))
            z = pole_project(line_apply3(factors["z"], D * z))
            return damp * z
    elif kind == "additive":
        def M_inv(r):
            r = pole_project(r)
            return pole_project(sum(line_apply3(f, r) for f in factors.values()) / 3.0)
    else:
        order = {"palin": ("z", "p", "r", "p", "z"), "palin3": ("z", "r", "z")}[kind]

        def M_inv(r):
            r = pole_project(r)
            z = damp * pole_project(line_apply3(factors[order[0]], r))
            for d in order[1:]:
                res = r - matvec(z)
                z = z + damp * pole_project(line_apply3(factors[d], res))
            return z

    u, info = pcg(None, b, M_inv=M_inv, tol=tol, maxiter=maxiter, n_grid_axes=3, matvec=matvec)
    return u, info["rel_residual"], info["iterations"]


for kind in ("additive", "palin", "palin3"):
    for damp in ((1.0,) if kind == "additive" else (1.0, 0.7)):
        t0 = time.time()
        u, rel, it = run_pcg(C, b, kind=kind, tol=1e-5, maxiter=1000, damp=damp)
        jax.block_until_ready(u)
        cold = time.time() - t0
        t0 = time.time()
        u, rel, it = run_pcg(C, b, kind=kind, tol=1e-5, maxiter=1000, damp=damp)
        jax.block_until_ready(u)
        warm = time.time() - t0
        print(
            f"{kind:>9} damp={damp}: iters={int(it)} worst rel={float(jnp.max(rel)):.1e} "
            f"cold {cold:.1f}s warm {warm:.1f}s",
            flush=True,
        )
