"""Diagnose block_thomas on ONE real production batch (CPU)."""
import sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from remo3d_tpu import Model
from remo3d_tpu.ops.assembly2d import apply_dirichlet, element_matrices_2d, fold_to_stencil
from remo3d_tpu.ops.block_direct import block_thomas_factor, block_thomas_apply
from remo3d_tpu.ops.stencil import stencil_apply, stencil_diag

base = "/root/reference/Examples/Example_01"
m = Model(["B5.7A0.4M"])
m.set_model_parameters(base + "/Input/Formation.txt", base + "/Input/Borehole.txt")
m.initialize_workers(cpu_workers=1)
# Build grids without solving: plan a couple of tasks through the executor.
from remo3d_tpu.planner import plan_tasks
from remo3d_tpu.parallel.runtime import Executor, ExecutorConfig
import remo3d_tpu.io as mio

depths = np.arange(0.0, 0.21, 0.1)
sim_depths, tasks = plan_tasks(m.tools, m.sec, depths, 5)
mud = np.interp(sim_depths, m.borehole_model[:, 0], m.borehole_model[:, 2])
ex = Executor(ExecutorConfig(platform="cpu"))
grids = ex.prepare_batches(tasks, m.formation_model, m.borehole_model[:, :2], mud,
                           50.0, m.dip_rad, 0.999)
g = grids[0]
print("grid", g.coords.shape, "sigma range", g.sigma_cells.min(), g.sigma_cells.max())

with jax.default_device(jax.devices("cpu")[0]):
    coords = jnp.asarray(g.coords[None].astype(np.float32))
    sigma = jnp.asarray(g.sigma_cells[None].astype(np.float32))
    free = jnp.asarray(g.free_mask[None])
    C = apply_dirichlet(fold_to_stencil(element_matrices_2d(coords, sigma), 761, 161), free)
    d = np.asarray(stencil_diag(C))
    print("diag range", d.min(), d.max())
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((1, 761, 161)).astype(np.float32))

    for label, scale in (("raw", False), ("jacobi-scaled", True)):
        Cs = C
        if scale:
            s = 1.0 / jnp.sqrt(jnp.where(d == 0, 1.0, jnp.asarray(d)))
            # symmetric scaling of the 9-pt stencil: C[n,d] * s[n] * s[n+d]
            nz, nr = 761, 161
            s_pad = jnp.pad(s, ((0,0),(1,1),(1,1)))
            neigh = jnp.stack([jnp.stack([s_pad[:, di:di+nz, dj:dj+nr] for dj in range(3)], -1) for di in range(3)], -2)
            Cs = C * s[..., None, None] * neigh
        for sd in (jnp.float32, jnp.bfloat16):
            G = block_thomas_factor(Cs, store_dtype=sd)
            Gn = np.asarray(G.astype(jnp.float32))
            x = block_thomas_apply(G, Cs, b)
            r = np.asarray(stencil_apply(Cs, x) - b)
            print(f"[{label} store={sd.__name__}] max|G| {np.abs(Gn).max():.3e} "
                  f"nonfinite {int((~np.isfinite(Gn)).sum())} "
                  f"rel resid {np.abs(r).max()/np.abs(np.asarray(b)).max():.3e}")
