"""Direct u-level (potential) parity: f32 production solve vs f64, one real batch."""
import sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from remo3d_tpu import Model
from remo3d_tpu.ops.assembly2d import (
    apply_dirichlet, element_matrices_2d, fold_to_stencil,
    fundamental_potential_2d, singularity_rhs_2d,
)
from remo3d_tpu.ops.block_direct import block_thomas_factor, block_thomas_apply
from remo3d_tpu.ops.stencil import stencil_apply
from remo3d_tpu.ops.cg import pcg
from remo3d_tpu.planner import plan_tasks
from remo3d_tpu.parallel.runtime import Executor, ExecutorConfig

base = "/root/reference/Examples/Example_01"
m = Model(["A2.0M0.5N"])
m.set_model_parameters(base + "/Input/Formation.txt", base + "/Input/Borehole.txt")
depths = np.arange(5.0, 5.21, 0.1)
sim_depths, tasks = plan_tasks(m.tools, m.sec, depths, 5)
mud = np.interp(sim_depths, m.borehole_model[:, 0], m.borehole_model[:, 2])
ex = Executor(ExecutorConfig(platform="cpu"))
grids = ex.prepare_batches(tasks, m.formation_model, m.borehole_model[:, :2], mud,
                           50.0, m.dip_rad, 0.999)
g = grids[0]
t = tasks[0]
src_z = g.z_axis[g.axis_node_index(t.solves[0].source_positions[0])]

def solve(dtype, tol):
    with jax.default_device(jax.devices("cpu")[0]):
        coords = jnp.asarray(g.coords[None].astype(dtype))
        sigma = jnp.asarray(g.sigma_cells[None].astype(dtype))
        free = jnp.asarray(g.free_mask[None])
        C_raw = fold_to_stencil(element_matrices_2d(coords, sigma), 761, 161)
        C = apply_dirichlet(C_raw, free)
        sigma0 = sigma[:, 0, 0]
        src = jnp.asarray(np.array([[[src_z, src_z]]], dtype=dtype))  # (B,S,2)
        fac = jnp.asarray(np.array([[[1.0, 0.0]]], dtype=dtype))
        u_s = fundamental_potential_2d(coords, sigma0, src, fac)
        rhs = singularity_rhs_2d(coords, sigma, sigma0, src, fac)
        g_lift = jnp.where(free[:, None], 0.0, -u_s)
        rhs = jnp.where(free[:, None], rhs - stencil_apply(C_raw, g_lift), 0.0)
        G = block_thomas_factor(C, store_dtype=dtype)
        M_inv = lambda r: block_thomas_apply(G, C, r)
        w, info = pcg(C, rhs, M_inv=M_inv, tol=tol, maxiter=200)
        u = w + g_lift + u_s
        return np.asarray(u[0, 0, :, 0]), int(np.asarray(info["iterations"]).max())

u64, it64 = solve(np.float64, 1e-13)
u32, it32 = solve(np.float32, 3e-7)
print(f"iters f64 {it64} f32 {it32}")
for name, mask in (
    ("all |u|>1e-12", np.abs(u64) > 1e-12),
    ("near-field |z-src|<10m", np.abs(g.z_axis - src_z) < 10.0),
    ("|u| > 1e-3 max", np.abs(u64) > 1e-3 * np.abs(u64).max()),
):
    rel = np.abs(u32[mask] - u64[mask]) / np.abs(u64[mask])
    print(f"u-level parity [{name}]: max {rel.max():.2e} mean {rel.mean():.2e} n={mask.sum()}")
