# Quick numerics smoke test: uniform medium, Ra should equal rho exactly.
import os, sys, time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from remo3d_tpu.meshing.carve import LocalModel, carve_local_model
from remo3d_tpu.meshing.grid2d import GridSpec2D, build_grid2d
from remo3d_tpu.ops import assemble_stencil_2d, pcg

rho = 7.0
R = 50.0

formation = np.array([[-100.0, 100.0, np.nan, np.nan, rho]])
borehole = np.array([[-100.0, 0.118, rho], [100.0, 0.118, rho]])  # mud == formation

lm = carve_local_model(formation, borehole, rho, simulation_depth=0.0, domain_radius=R)
print("local model:", lm.tops, lm.bottoms, "mud sigma", lm.mud_sigma)

# Tool N0.5M2.0A -> electrodes at 0 (A, source), M at -2.0? geometry centered on A.
electrodes = np.array([-6.1, -2.5, -2.0, -0.4, 0.0, 0.4, 2.0, 2.5, 6.1])
sources = np.array([0.0])

spec = GridSpec2D()
t0 = time.time()
grid = build_grid2d(spec, R, lm, electrodes, sources)
print(f"grid built in {time.time()-t0:.3f}s; nz={spec.nz} nr={spec.nr}")
print("z lines near 0:", grid.z_axis[np.abs(grid.z_axis) < 0.03])
print("min dz:", np.min(np.diff(grid.z_axis)), "max dz:", np.max(np.diff(grid.z_axis)))
assert np.all(np.diff(grid.z_axis) > 0)

coords = jnp.asarray(grid.coords)
sigma = jnp.asarray(grid.sigma_cells)
free = jnp.asarray(grid.free_mask)

t0 = time.time()
C = assemble_stencil_2d(coords, sigma, free)
C.block_until_ready()
print(f"assembled in {time.time()-t0:.3f}s; C shape {C.shape}")

# symmetric check
i_src = grid.axis_node_index(0.0)
b = jnp.zeros((spec.nz, spec.nr)).at[i_src, 0].set(1.0)

t0 = time.time()
u, info = pcg(C, b, tol=1e-9, maxiter=20000)
u.block_until_ready()
print(f"solved in {time.time()-t0:.3f}s; iters={info['iterations']}, rel={info['rel_residual']:.3e}")

# Readout at normal tool electrodes
for d1, d2, name in [(0.4, 6.1, "B5.7A0.4M"), (2.0, 2.5, "A2.0M0.5N"), (1.0, 1.1, "M1.0A0.1B-like")]:
    K = abs(4 * np.pi * d1 * d2 / (d2 - d1))
    iM = grid.axis_node_index(-d1) if -d1 in np.round(grid.z_axis, 6) else grid.axis_node_index(d1)
    uM = u[grid.axis_node_index(d1), 0]
    uN = u[grid.axis_node_index(d2), 0]
    Ra = abs(K * (uM - uN))
    print(f"{name}: Ra={Ra:.5f} (expect {rho}), rel err={abs(Ra-rho)/rho:.2e}")

# Also check raw potential vs analytic ball solution u = rho/(4 pi) (1/d - 1/R)
for d in [0.4, 2.0, 2.5, 6.1]:
    ua = rho / (4 * np.pi) * (1 / d - 1 / R)
    un = float(u[grid.axis_node_index(d), 0])
    print(f"u({d}) = {un:.6f} vs analytic {ua:.6f}  rel={abs(un-ua)/ua:.2e}")
