# Hypothesis test: thickness-averaged (homogenized) sigma sampling vs centroid.
import os
import sys
import time

import numpy as np

try:
    import remo3d_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import remo3d_tpu.meshing.grid2d as g2
import remo3d_tpu.meshing.native as native
from remo3d_tpu import Model
from remo3d_tpu.meshing.grid2d import GridSpec2D

TB = "/root/reference/Examples/Benchmark models/Thin-bedded model"
TOOLS = ["A0.4M6.0N", "A1.62M6.0N", "A4.0M0.5N", "A8.0M1.0N"]

mode = sys.argv[1] if len(sys.argv) > 1 else "arith"

native.native_available = lambda: False  # force the Python sampler


def sample_sigma_avg(local_model, zc, rc):
    """z-averaged sigma per cell via a fine-grid cumulative (arith or harmonic)."""
    # zc, rc: (NZc, NRc) cell centroids. Need cell z-extents: reconstruct from zc
    # midpoints is fiddly; instead patch build_grid2d to pass edges. We cheat:
    # centroid rows are midway between z-lines, so edges are halfway between
    # consecutive centroids (good enough for the hypothesis test).
    nzc, nrc = zc.shape
    z_lines = np.empty(nzc + 1)
    z_lines[1:-1] = 0.5 * (zc[:-1, 0] + zc[1:, 0])
    z_lines[0] = 2 * zc[0, 0] - z_lines[1]
    z_lines[-1] = 2 * zc[-1, 0] - z_lines[-2]

    zf = np.linspace(z_lines[0], z_lines[-1], 8001)
    bottoms = local_model.bottoms
    idx = np.clip(np.searchsorted(bottoms, zf), 0, bottoms.size - 1)
    fz_r = np.nan_to_num(local_model.fz_radius[idx], nan=-1.0)
    s_fz = np.nan_to_num(local_model.sigma_fz[idx], nan=0.0)
    s_uz = local_model.sigma_uz[idx]

    r_st = rc.mean(axis=0)  # (NRc,) station radii (exact far, approx near)
    sig = np.where(r_st[None, :] < fz_r[:, None], s_fz[:, None], s_uz[:, None])
    if mode == "harm":
        sig = 1.0 / sig
    G = np.concatenate(
        [np.zeros((1, nrc)), np.cumsum(0.5 * (sig[1:] + sig[:-1]) * np.diff(zf)[:, None], axis=0)]
    )  # (8001, NRc) cumulative integral
    Ge = np.empty((nzc + 1, nrc))
    for k in range(nrc):
        Ge[:, k] = np.interp(z_lines, zf, G[:, k])
    mean = (Ge[1:] - Ge[:-1]) / np.diff(z_lines)[:, None]
    if mode == "harm":
        mean = 1.0 / mean
    return mean


g2._sample_sigma = sample_sigma_avg

golden = np.loadtxt(os.path.join(TB, "Logs", "Logs 1", "Results_1.txt"), skiprows=2)
stride = int(os.environ.get("STRIDE", "3"))
depths = golden[:, 0][::stride]
gsel = golden[::stride]

m = Model(TOOLS)
m.set_model_parameters(
    os.path.join(TB, "Formation", "Formation_model_1.txt"),
    os.path.join(TB, "Borehole", "Borehole_model_correct_rm.txt"),
)
m.initialize_workers()
t0 = time.time()
m.simulate_logs(depths, verbose=False)
el = time.time() - t0
line = f"avg-{mode} ({el:5.1f}s): "
for j, t in enumerate(TOOLS):
    rel = np.abs(m.logs[t][:, 1] - gsel[:, 1 + j]) / gsel[:, 1 + j]
    line += f"{t.split('M')[0]}: {np.nanmax(rel)*100:5.2f}%  "
print(line, flush=True)
