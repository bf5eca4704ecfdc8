# -*- coding: utf-8 -*-
"""Independent float64 finite-volume axisymmetric oracle (thin-bed borehole case).

A completely separate discretization + solver from the main package: conservative
node-centered finite volumes on a tensor grid (area-weighted axial face
conductances, log-radius radial shell conductances), assembled with scipy.sparse
and solved DIRECTLY in float64. Used as evidence in the thin-bed golden
investigation (see benchmarks/thinbed_parity.py): at z=5 and z=13 this oracle
agrees with the package's FEM to <=0.07% while both sit ~4.5% from the
reference's committed A8.0M1.0N golden.

Usage: python benchmarks/fv_oracle.py [measurement_depth]
"""
import os
import sys

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

try:
    import remo3d_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from remo3d_tpu.io import load_formation_parameters

TB = "/root/reference/Examples/Benchmark models/Thin-bedded model"
formation = load_formation_parameters(os.path.join(TB, "Formation", "Formation_model_1.txt"))
bounds = formation[:-1, 1]
rho = formation[:, 4]
R_DOM = 50.0
RW = 0.1           # borehole radius
RHO_MUD = 0.35

z_meas = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0
z_src = z_meas - 8.5
zM, zN = z_src + 8.0, z_src + 9.0
K = 4 * np.pi * 8 * 9 / 1.0

# ---- z grid: snap all bed boundaries, refine near src/M/N ----------------------
pts = [np.linspace(z_src - R_DOM, z_src + R_DOM, 3001)]
for c, hmin in ((z_src, 0.004), (zM, 0.004), (zN, 0.004)):
    pts.append(c + np.concatenate([-np.geomspace(hmin, 3.0, 60)[::-1], [0], np.geomspace(hmin, 3.0, 60)]))
b_in = bounds[(bounds > z_src - R_DOM) & (bounds < z_src + R_DOM)]
for c in b_in:
    pts.append(c + np.array([-0.02, 0.0, 0.02]))
z = np.unique(np.clip(np.concatenate(pts), z_src - R_DOM, z_src + R_DOM))
# enforce sources/receivers and boundaries as nodes
for c in (z_src, zM, zN):
    z[np.argmin(np.abs(z - c))] = c
z = np.unique(z)
NZ = z.size

# ---- r grid: wall at RW, log-graded out to R_DOM -------------------------------
r_in = np.linspace(0, RW, 9)
r_out = RW * np.geomspace(1.0, R_DOM / RW, 220)[1:]
r = np.unique(np.concatenate([r_in, r_out]))
NR = r.size
print(f"grid {NZ} x {NR} = {NZ*NR/1e6:.2f}M nodes", flush=True)

# ---- cell conductivities (cells between nodes) ---------------------------------
zc = 0.5 * (z[:-1] + z[1:])
rc = 0.5 * (r[:-1] + r[1:])
li = np.clip(np.searchsorted(bounds, zc), 0, rho.size - 1)
sig = np.empty((NZ - 1, NR - 1))
sig[:] = (1.0 / rho[li])[:, None]
sig[:, rc < RW] = 1.0 / RHO_MUD

# ---- FV assembly: node-centered, faces between nodes ---------------------------
# Face conductance in z between node (i,j) and (i+1,j): integrate sigma over the
# radial band [r_{j-1/2}, r_{j+1/2}] at z-interval i: G = 2*pi*int r*sig dr / dz.
dz = np.diff(z)
# radial band edges per node j
re = np.concatenate([[0.0], rc, [r[-1]]])
band_area = np.pi * (re[1:] ** 2 - re[:-1] ** 2)  # (NR,) annulus area per node
# sigma in the band of node j at z-cell i: split band into parts left/right of rc?
# band j spans [re[j], re[j+1]] which covers cells j-1 and j (split at r[j]).
area_lo = np.pi * (r**2 - re[:-1] ** 2)  # part of band in cell j-1
area_hi = np.pi * (re[1:] ** 2 - r**2)  # part in cell j
sig_pad = np.pad(sig, [(0, 0), (1, 1)], mode="edge")
band_sig = (area_lo[None, :] * sig_pad[:, :-1] + area_hi[None, :] * sig_pad[:, 1:]) / band_area[None, :]
Gz = band_sig / dz[:, None]  # (NZ-1, NR) face conductance between i,i+1 at node band j... times band area already?
Gz = band_sig * band_area[None, :] / dz[:, None]

# Face conductance in r between node (i,j) and (i,j+1): harmonic across cell j's
# radial extent at node i's z-band [zc_{i-1}, zc_i]:
dzn = np.diff(np.concatenate([[z[0]], zc, [z[-1]]]))  # z-band per node i (NZ,)
# cylindrical shell conductance per unit sigma: 2*pi*dzn / ln(r_{j+1}/r_j); r[0]=0 -> use first annulus formula
with np.errstate(divide="ignore"):
    lnr = np.log(r[1:] / np.maximum(r[:-1], 1e-12))
lnr[0] = np.log(r[1] / (0.25 * r[1]))  # axis cell: effective inner radius
shell = 2 * np.pi / lnr  # per dz per sigma
sig_zpad = np.pad(sig, [(1, 1), (0, 0)], mode="edge")
dz_lo = np.concatenate([[0.0], dz]) / 2
dz_hi = np.concatenate([dz, [0.0]]) / 2
sig_node_band = (dz_lo[:, None] * sig_zpad[:-1, :] + dz_hi[:, None] * sig_zpad[1:, :]) / dzn[:, None]
Gr = shell[None, :] * sig_node_band * dzn[:, None]  # (NZ, NR-1)

idx = lambda i, j: i * NR + j
N = NZ * NR
rows, cols, vals = [], [], []
def add(i1, j1, i2, j2, g):
    a, b = idx(i1, j1), idx(i2, j2)
    rows.extend([a, a, b, b]); cols.extend([a, b, b, a]); vals.extend([g, -g, g, -g])

I, J = np.meshgrid(np.arange(NZ - 1), np.arange(NR), indexing="ij")
A_, B_ = (I * NR + J).ravel(), ((I + 1) * NR + J).ravel()
Gzf = Gz.ravel()
I2, J2 = np.meshgrid(np.arange(NZ), np.arange(NR - 1), indexing="ij")
C_, D_ = (I2 * NR + J2).ravel(), (I2 * NR + J2 + 1).ravel()
Grf = Gr.ravel()
rows = np.concatenate([A_, A_, B_, B_, C_, C_, D_, D_])
cols = np.concatenate([A_, B_, B_, A_, C_, D_, D_, C_])
vals = np.concatenate([Gzf, -Gzf, Gzf, -Gzf, Grf, -Grf, Grf, -Grf])
A = sp.csr_matrix((vals, (rows, cols)), shape=(N, N))

b = np.zeros(N)
b[idx(int(np.where(z == z_src)[0][0]), 0)] = 1.0

# Dirichlet at outer boundary (r=max or z ends)
mask = np.zeros((NZ, NR), dtype=bool)
mask[0, :] = mask[-1, :] = True
mask[:, -1] = True
mask = mask.ravel()
keep = ~mask
Ai = A[keep][:, keep]
bi = b[keep]
print("solving", Ai.shape, flush=True)
u = np.zeros(N)
u[keep] = spla.spsolve(Ai.tocsc(), bi)

uM = u[idx(int(np.where(z == zM)[0][0]), 0)]
uN = u[idx(int(np.where(z == zN)[0][0]), 0)]
Ra = abs(K * (uM - uN))
print(f"z_meas={z_meas}: FV oracle Ra = {Ra:.4f}")
