# -*- coding: utf-8 -*-
"""Isolated repro of the pallas_lines2d kernel fault on real TPU (round 4).

The 2D MG smoother's VMEM PCR line kernels (ops/pallas_lines2d.py) pass the
interpreter-mode parity tests but crash the TPU worker ("kernel fault") when
enabled in production (scratch/screen2d_tpu.py pallas_lines variant). This
drives each kernel (axial / radial) in isolation at chosen shapes so the
faulting program can be localized and bisected.

Usage: python scratch/repro_lines_tpu.py {axial|radial|both} [B S NZ NR]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from remo3d_tpu.ops.lines import pcr_factor
from remo3d_tpu.ops.pallas_lines2d import (
    pcr_apply_pallas,
    pcr_apply_stacked,
    stack_factors,
)


def make_factors(B, nz, nr, axis, seed=0):
    """Random diagonally-dominant tridiagonal factors along `axis` (1=z, 2=r)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    shape = (B, nz, nr)
    dl = jax.random.uniform(k1, shape, minval=-0.45, maxval=-0.05)
    du = jax.random.uniform(k2, shape, minval=-0.45, maxval=-0.05)
    # Zero couplings past the line ends (pcr_factor's convention).
    n = shape[axis]
    idx = jnp.arange(n).reshape((1, n, 1) if axis == 1 else (1, 1, n))
    dl = jnp.where(idx == 0, 0.0, dl)
    du = jnp.where(idx == n - 1, 0.0, du)
    d = 1.0 + jnp.abs(dl) + jnp.abs(du)
    steps, dinv = pcr_factor(dl, d, du, axis=axis)
    return stack_factors(steps, dinv)


def run(which, B=8, S=4, nz=761, nr=161, seed=0):
    axis = -2 if which == "axial" else -1
    F = make_factors(B, nz, nr, axis=1 if which == "axial" else 2, seed=seed)
    b = jax.random.normal(jax.random.PRNGKey(seed + 7), (B, S, nz, nr), jnp.float32)
    ref = np.asarray(pcr_apply_stacked(F, b, axis))
    print(f"[{which}] F {F.shape} b {b.shape} — launching kernel...", flush=True)
    out = np.asarray(pcr_apply_pallas(F, b, axis=axis, n_solves=S))
    err = np.max(np.abs(out - ref)) / max(np.max(np.abs(ref)), 1e-30)
    print(f"[{which}] OK  max rel err vs stacked XLA apply: {err:.2e}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    dims = [int(x) for x in sys.argv[2:6]] or [8, 4, 761, 161]
    targets = ["axial", "radial"] if which == "both" else [which]
    for t in targets:
        run(t, *dims)
