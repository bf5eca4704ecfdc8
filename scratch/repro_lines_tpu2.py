# -*- coding: utf-8 -*-
"""Structural bisection of the pallas_lines2d TPU worker fault (round 5).

Single pcr_apply_pallas calls pass at EXACT production shapes (B=96, S=5,
761x161 — scratch/repro_lines_tpu.py), yet the full MG program faults the TPU
worker even with the half-plane stencil kernel disabled. This bisects the
surrounding program structure one axis at a time; run each case in its own
process (a worker fault kills the process) and find the minimal trigger.

Usage: python scratch/repro_lines_tpu2.py CASE [B S]
Cases: lvl1        isolated axial/radial applies at the LEVEL-1 shape (381x81)
       both0       axial+radial at level 0 in one jit (the line_rz composite)
       both01      level 0 AND level 1 (381x81) composites in one jit
       fori        level-0 composite inside fori_loop(3) (Chebyshev shape)
       cheb        full Chebyshev smoother recurrence, degree 2
       while       level-0 composite inside lax.while_loop (CG shape)
       solve       the real _solve_chunk with use_pallas_lines, no stencil
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from remo3d_tpu.ops.lines import pcr_factor
from remo3d_tpu.ops.pallas_lines2d import (
    line_rz_apply_pallas,
    pcr_apply_stacked,
    stack_factors,
)


def factors(B, nz, nr, axis, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    shape = (B, nz, nr)
    dl = jax.random.uniform(k1, shape, minval=-0.45, maxval=-0.05)
    du = jax.random.uniform(k2, shape, minval=-0.45, maxval=-0.05)
    n = shape[axis]
    idx = jnp.arange(n).reshape((1, n, 1) if axis == 1 else (1, 1, n))
    dl = jnp.where(idx == 0, 0.0, dl)
    du = jnp.where(idx == n - 1, 0.0, du)
    d = 1.0 + jnp.abs(dl) + jnp.abs(du)
    steps, dinv = pcr_factor(dl, d, du, axis=axis)
    return stack_factors(steps, dinv)


def check(out, F_z, F_r, b):
    ref = 0.5 * (pcr_apply_stacked(F_r, b, -1) + pcr_apply_stacked(F_z, b, -2))
    err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    print(f"OK single-apply check err {err:.2e}", flush=True)


def main():
    case = sys.argv[1]
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    nz, nr = 761, 161
    F_z = factors(B, nz, nr, 1)
    F_r = factors(B, nz, nr, 2)
    b = jax.random.normal(jax.random.PRNGKey(7), (B, S, nz, nr), jnp.float32)
    print(f"case {case}: B={B} S={S}", flush=True)

    if case == "lvl1":
        from remo3d_tpu.ops.pallas_lines2d import pcr_apply_pallas

        nz1, nr1 = 381, 81
        F_z1 = factors(B, nz1, nr1, 1, seed=3)
        F_r1 = factors(B, nz1, nr1, 2, seed=4)
        b1 = jax.random.normal(jax.random.PRNGKey(8), (B, S, nz1, nr1), jnp.float32)
        for name, F1, ax in (("axial", F_z1, -2), ("radial", F_r1, -1)):
            out = pcr_apply_pallas(F1, b1, axis=ax, n_solves=S)
            out.block_until_ready()
            ref = pcr_apply_stacked(F1, b1, ax)
            err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
            print(f"OK lvl1 {name} err {err:.2e}", flush=True)
    elif case == "both0":
        out = jax.jit(lambda b: line_rz_apply_pallas(F_z, F_r, b, n_solves=S))(b)
        out.block_until_ready()
        check(out, F_z, F_r, b)
    elif case == "both01":
        nz1, nr1 = 381, 81
        F_z1 = factors(B, nz1, nr1, 1, seed=3)
        F_r1 = factors(B, nz1, nr1, 2, seed=4)
        b1 = jax.random.normal(jax.random.PRNGKey(8), (B, S, nz1, nr1))

        @jax.jit
        def f(b, b1):
            x0 = line_rz_apply_pallas(F_z, F_r, b, n_solves=S)
            x1 = line_rz_apply_pallas(F_z1, F_r1, b1, n_solves=S)
            return x0, x1

        x0, x1 = f(b, b1)
        x0.block_until_ready()
        print("OK both levels", flush=True)
    elif case == "fori":

        @jax.jit
        def f(b):
            def body(_, x):
                return line_rz_apply_pallas(F_z, F_r, x, n_solves=S)

            return jax.lax.fori_loop(0, 3, body, b)

        f(b).block_until_ready()
        print("OK fori", flush=True)
    elif case in ("fori_ax", "fori_rad"):
        from remo3d_tpu.ops.pallas_lines2d import pcr_apply_pallas

        F1, ax = (F_z, -2) if case == "fori_ax" else (F_r, -1)

        @jax.jit
        def f(b):
            def body(_, x):
                return pcr_apply_pallas(F1, x, axis=ax, n_solves=S)

            return jax.lax.fori_loop(0, 3, body, b)

        f(b).block_until_ready()
        print(f"OK {case}", flush=True)
    elif case == "fori_f32":
        from remo3d_tpu.ops.lines import pcr_factor as _pf  # noqa: F401

        def factors_f32(Bv, nzv, nrv, axisv, seed=0):
            k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
            shape = (Bv, nzv, nrv)
            dl = jax.random.uniform(k1, shape, minval=-0.45, maxval=-0.05)
            du = jax.random.uniform(k2, shape, minval=-0.45, maxval=-0.05)
            n = shape[axisv]
            idx = jnp.arange(n).reshape((1, n, 1) if axisv == 1 else (1, 1, n))
            dl = jnp.where(idx == 0, 0.0, dl)
            du = jnp.where(idx == n - 1, 0.0, du)
            d = 1.0 + jnp.abs(dl) + jnp.abs(du)
            steps, dinv = pcr_factor(dl, d, du, axis=axisv)
            return stack_factors(steps, dinv, dtype=jnp.float32)

        F_z32 = factors_f32(B, nz, nr, 1)
        F_r32 = factors_f32(B, nz, nr, 2)

        @jax.jit
        def f(b):
            def body(_, x):
                return line_rz_apply_pallas(F_z32, F_r32, x, n_solves=S)

            return jax.lax.fori_loop(0, 3, body, b)

        f(b).block_until_ready()
        print("OK fori_f32", flush=True)
    elif case == "cheb":

        @jax.jit
        def f(r):
            # d=2 Chebyshev on I (operator apply elided — isolate the kernels)
            x = 0.25 * line_rz_apply_pallas(F_z, F_r, r, n_solves=S)
            w = line_rz_apply_pallas(F_z, F_r, r - x, n_solves=S)
            return x + 0.5 * w

        f(b).block_until_ready()
        print("OK cheb", flush=True)
    elif case == "while":

        @jax.jit
        def f(b):
            def cond(c):
                i, _ = c
                return i < 3

            def body(c):
                i, x = c
                return i + 1, line_rz_apply_pallas(F_z, F_r, x, n_solves=S)

            return jax.lax.while_loop(cond, body, (0, b))[1]

        f(b).block_until_ready()
        print("OK while", flush=True)
    elif case == "solve":
        from remo3d_tpu.parallel.runtime import _solve_chunk

        rng = np.random.default_rng(5)
        r = np.concatenate(
            [[0.0, 0.1], 0.1 + np.cumsum(rng.uniform(0.05, 0.4, nr - 2))]
        )
        z = np.linspace(-25, 25, nz)
        coords = np.zeros((B, nz, nr, 2), np.float32)
        coords[..., 0] = z[:, None]
        coords[..., 1] = r[None, :]
        sigma = rng.uniform(0.01, 1.0, (B, nz - 1, nr - 1)).astype(np.float32)
        free = np.ones((B, nz, nr), bool)
        free[:, 0, :] = free[:, -1, :] = free[:, :, -1] = False
        src_i = np.full((B, S, 2), nz // 2, np.int32)
        src_i[..., 1] = 0
        src_fac = np.zeros((B, S, 2), np.float32)
        src_fac[..., 0] = 1.0
        u, res, iters = _solve_chunk(
            jnp.asarray(coords), jnp.asarray(sigma), jnp.asarray(free),
            jnp.asarray(src_i), jnp.asarray(src_fac),
            tol=1e-6, maxiter=200, preconditioner="multigrid",
            factored_lines=True, use_pallas=False, use_pallas_lines=True,
        )
        u.block_until_ready()
        print(f"OK solve res={np.max(np.asarray(res)):.2e}", flush=True)
    else:
        raise SystemExit(f"unknown case {case}")


if __name__ == "__main__":
    main()
