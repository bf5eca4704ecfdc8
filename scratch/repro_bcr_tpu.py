# -*- coding: utf-8 -*-
"""Bisect which piece of the 2D BCR direct solver the axon TPU compiler rejects.

Stages, each its own jit, smallest first:
  inv_small   jnp.linalg.inv on (8, 33, 33)
  inv_nr      jnp.linalg.inv on (380, 161, 161)  (one BCR level's batched inverse)
  dense       _dense_line_blocks + _dense_U on a (1, 761, 161, 3, 3) stencil
  factor_b1   full bcr_factor, B=1
  apply_b1    full bcr_apply, B=1
  factor_b16  full bcr_factor, B=16

Usage: python scratch/repro_bcr_tpu.py [stage ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def mk_stencil(B, NZ, NR, key=0):
    # SPD-ish 9-point stencil: diagonally dominant random symmetric stencil.
    rng = np.random.default_rng(key)
    C = rng.standard_normal((B, NZ, NR, 3, 3)).astype(np.float32) * 0.1
    C[..., 1, 1] = 10.0
    return jnp.asarray(C)


def stage_inv(shape):
    rng = np.random.default_rng(0)
    A = rng.standard_normal(shape).astype(np.float32) * 0.01
    A = A + np.swapaxes(A, -1, -2)
    idx = np.arange(shape[-1])
    A[..., idx, idx] += 10.0
    A = jnp.asarray(A)
    f = jax.jit(jnp.linalg.inv)
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(A))
    print(f"  ok: {out.shape} in {time.perf_counter()-t0:.1f}s")


def stage_dense():
    from remo3d_tpu.ops.block_bcr import _dense_U
    from remo3d_tpu.ops.block_direct import _dense_line_blocks

    C = mk_stencil(1, 761, 161)
    f = jax.jit(lambda C: (_dense_line_blocks(C), _dense_U(C)))
    t0 = time.perf_counter()
    D, U = jax.block_until_ready(f(C))
    print(f"  ok: D{D.shape} U{U.shape} in {time.perf_counter()-t0:.1f}s")


def stage_factor(B):
    from remo3d_tpu.ops.block_bcr import bcr_factor

    C = mk_stencil(B, 761, 161)
    f = jax.jit(bcr_factor)
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(C))
    print(f"  ok: {len(out[0])} levels in {time.perf_counter()-t0:.1f}s")


def stage_apply(B):
    from remo3d_tpu.ops.block_bcr import bcr_apply, bcr_factor

    C = mk_stencil(B, 761, 161)
    fac = jax.jit(bcr_factor)(C)
    b = jnp.ones((B, 2, 761, 161), jnp.float32)
    f = jax.jit(bcr_apply)
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(fac, b))
    print(f"  ok: {out.shape} in {time.perf_counter()-t0:.1f}s")


STAGES = {
    "inv_small": lambda: stage_inv((8, 33, 33)),
    "inv_nr": lambda: stage_inv((380, 161, 161)),
    "dense": stage_dense,
    "factor_b1": lambda: stage_factor(1),
    "apply_b1": lambda: stage_apply(1),
    "factor_b16": lambda: stage_factor(16),
}


def main():
    names = sys.argv[1:] or list(STAGES)
    print(f"platform: {jax.devices()[0].platform}")
    for name in names:
        print(f"[{name}]", flush=True)
        try:
            STAGES[name]()
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:200]
            print(f"  FAIL: {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
