# -*- coding: utf-8 -*-
"""Block-tridiagonal direct factorization (ops/block_direct.py).

The float32-stored factorization must be an (essentially) exact inverse of the
9-point operator; the float32 storage must be an SPD
preconditioner that takes PCG to tolerance in a handful of iterations.
"""

import jax
import jax.numpy as jnp
import numpy as np

from remo3d_tpu.ops.block_direct import block_thomas_apply, block_thomas_factor
from remo3d_tpu.ops.cg import pcg
from remo3d_tpu.ops.stencil import stencil_apply

from .test_pallas import _random_symmetric_stencil_2d


def _spd_stencil(rng, B, NZ, NR, boost=8.0):
    C = _random_symmetric_stencil_2d(rng, B, NZ, NR)
    C[..., 1, 1] += boost  # diagonal dominance -> SPD
    return jnp.asarray(C)


def test_block_thomas_is_exact_inverse_f32():
    rng = np.random.default_rng(5)
    B, S, NZ, NR = 2, 3, 12, 7
    with jax.default_device(jax.devices("cpu")[0]):
        C = _spd_stencil(rng, B, NZ, NR)
        b = jnp.asarray(rng.standard_normal((B, S, NZ, NR)).astype(np.float32))
        G = block_thomas_factor(C, store_dtype=jnp.float32)
        x = block_thomas_apply(G, C, b)
        r = np.asarray(stencil_apply(C, x) - b)
        assert np.abs(r).max() <= 2e-5 * np.abs(np.asarray(b)).max()


def test_block_thomas_rank3_rhs():
    """No solve axis (the shape the power-iteration/test callers use)."""
    rng = np.random.default_rng(6)
    B, NZ, NR = 2, 9, 6
    with jax.default_device(jax.devices("cpu")[0]):
        C = _spd_stencil(rng, B, NZ, NR)
        b = jnp.asarray(rng.standard_normal((B, NZ, NR)).astype(np.float32))
        G = block_thomas_factor(C, store_dtype=jnp.float32)
        x = block_thomas_apply(G, C, b)
        r = np.asarray(stencil_apply(C, x) - b)
        assert np.abs(r).max() <= 2e-5 * np.abs(np.asarray(b)).max()


def test_block_thomas_pcg_preconditioner():
    """Default (float32) stored symmetrized blocks: SPD, PCG converges fast.
    (bfloat16 storage diverges on production-depth chains — the recurrences
    amplify per-entry storage error; see the module docstring.)"""
    rng = np.random.default_rng(7)
    B, S, NZ, NR = 2, 2, 12, 7
    with jax.default_device(jax.devices("cpu")[0]):
        C = _spd_stencil(rng, B, NZ, NR, boost=4.0)
        b = jnp.asarray(rng.standard_normal((B, S, NZ, NR)).astype(np.float32))
        G = block_thomas_factor(C)
        M_inv = lambda r: block_thomas_apply(G, C, r)
        u, info = pcg(C, b, M_inv=M_inv, tol=1e-7, maxiter=50)
        assert int(np.asarray(info["iterations"]).max()) <= 8
        assert float(np.asarray(info["rel_residual"]).max()) <= 1e-6


def test_block_thomas_padded_batch_identity():
    """All-zero (padded) batches factor to identity and stay NaN-free."""
    rng = np.random.default_rng(8)
    B, S, NZ, NR = 2, 2, 9, 6
    with jax.default_device(jax.devices("cpu")[0]):
        C = np.array(_spd_stencil(rng, B, NZ, NR))
        C[1] = 0.0  # padded batch
        C = jnp.asarray(C)
        b = np.zeros((B, S, NZ, NR), dtype=np.float32)
        b[0] = rng.standard_normal((S, NZ, NR))
        b = jnp.asarray(b)
        G = block_thomas_factor(C, store_dtype=jnp.float32)
        x = np.asarray(block_thomas_apply(G, C, b))
        assert np.isfinite(x).all()
        assert np.abs(x[1]).max() == 0.0


def test_block_thomas_3d_is_exact_inverse_f32():
    from remo3d_tpu.ops.block_direct3d import (
        block_thomas_apply_3d,
        block_thomas_factor_3d,
    )
    from remo3d_tpu.ops.stencil3d import entry_index, stencil3d_apply

    from .test_pallas import _random_symmetric_stencil

    rng = np.random.default_rng(9)
    B, S, NZ, NP, NR = 2, 2, 6, 3, 4
    with jax.default_device(jax.devices("cpu")[0]):
        C = np.array(_random_symmetric_stencil(rng, B, NZ, NP, NR))
        C[..., entry_index(0, 0, 0)] += 15.0  # diagonal dominance -> SPD
        C = jnp.asarray(C)
        b = jnp.asarray(rng.standard_normal((B, S, NZ, NP, NR)).astype(np.float32))
        G = block_thomas_factor_3d(C, NP, NR, store_dtype=jnp.float32)
        x = block_thomas_apply_3d(G, C, b, NP, NR)
        r = np.asarray(stencil3d_apply(C, x) - b)
        assert np.abs(r).max() <= 3e-5 * np.abs(np.asarray(b)).max()


def test_block_thomas_3d_pcg_preconditioner():
    from remo3d_tpu.ops.block_direct3d import (
        block_thomas_apply_3d,
        block_thomas_factor_3d,
    )
    from remo3d_tpu.ops.stencil3d import entry_index, stencil3d_apply

    from .test_pallas import _random_symmetric_stencil

    rng = np.random.default_rng(10)
    B, S, NZ, NP, NR = 1, 2, 6, 3, 4
    with jax.default_device(jax.devices("cpu")[0]):
        C = np.array(_random_symmetric_stencil(rng, B, NZ, NP, NR))
        C[..., entry_index(0, 0, 0)] += 8.0
        C = jnp.asarray(C)
        b = jnp.asarray(rng.standard_normal((B, S, NZ, NP, NR)).astype(np.float32))
        G = block_thomas_factor_3d(C, NP, NR)
        M_inv = lambda r: block_thomas_apply_3d(G, C, r, NP, NR)
        u, info = pcg(
            None, b, M_inv=M_inv, tol=1e-7, maxiter=50, n_grid_axes=3,
            matvec=lambda p: stencil3d_apply(C, p),
        )
        assert int(np.asarray(info["iterations"]).max()) <= 8
        assert float(np.asarray(info["rel_residual"]).max()) <= 1e-6
