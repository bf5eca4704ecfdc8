# -*- coding: utf-8 -*-
"""Pallas PCR kernel parity vs the XLA line-apply path (interpreter on CPU).

Opt-in (REMO3D_RUN_SLOW=1): the Pallas interpreter costs ~1.5 min on the 1-core
CI host. On real TPU hardware the kernel is bit-exact vs the XLA path (verified
on v5e; see ops/pallas_lines.py notes).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from remo3d_tpu.ops.lines3d import line_apply3, line_factor3
from remo3d_tpu.ops.stencil3d import entry_index


@pytest.mark.skipif(
    not os.environ.get("REMO3D_RUN_SLOW"),
    reason="Pallas interpreter is slow on the 1-core host; set REMO3D_RUN_SLOW=1",
)
def test_pallas_z_pcr_matches_xla_path():
    from unittest import mock

    from jax.experimental import pallas as pl

    from remo3d_tpu.ops import pallas_lines

    rng = np.random.default_rng(3)
    B, S, NZ, NP, NR = 1, 2, 33, 5, 9
    C = np.zeros((B, NZ, NP, NR, 27), dtype=np.float32)
    C[..., entry_index(0, 0, 0)] = 4.0 + rng.random((B, NZ, NP, NR))
    C[..., entry_index(-1, 0, 0)] = -1.0 + 0.2 * rng.random((B, NZ, NP, NR))
    C[..., entry_index(1, 0, 0)] = -1.0 + 0.2 * rng.random((B, NZ, NP, NR))
    C = jnp.asarray(C)
    b = jnp.asarray(rng.standard_normal((B, S, NZ, NP, NR)).astype(np.float32))

    steps, dinv, axis = line_factor3(C, "z")
    ref = line_apply3((steps, dinv, axis), b)
    al, be, dv = pallas_lines.stack_factors(steps, dinv)

    # CPU host: run the kernel through the Pallas interpreter.
    orig = pl.pallas_call
    with mock.patch.object(
        pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True})
    ):
        out = pallas_lines.pcr_apply_z_pallas(al, be, dv, b, n_solves=S)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-6)
