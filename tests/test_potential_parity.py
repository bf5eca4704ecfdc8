# -*- coding: utf-8 -*-
"""Gate for the potential-level parity evidence (benchmarks/potential_parity.py).

BASELINE.md:25 names "potential parity vs NGSolve to 1e-6 relative" as a north
star; NGSolve is absent here, so the recorded decomposition is (a) f64 FEM vs
the independent f64 FV oracle at POTENTIAL level (discretization parity) and
(b) f64 self-convergence under refinement (benchmarks/potential_parity.py,
README "Potential-level parity"). This test gates one BM1 spot depth of (a)
in a subprocess (the f64 mode flips the global x64 flag).
"""
import os
import subprocess
import sys


def test_bm1_axis_potential_fem_vs_fv_oracle():
    worker = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "_potential_parity_worker.py"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, worker], env=env, capture_output=True, text=True, timeout=900
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "POTENTIAL_PARITY_OK" in out.stdout, out.stdout
