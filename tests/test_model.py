# -*- coding: utf-8 -*-
"""Model API integration tests (CPU, small grids): 2D and 3D end-to-end."""

import os

import numpy as np
import pytest

from remo3d_tpu import Model
from remo3d_tpu.meshing.grid2d import GridSpec2D
from remo3d_tpu.meshing.grid3d import GridSpec3D

from .conftest import reference_path

# Small grid + Jacobi ("local") preconditioner keep CPU compile times test-friendly;
# the multigrid path has its own dedicated tests in test_ops / test_ops3d.
SMALL_2D = GridSpec2D(nz=193, nr=41, n_wall_cells=6, n_blend_cells=3)
_FAST_2D_KWARGS = dict(
    grid_spec=SMALL_2D,
    platform="cpu",
    preconditioner="local",
    maxiter=20000,
    verbose=False,
)


def uniform_models(rho=7.0, rad=0.118):
    formation = np.array([[-100.0, 100.0, np.nan, np.nan, rho]])
    borehole = np.array([[-100.0, rad, rho], [100.0, rad, rho]])
    return formation, borehole


def test_uniform_medium_2d_apparent_resistivity():
    # In a uniform medium the apparent resistivity equals the true resistivity for
    # every tool type (the defining property of the geometric factor K).
    rho = 7.0
    formation, borehole = uniform_models(rho)
    m = Model(["A2.0M0.5N", "B5.7A0.4M"])
    m.set_model_parameters(formation, borehole, borehole_geometry_type="radius")
    m.initialize_workers(cpu_workers=1)
    m.simulate_logs(
        np.array([0.0, 0.1]),
        grid_spec=SMALL_2D,
        platform="cpu",
        preconditioner="local",
        maxiter=20000,
        verbose=False,
        tol=1e-6,
    )
    for name, log in m.logs.items():
        assert np.all(np.isfinite(log[:, 1])), name
        assert np.allclose(log[:, 1], rho, rtol=0.02), (name, log[:, 1])


def test_uniform_medium_3d_matches_true_resistivity():
    rho = 5.0
    formation, borehole = uniform_models(rho)
    m = Model(["A1.0M0.2N"])
    m.set_model_parameters(formation, borehole, borehole_geometry_type="radius", dip=30)
    m.initialize_workers(cpu_workers=1)
    m.simulate_logs(
        np.array([0.0]),
        batch_size=1,
        grid_spec3d=GridSpec3D(nz=65, np_=9, nr=25, n_wall_cells=4, n_blend_cells=2),
        platform="cpu",
        verbose=False,
        tol=1e-6,
    )
    val = m.logs["A1.0M0.2N"][0, 1]
    assert np.isfinite(val)
    # Coarse grid: expect the right value within a few percent.
    assert abs(val - rho) / rho < 0.06, val


def test_3d_dip_to_zero_matches_2d_solver():
    """The strongest 3D oracle without goldens: at dip -> 0 on a layered model
    the 3D half-ball solve must reproduce the validated 2D axisymmetric solve
    (VERDICT round 1 #3a). Tolerance reflects the coarse test grids."""
    formation = np.array(
        [
            [-1000.0, -0.4, np.nan, np.nan, 10.0],
            [-0.4, 0.6, np.nan, np.nan, 60.0],
            [0.6, 1000.0, np.nan, np.nan, 10.0],
        ]
    )
    borehole = np.array([[-1000.0, 0.1, 0.8], [1000.0, 0.1, 0.8]])
    depths = np.array([0.0, 0.5])

    m2 = Model(["A1.0M0.2N"])
    m2.set_model_parameters(formation, borehole, borehole_geometry_type="radius")
    m2.initialize_workers(cpu_workers=1)
    m2.simulate_logs(depths, batch_size=1, **_FAST_2D_KWARGS)
    v2 = m2.logs["A1.0M0.2N"][:, 1]

    m3 = Model(["A1.0M0.2N"])
    m3.set_model_parameters(
        formation, borehole, borehole_geometry_type="radius", dip=1e-3
    )
    m3.initialize_workers(cpu_workers=1)
    m3.simulate_logs(
        depths,
        batch_size=1,
        grid_spec3d=GridSpec3D(nz=97, np_=9, nr=33, n_wall_cells=4, n_blend_cells=2),
        platform="cpu",
        verbose=False,
        tol=1e-6,
    )
    v3 = m3.logs["A1.0M0.2N"][:, 1]
    assert np.all(np.isfinite(v3))
    assert np.max(np.abs(v3 / v2 - 1)) < 0.04, (v2, v3)


def test_non_sec_two_current_tool_runs():
    rho = 3.0
    formation, borehole = uniform_models(rho)
    m = Model(["B5.7A0.4M"], force_single_electrode_configuration=False)
    m.set_model_parameters(formation, borehole, borehole_geometry_type="radius")
    m.initialize_workers(cpu_workers=1)
    m.simulate_logs(
        np.array([0.0]),
        batch_size=1,
        grid_spec=SMALL_2D,
        platform="cpu",
        preconditioner="local",
        maxiter=20000,
        verbose=False,
    )
    val = m.logs["B5.7A0.4M"][0, 1]
    assert abs(val - rho) / rho < 0.03, val


def test_save_results_writes_reference_format(tmp_path):
    formation, borehole = uniform_models(4.0)
    m = Model(["A2.0M0.5N"])
    m.set_model_parameters(formation, borehole, borehole_geometry_type="radius")
    m.initialize_workers(cpu_workers=1)
    m.simulate_logs(
        np.array([0.0, 0.1, 0.2]),
        grid_spec=SMALL_2D,
        platform="cpu",
        preconditioner="local",
        maxiter=20000,
        verbose=False,
    )
    folder = m.save_results(output_folder=str(tmp_path))
    files = sorted(os.listdir(folder))
    assert "Results_1.txt" in files and "Results_plot.png" in files
    lines = open(os.path.join(folder, "Results_1.txt")).read().splitlines()
    assert lines[0] == "DEPTH\tA2.0M0.5N"
    assert lines[1] == "M\tOHMM"
    assert len(lines) == 5
    first = lines[2].split("\t")
    assert first[0] == "0.0000"


def test_validation_errors_match_reference():
    m = Model(["A2.0M0.5N"])
    with pytest.raises(ValueError):
        m.initialize_workers(cpu_workers=0)
    with pytest.raises(ValueError):
        m.initialize_workers(cpu_workers="four")
    formation, borehole = uniform_models()
    m.set_model_parameters(formation, borehole, borehole_geometry_type="radius")
    m.initialize_workers(cpu_workers=1)
    # Electrode outside the domain radius.
    with pytest.raises(ValueError):
        m.simulate_logs(np.array([0.0]), domain_radius=2, verbose=False, platform="cpu")


def test_checkpoint_resume(tmp_path):
    """Per-chunk checkpointing: a completed checkpoint short-circuits the solve
    (poisoned saved results are returned verbatim), a config change invalidates
    the key and recomputes."""
    rho = 5.0
    formation, borehole = uniform_models(rho)
    ckpt = str(tmp_path / "run.npz")
    depths = np.array([0.0, 0.1])

    def run(**kw):
        m = Model(["A2.0M0.5N"])
        m.set_model_parameters(formation, borehole, borehole_geometry_type="radius")
        m.initialize_workers(cpu_workers=1)
        m.simulate_logs(depths, checkpoint=ckpt, **_FAST_2D_KWARGS, **kw)
        return m.logs["A2.0M0.5N"][:, 1]

    v1 = run()
    assert np.allclose(v1, rho, rtol=0.02)
    assert os.path.exists(ckpt)

    # Poison the stored results: a resumed run must return them verbatim
    # (proving no chunk was recomputed).
    saved = dict(np.load(ckpt, allow_pickle=False))
    saved["results"] = saved["results"] * 0 + 123.0
    np.savez(ckpt, **saved)
    v2 = run()
    assert np.allclose(v2, 123.0)

    # A solver-config change (tol) changes the key -> full recompute, even
    # though every array shape matches (round-2 staleness bug).
    v3 = run(tol=1e-7)
    assert np.allclose(v3, rho, rtol=0.02), v3

    # A same-shape MODEL change must also invalidate (content hash): restore
    # the poisoned checkpoint (old key) — a content-blind key would match it.
    np.savez(ckpt, **saved)
    formation2 = formation.copy()
    formation2[0, 4] = 2 * rho
    m = Model(["A2.0M0.5N"])
    m.set_model_parameters(formation2, borehole, borehole_geometry_type="radius")
    m.initialize_workers(cpu_workers=1)
    m.simulate_logs(depths, checkpoint=ckpt, **_FAST_2D_KWARGS)
    assert not np.allclose(m.logs["A2.0M0.5N"][:, 1], 123.0)

    # A different measurement count changes the key -> full recompute.
    m = Model(["A2.0M0.5N"])
    m.set_model_parameters(formation, borehole, borehole_geometry_type="radius")
    m.initialize_workers(cpu_workers=1)
    m.simulate_logs(np.array([0.0]), checkpoint=ckpt, **_FAST_2D_KWARGS)
    assert np.allclose(m.logs["A2.0M0.5N"][:, 1], rho, rtol=0.02)


def test_units_kwargs_applied_to_array_input():
    """IN/FT unit lists on ndarray input must match pre-converted meter input
    (reference remo3d.py:406-437, 470-499; silently dropped in round 1)."""
    formation_in = np.array([[-1000.0, 1000.0, np.nan, np.nan, 7.0]])
    borehole_ft = np.array([[-1000.0, 0.6, 7.0], [1000.0, 0.6, 7.0]])
    m = Model(["A2.0M0.5N"])
    m.set_model_parameters(
        formation_in * np.array([1 / 0.0254, 1 / 0.0254, 1, 1, 1]),
        borehole_ft * np.array([1 / 0.3048, 1 / 0.3048, 1]),
        formation_units=["IN", "IN", "M"],
        borehole_units=["FT", "FT"],
    )
    assert np.allclose(m.formation_model[:, :2], formation_in[:, :2])
    assert np.allclose(m.borehole_model[:, 1], borehole_ft[:, 1] / 2)  # diameter->radius

    # And through the one-shot pipeline (forwarding bug in round 1).
    model = Model.compute_synthetic_logs(
        ["A2.0M0.5N"],
        np.array([0.0]),
        formation_in * np.array([1 / 0.0254, 1 / 0.0254, 1, 1, 1]),
        borehole_ft * np.array([1 / 0.3048, 1 / 0.3048, 1]),
        formation_units=["IN", "IN", "M"],
        borehole_units=["FT", "FT"],
        **_FAST_2D_KWARGS,
    )
    val = model.logs["A2.0M0.5N"][0, 1]
    assert abs(val - 7.0) / 7.0 < 0.03, val


def test_example01_files_load_and_plan():
    base = reference_path("Examples", "Example_01")
    tools = ["B5.7A0.4M", "A2.0M0.5N"]
    m = Model(tools)
    m.set_model_parameters(
        os.path.join(base, "Input", "Formation.txt"),
        os.path.join(base, "Input", "Borehole.txt"),
    )
    assert m.formation_model.shape == (7, 5)
    assert m.sec is True


def test_example02_golden_parity_reduced_cpu():
    """Example_02 configuration (domain_radius=25, batch_size=10, netgen
    generator selection — Examples/Example_02/Example_02.py) vs its committed
    golden at four spot depths. Production-grid TPU parity is 0.499% worst
    across all six tools (benchmarks/example_parity.py 2, README); this reduced
    CPU grid measures <=1.9%, gated at 3%."""
    import glob

    base = "/root/reference/Examples/Example_02"
    tools = ["B5.7A0.4M", "B4.48A1.62M", "M1.0A0.1B", "A2.0M0.5N", "N0.5M2.0A", "M4.0A0.5B"]
    golden = np.loadtxt(
        glob.glob(base + "/Output/Results_*/Results_1.txt")[0], skiprows=2
    )
    idx = [40, 90, 140, 190]
    m = Model(tools)
    m.set_model_parameters(base + "/Input/Formation.txt", base + "/Input/Borehole.txt")
    m.initialize_workers()
    m.simulate_logs(
        golden[idx, 0],
        domain_radius=25,
        batch_size=10,
        mesh_generator="netgen",
        platform="cpu",
        verbose=False,
        grid_spec=SMALL_2D,
    )
    for j, t in enumerate(tools):
        rel = np.abs(m.logs[t][:, 1] / golden[idx, 1 + j] - 1)
        assert rel.max() < 0.03, (t, rel)


def test_auto_solver_defaults_resolve_per_platform():
    """The "auto" solver knobs resolve once at executor init (CPU -> the
    direct factorization with the sequential scan schedule; an explicit
    pass count -> the fixed-point schedule; explicit values untouched)."""
    from remo3d_tpu.parallel.runtime import Executor, ExecutorConfig

    e = Executor(ExecutorConfig(platform="cpu"))
    assert (e.config.preconditioner, e.config.precond3d, e.config.direct_schedule) == (
        "direct", "direct", "scan"
    )
    e = Executor(ExecutorConfig(platform="cpu", direct_factor_passes=4))
    assert e.config.direct_schedule == "fp"
    e = Executor(
        ExecutorConfig(platform="cpu", preconditioner="multigrid", direct_schedule="bcr")
    )
    assert (e.config.preconditioner, e.config.direct_schedule) == ("multigrid", "bcr")


def test_direct_preconditioner_golden_parity_reduced_cpu():
    """preconditioner="direct" (batched block-LDL^T, ops/block_direct.py) vs
    the Example_01 golden at four spot depths on the reduced CPU grid — the
    same gate the default multigrid path passes. On the production grid the
    direct and multigrid paths agree to 6.6e-05 (scratch/screen_direct.py);
    here the reduced-grid discretization error dominates, gated at 3%."""
    import glob

    base = reference_path("Examples", "Example_01")
    tools = ["B5.7A0.4M", "B4.48A1.62M", "M1.0A0.1B", "A2.0M0.5N", "N0.5M2.0A", "M4.0A0.5B"]
    golden = np.loadtxt(
        glob.glob(base + "/Output/Results_*/Results_1.txt")[0], skiprows=2
    )
    idx = [40, 90, 140, 190]
    m = Model(tools)
    m.set_model_parameters(base + "/Input/Formation.txt", base + "/Input/Borehole.txt")
    m.initialize_workers()
    m.simulate_logs(
        golden[idx, 0],
        platform="cpu",
        verbose=False,
        grid_spec=SMALL_2D,
        executor_overrides={"preconditioner": "direct"},
    )
    for j, t in enumerate(tools):
        rel = np.abs(m.logs[t][:, 1] / golden[idx, 1 + j] - 1)
        assert rel.max() < 0.03, (t, rel)


def test_float64_mode_subprocess():
    """dtype="float64" must genuinely compute in float64 (it silently
    downcast before the executor enabled the x64 flag). Subprocess-isolated:
    the flag is global and must not leak into the float32 suite."""
    import os
    import subprocess
    import sys

    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_f64_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, worker], env=env, capture_output=True, text=True, timeout=600
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "F64_MODE_OK" in out.stdout, out.stdout


def test_device_meshing_matches_host_meshing():
    """device_meshing=True (profile staging + on-device grid build) vs the
    host-meshed path on the same reduced model: identical physics to float32
    mesh noise. The direct preconditioner keeps the CPU runtime small."""
    base = reference_path("Examples", "Example_01")
    tools = ["B5.7A0.4M", "A2.0M0.5N"]
    depths = np.arange(5.0, 5.45, 0.1)

    def run(device_meshing):
        m = Model(tools)
        m.set_model_parameters(
            base + "/Input/Formation.txt", base + "/Input/Borehole.txt"
        )
        m.initialize_workers()
        m.simulate_logs(
            depths,
            platform="cpu",
            verbose=False,
            grid_spec=SMALL_2D,
            executor_overrides={
                "preconditioner": "direct",
                "chunk_size": 4,
                "device_meshing": device_meshing,
            },
        )
        return {t: np.array(m.logs[t][:, 1]) for t in tools}

    host = run(False)
    dev = run(True)
    for t in tools:
        rel = np.abs(dev[t] / host[t] - 1)
        assert np.isfinite(dev[t]).all()
        assert rel.max() < 5e-4, (t, rel)


def test_device_meshing_many_layers():
    """Formations with more carved layers than the 48-entry default pad
    (the reference's thin-bedded benchmark carves 140/201) must still run
    on the device-meshed path — the layer-table pad is sized per run —
    and match host meshing."""
    edges = np.arange(-5.0, 10.0 + 0.25, 0.25)
    rho = np.where(np.arange(edges.size - 1) % 2 == 0, 2.0, 20.0)
    formation = np.column_stack(
        [edges[:-1], edges[1:], np.full(rho.size, np.nan),
         np.full(rho.size, np.nan), rho]
    )
    formation[0, 0] = -1000.0
    formation[-1, 1] = 1000.0
    assert formation.shape[0] > 48
    borehole = np.array([[-1000.0, 0.1, 0.5], [1000.0, 0.1, 0.5]])
    depths = np.array([4.9, 5.1])

    def run(device_meshing):
        m = Model(["A2.0M0.5N"])
        m.set_model_parameters(formation, borehole)
        m.initialize_workers()
        m.simulate_logs(
            depths,
            platform="cpu",
            verbose=False,
            grid_spec=SMALL_2D,
            executor_overrides={
                "preconditioner": "direct",
                "chunk_size": 2,
                "device_meshing": device_meshing,
            },
        )
        return np.array(m.logs["A2.0M0.5N"][:, 1])

    dev = run(True)
    host = run(False)
    assert np.isfinite(dev).all()
    assert np.abs(dev / host - 1).max() < 5e-4, (dev, host)


def test_dip_aware_grid3d_default():
    """Dips >= 50 deg auto-select the refined high_dip() grid (the default
    grid's bilinear facets sag off steep layer planes: rotated-oracle dip 60
    max 1.05% default vs 0.50% high_dip, benchmarks/bm3_oracle.py); thin
    invasion annuli refine the radial grading; explicit grid_spec3d or an
    executor_overrides spec3d always wins; shallow dips and 2D keep the
    ExecutorConfig default. Every auto-upgrade emits a verbose notice."""
    import dataclasses

    from remo3d_tpu.model import THIN_ANNULUS_MIN_CELLS, _resolve_spec3d

    # No invasion zones: dip alone drives the choice.
    formation = np.array([[0.0, 20.0, np.nan, np.nan, 10.0],
                          [20.0, 40.0, np.nan, np.nan, 100.0]])
    borehole = np.array([[0.0, 0.1, 1.0], [60.0, 0.1, 1.0]])
    assert _resolve_spec3d(0.0, None, None, formation, borehole) == (None, [])
    assert _resolve_spec3d(45.0, None, None, formation, borehole) == (None, [])
    spec, notices = _resolve_spec3d(60.0, None, None, formation, borehole)
    assert spec == GridSpec3D.high_dip() and len(notices) == 1
    spec, _ = _resolve_spec3d(50.0, None, None, formation, borehole)
    assert spec == GridSpec3D.high_dip()
    explicit = GridSpec3D(nz=97, np_=9, nr=33)
    assert _resolve_spec3d(60.0, explicit, None, formation, borehole) == (explicit, [])
    assert _resolve_spec3d(
        60.0, None, {"spec3d": explicit}, formation, borehole
    ) == (None, [])

    # A thin invasion annulus (< THIN_ANNULUS_MIN_CELLS radial cells of the
    # default grading) refines nr + the ANCHOR-LOCAL fz_h_radial (the global
    # h_min_radial stays put so the rest of the grid keeps its budget);
    # a thick one does not.
    thin = np.array([[0.0, 20.0, np.nan, np.nan, 10.0],
                     [20.0, 30.0, 0.2, 5.0, 100.0],
                     [30.0, 40.0, np.nan, np.nan, 10.0]])
    spec, notices = _resolve_spec3d(30.0, None, None, thin, borehole)
    assert spec is not None and spec.nr >= 65 and len(notices) == 1
    t_min = 0.2 - 0.1
    assert spec.fz_h_radial is not None
    assert spec.fz_h_radial <= t_min / THIN_ANNULUS_MIN_CELLS + 1e-12
    assert spec.h_min_radial == GridSpec3D().h_min_radial
    assert spec.slope_radial == GridSpec3D().slope_radial
    thick = dataclasses.replace(GridSpec3D())  # default grading resolves 0.5 m
    fat = np.array([[0.0, 20.0, np.nan, np.nan, 10.0],
                    [20.0, 30.0, 0.5, 5.0, 100.0]])
    assert _resolve_spec3d(30.0, None, None, fat, borehole) == (None, [])
    assert thick.h_min_radial * THIN_ANNULUS_MIN_CELLS <= 0.4  # rule sanity
    # Combined: steep dip AND thin annulus -> high_dip meridian with the
    # refined radial grading, two notices.
    spec, notices = _resolve_spec3d(60.0, None, None, thin, borehole)
    assert spec.nz == GridSpec3D.high_dip().nz and spec.nr >= 65
    assert spec.fz_h_radial <= t_min / THIN_ANNULUS_MIN_CELLS + 1e-12
    assert len(notices) == 2
