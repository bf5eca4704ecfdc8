# -*- coding: utf-8 -*-
"""Geometric multigrid for the 3D 27-point stencil (half-ball hex grids).

Same design as :mod:`.multigrid` extended to three grid axes, with the pole
projector woven through every stage so the whole cycle acts on the tied subspace
(the borehole-axis DOFs that coincide across the azimuth):

* trilinear prolongation / adjoint restriction,
* exact Galerkin coarse stencils via 27 stride-3 comb probes,
* Chebyshev smoothing preconditioned by additive 3-direction line relaxation,
* per-batch spectral estimates by power iteration.

NOTE on program structure: the axon TPU compiler faults (or compiles pathologically
slowly) when the whole hierarchy construction is fused into one XLA program, while
every stage compiles and runs fine on its own. The hierarchy build is therefore
HOST-STAGED — assembly, probe chains, stencil gathers and spectral estimates each
run as their own cached jit — and only the PCG solve (with the V-cycle inside) is
one program, taking the level arrays as inputs.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .assembly3d import apply_dirichlet_3d, assemble_stencil_3d
from .cg import pcg
from .lines3d import line_solve_p3, line_solve_r3, line_solve_z3
from .stencil3d import pole_project, stencil3d_apply

_OFFSETS = [(dz, dp, dr) for dz in (-1, 0, 1) for dp in (-1, 0, 1) for dr in (-1, 0, 1)]


@dataclasses.dataclass(frozen=True)
class MGConfig3D:
    n_levels: int = 4
    degree_pre: int = 1
    degree_post: int = 1
    coarse_degree: int = 6
    lower_frac: float = 0.25
    power_iters: int = 8
    pcr_steps: int = 5  # truncated cyclic reduction inside the smoother

    # jit static-arg compatibility
    def __hash__(self):
        return hash(dataclasses.astuple(self))


def prolong3(zc: jnp.ndarray) -> jnp.ndarray:
    """Trilinear interpolation coarse -> fine along the last three axes."""
    sz = zc.shape
    nf = tuple(2 * (n - 1) + 1 for n in sz[-3:])
    f = jnp.zeros(sz[:-3] + nf, dtype=zc.dtype)
    for pz in (0, 1):
        for pp in (0, 1):
            for pr in (0, 1):
                acc = None
                count = 2 ** (pz + pp + pr)
                for oz in range(pz + 1):
                    for op in range(pp + 1):
                        for orr in range(pr + 1):
                            sl = zc[
                                ...,
                                slice(oz, sz[-3] - pz + oz),
                                slice(op, sz[-2] - pp + op),
                                slice(orr, sz[-1] - pr + orr),
                            ]
                            acc = sl if acc is None else acc + sl
                f = f.at[..., pz::2, pp::2, pr::2].set(acc / count)
    return f


def restrict3(r: jnp.ndarray) -> jnp.ndarray:
    """FEM adjoint of trilinear prolongation: rc = P^T r."""
    rp = jnp.pad(r, [(0, 0)] * (r.ndim - 3) + [(1, 1), (1, 1), (1, 1)])
    n = r.shape[-3:]
    c = None
    for dz, dp, dr in _OFFSETS:
        w = 0.5 ** (abs(dz) + abs(dp) + abs(dr))
        sl = rp[
            ...,
            slice(1 + dz, 1 + dz + n[-3], 2),
            slice(1 + dp, 1 + dp + n[-2], 2),
            slice(1 + dr, 1 + dr + n[-1], 2),
        ]
        term = w * sl
        c = term if c is None else c + term
    return c


def _comb_array(nc: tuple) -> np.ndarray:
    combs = np.zeros((27,) + nc, dtype=np.float32)
    for az in range(3):
        for ap in range(3):
            for ar in range(3):
                combs[(az * 3 + ap) * 3 + ar, az::3, ap::3, ar::3] = 1.0
    return combs


@jax.jit
def _probe(C, comb):
    """y = P^T (A (P comb)) for ONE comb (no broadcast probe axis).

    The axon TPU compiler faults (deterministically, device-killing) when the 27
    probes share one program over a broadcast axis — even chunked by 9 — while the
    single-probe program runs and matches the CPU result exactly. The coarsening
    is built once per chunk, so 27 small cached dispatches per level are cheap
    next to the CG iterations they enable.
    """
    return restrict3(stencil3d_apply(C, prolong3(comb)))


@jax.jit
def _gather_stencil(y, coarse_free):
    """Rearrange probe columns into 27-point stencil layout + Dirichlet rows.

    Stencil entry (dz,dp,dr) at node n couples to neighbor n+d, whose probe is the
    comb with residues ((n+d) mod 3).
    """
    nc = y.shape[-3:]
    y_t = jnp.moveaxis(y, -4, -1)  # (..., Zc, Pc, Rc, 27)
    iz = np.arange(nc[0])[:, None, None]
    ip = np.arange(nc[1])[None, :, None]
    ir = np.arange(nc[2])[None, None, :]
    idx = np.empty(nc + (27,), dtype=np.int32)
    for dz, dp, dr in _OFFSETS:
        e = ((dz + 1) * 3 + (dp + 1)) * 3 + (dr + 1)
        idx[..., e] = (((iz + dz) % 3) * 3 + ((ip + dp) % 3)) * 3 + ((ir + dr) % 3)
    CH = jnp.take_along_axis(
        y_t, jnp.broadcast_to(jnp.asarray(idx), y_t.shape[:-1] + (27,)), axis=-1
    )
    return apply_dirichlet_3d(CH, coarse_free)


def galerkin_coarsen3(C: jnp.ndarray, coarse_free: jnp.ndarray) -> jnp.ndarray:
    """Exact Galerkin coarse stencil via 27 stride-3 comb probes (host-staged)."""
    nc = tuple(coarse_free.shape[-3:])
    lead = C.shape[:-4]
    combs = _comb_array(nc)
    ys = [
        _probe(C, jnp.asarray(np.broadcast_to(combs[e], lead + nc), dtype=C.dtype))
        for e in range(27)
    ]
    y = jnp.stack(ys, axis=len(lead))
    return _gather_stencil(y, coarse_free)


def _make_precond3(C, pcr_steps=None):
    # Two-direction additive line relaxation: radial (thin stations) and axial
    # (fine source bands). Azimuthal coupling is handled by the pole projector and
    # the coarse grid; dropping the phi lines keeps the compiled program small
    # enough for the axon toolchain.
    def apply_(r):
        return (
            line_solve_r3(C, r, pcr_steps) + line_solve_z3(C, r, pcr_steps)
        ) / 2.0

    return apply_


def _tied_matvec(C):
    def matvec(u):
        return pole_project(stencil3d_apply(C, pole_project(u)))

    return matvec


@partial(jax.jit, static_argnames=("power_iters", "pcr_steps"))
def _estimate_lmax3(C, x0, *, power_iters: int, pcr_steps=None):
    """Per-batch spectral radius of (line-precond . A) on the tied subspace.

    x0 must be materialized with C's full batch+grid shape (a broadcast inside the
    program destabilizes the axon compiler in larger compositions).
    """
    matvec = _tied_matvec(C)
    precond = _make_precond3(C, pcr_steps)
    x = x0
    lmax = None
    for _ in range(power_iters):
        y = pole_project(precond(pole_project(matvec(x))))
        # Reductions over merged grid axes: multi-axis trailing reductions on 5D
        # arrays destabilize the axon compiler.
        ry = y.reshape(y.shape[:-3] + (-1,))
        rx = x.reshape(x.shape[:-3] + (-1,))
        nrm_y = jnp.sqrt(jnp.sum(ry * ry, axis=-1))
        nrm_x = jnp.sqrt(jnp.sum(rx * rx, axis=-1))
        lmax = nrm_y / (nrm_x + 1e-30)
        x = y / (nrm_y[..., None, None, None] + 1e-30)
    return lmax


def build_hierarchy3(coords, sigma_cells, free_mask, config: MGConfig3D):
    """Host-staged hierarchy build. Returns a list of array-only level dicts."""
    nz, np_, nr = coords.shape[-4], coords.shape[-3], coords.shape[-2]
    for l in range(config.n_levels - 1):
        step = 2**l
        if (nz - 1) % (2 * step) or (np_ - 1) % (2 * step) or (nr - 1) % (2 * step):
            raise ValueError(
                f"grid {nz}x{np_}x{nr} not coarsenable {config.n_levels - 1} times"
            )
    rng = np.random.default_rng(54321)
    levels = []
    C = jax.jit(assemble_stencil_3d)(coords, sigma_cells, free_mask)
    for l in range(config.n_levels):
        x0 = jnp.asarray(
            np.broadcast_to(
                rng.standard_normal(C.shape[-4:-1]), C.shape[:-1]
            ).copy(),
            dtype=C.dtype,
        )
        levels.append(
            {
                "C": C,
                "free": free_mask,
                "lmax": _estimate_lmax3(
                    C, x0, power_iters=config.power_iters, pcr_steps=config.pcr_steps
                ),
            }
        )
        if l < config.n_levels - 1:
            free_mask = free_mask[..., ::2, ::2, ::2]
            C = galerkin_coarsen3(C, free_mask)
    return levels


def _chebyshev_smooth3(level, r, z, degree: int, lower_frac: float, pcr_steps=None):
    if degree <= 0:
        return z
    C, free, lmax = level["C"], level["free"], level["lmax"]
    matvec = _tied_matvec(C)
    precond = _make_precond3(C, pcr_steps)
    extra = r.ndim - (C.ndim - 1)
    if extra == 1:
        free = jnp.expand_dims(free, -4)
        lmax = jnp.expand_dims(lmax, -1)
    lmax = lmax[..., None, None, None] * 1.05
    lmin = lmax * lower_frac
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta
    rho = 1.0 / sigma

    def precond_residual(z):
        res = r - matvec(z)
        return pole_project(precond(pole_project(jnp.where(free, res, 0.0))))

    d = precond_residual(z) / theta
    z = z + d
    for _ in range(degree - 1):
        rho_new = 1.0 / (2.0 * sigma - rho)
        d = rho_new * rho * d + (2.0 * rho_new / delta) * precond_residual(z)
        z = z + d
        rho = rho_new
    return z


def v_cycle3(levels, r, config: MGConfig3D, l: int = 0):
    level = levels[l]
    free = level["free"]
    freeb = free if r.ndim == free.ndim else jnp.expand_dims(free, -4)
    if l == len(levels) - 1:
        return _chebyshev_smooth3(
            level, r, jnp.zeros_like(r), config.coarse_degree, config.lower_frac / 8,
            config.pcr_steps,
        )
    z = _chebyshev_smooth3(
        level, r, jnp.zeros_like(r), config.degree_pre, config.lower_frac,
        config.pcr_steps,
    )
    res = jnp.where(freeb, r - _tied_matvec(level["C"])(z), 0.0)
    zc = v_cycle3(levels, pole_project(restrict3(res)), config, l + 1)
    z = z + jnp.where(freeb, pole_project(prolong3(zc)), 0.0)
    z = _chebyshev_smooth3(
        level, r, z, config.degree_post, config.lower_frac, config.pcr_steps
    )
    return z


@partial(jax.jit, static_argnames=("config", "tol", "maxiter"))
def mg_pcg3(levels, b, *, config: MGConfig3D, tol: float, maxiter: int):
    """PCG on the pole-tied subspace with the V-cycle preconditioner (one program).

    NOTE: this single-program form is what the CPU tests use; on the axon TPU the
    program is too large for the toolchain — use :func:`mg_pcg3_staged` there.
    """
    matvec = _tied_matvec(levels[0]["C"])

    def M_inv(r):
        return v_cycle3(levels, r, config)

    u, info = pcg(
        None, b, M_inv=M_inv, tol=tol, maxiter=maxiter, n_grid_axes=3, matvec=matvec
    )
    return pole_project(u), info["rel_residual"], info["iterations"]


# ---------------------------------------------------------------------------------
# Host-driven staged PCG: the axon TPU toolchain cannot compile the full
# V-cycle-inside-while-loop program, and any device->host transfer between programs
# intermittently kills the remote worker. So the CG runs a FIXED number of
# iterations driven from the host, composed of small cached jits, with no
# data-dependent control flow and a single transfer at the very end.
# ---------------------------------------------------------------------------------


def _rdot(a, b):
    """Batched dot over the grid axes via a merged reshape (axon-safe)."""
    ra = a.reshape(a.shape[:-3] + (-1,))
    rb = b.reshape(b.shape[:-3] + (-1,))
    return jnp.sum(ra * rb, axis=-1)


@partial(jax.jit, static_argnames=("degree", "lower_frac", "pcr_steps"))
def _smooth_stage(C, free, lmax, r, z, *, degree, lower_frac, pcr_steps):
    level = {"C": C, "free": free, "lmax": lmax}
    return _chebyshev_smooth3(level, r, z, degree, lower_frac, pcr_steps)


@jax.jit
def _residual_stage(C, free, r, z):
    freeb = free if r.ndim == free.ndim else jnp.expand_dims(free, -4)
    res = jnp.where(freeb, r - _tied_matvec(C)(z), 0.0)
    return pole_project(restrict3(res))


@jax.jit
def _prolong_add_stage(z, zc, free):
    freeb = free if z.ndim == free.ndim else jnp.expand_dims(free, -4)
    return z + jnp.where(freeb, pole_project(prolong3(zc)), 0.0)


def _vcycle_stage(levels, r, *, config: MGConfig3D, l: int = 0):
    """Host-driven V-cycle: one small cached jit per smoother/transfer stage."""
    level = levels[l]
    if l == len(levels) - 1:
        return _smooth_stage(
            level["C"], level["free"], level["lmax"], r, jnp.zeros_like(r),
            degree=config.coarse_degree, lower_frac=config.lower_frac / 8,
            pcr_steps=config.pcr_steps,
        )
    z = _smooth_stage(
        level["C"], level["free"], level["lmax"], r, jnp.zeros_like(r),
        degree=config.degree_pre, lower_frac=config.lower_frac,
        pcr_steps=config.pcr_steps,
    )
    rc = _residual_stage(level["C"], level["free"], r, z)
    zc = _vcycle_stage(levels, rc, config=config, l=l + 1)
    z = _prolong_add_stage(z, zc, level["free"])
    z = _smooth_stage(
        level["C"], level["free"], level["lmax"], r, z,
        degree=config.degree_post, lower_frac=config.lower_frac,
        pcr_steps=config.pcr_steps,
    )
    return z


@jax.jit
def _cg_update_ur(C, u, r, p, rz):
    """alpha = rz/<p,Ap>; u += alpha p; r -= alpha Ap (one fused stage)."""
    Ap = pole_project(stencil3d_apply(C, pole_project(p)))
    pAp = _rdot(p, Ap)
    alpha = rz / jnp.where(pAp > 0, pAp, 1.0)
    alpha = jnp.where(pAp > 0, alpha, 0.0)[..., None, None, None]
    return u + alpha * p, r - alpha * Ap


@jax.jit
def _cg_update_p(z, p, r, rz):
    """rz_new = <r,z>; beta = rz_new/rz; p = z + beta p."""
    rz_new = _rdot(r, z)
    beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
    return z + beta[..., None, None, None] * p, rz_new


@jax.jit
def _finalize(u, r, b):
    rr = _rdot(r, r)
    bb = _rdot(b, b)
    rel = jnp.sqrt(rr / jnp.where(bb > 0, bb, 1.0))
    return pole_project(u), rel


def mg_pcg3_staged(levels, b, *, config: MGConfig3D, n_iters: int = 20):
    """Fixed-iteration MG-PCG composed of small cached jits (no mid transfers)."""
    u = jnp.zeros_like(b)
    r = b
    z = _vcycle_stage(levels, r, config=config)
    p = z
    rz = _rdot(r, z)
    for _ in range(n_iters):
        u, r = _cg_update_ur(levels[0]["C"], u, r, p, rz)
        z = _vcycle_stage(levels, r, config=config)
        p, rz = _cg_update_p(z, p, r, rz)
    u, rel = _finalize(u, r, b)
    return u, rel, jnp.int32(n_iters)
