"""Tiled sweeps: N same-geometry cases merged into ONE grid along x.

The vmapped sweep (parallel/sweep.py) batches small per-case grids, but
on TPU that path is overhead-bound: the CG while_loop pays the
batch-max iteration count on a per-case-shallow MG hierarchy, small
minor dims pad to the (8, 128) tile, and every stencil runs as a
batched small op. Measured on v5e: ~29M aggregate cell-updates/s for
256 x 4k-cell cases vs ~98M for one 1M-cell grid (bench.py r2).

This module removes the batch axis entirely: the N cases are laid out
side by side along x in one merged grid. Each case keeps its 1-cell
solid padding ring, so every junction face has ZERO aperture — fluxes,
the Poisson operator, and MULES are exactly decoupled between blocks,
while XLA sees one large dense grid: full-depth MG (coarsening stays
within blocks while the per-case width divides by 2), fused Pallas
stencil kernels, no vmap, no batch-axis padding. Per-case forcing
(R, freq, ramp differ per case) enters as a piecewise-constant-in-x
acceleration field via make_step_core's `forcing` hook — constant
within each block, so the total-pressure hydrostatic balance holds
per case exactly as in a single run.

The merged grid also composes with the x-axis device sharding
(parallel/sharding.py): block boundaries carry zero coupling, so
sharding the tiled axis farms cases across chips with no physical halo
traffic — the TPU replacement for "one Slurm job per case"
(/root/reference/main.py:599-608) at full single-case efficiency.

One adaptive dt governs the whole batch (the min over cases — exactly
the dt that parallel/sweep.py's _sync_dt produces), so tiled and
vmapped sweeps are bitwise-comparable step for step.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
from openfoam_tpp_tpu.core import motion as mo
from openfoam_tpp_tpu.core.state import CaseParams, SimState, init_state
from openfoam_tpp_tpu.mesh.geometry import TankGeometry
from openfoam_tpp_tpu.parallel.sweep import batch_params
from openfoam_tpp_tpu.solver.timestep import geometry_arrays, make_step_core


def tile_geometry(geom: TankGeometry, n_cases: int) -> TankGeometry:
    """N copies of `geom` laid out along x as one merged TankGeometry.

    Cell-shaped arrays tile directly; the x-face aperture array drops
    the duplicated last face of every block but the final one (both
    block-end faces are zero — the solid padding ring — so junction
    faces stay sealed)."""
    assert n_cases >= 1
    ax = geom.ax
    if not (np.all(ax[0] == 0.0) and np.all(ax[-1] == 0.0)):
        raise ValueError("tile_geometry requires sealed x-boundary faces "
                         "(build the geometry with pad_cells >= 1)")
    merged_ax = np.concatenate([ax[:-1]] * n_cases + [ax[-1:]], axis=0)
    rep = lambda a: np.concatenate([a] * n_cases, axis=0)
    nx, ny, nz = geom.shape
    return dataclasses.replace(
        geom,
        shape=(nx * n_cases, ny, nz),
        vfrac=rep(geom.vfrac),
        ax=merged_ax,
        ay=rep(geom.ay),
        az=rep(geom.az),
        top_open=rep(geom.top_open),
    )


def tile_state(geom: TankGeometry, n_cases: int, dt0: float = 1e-3,
               **init_kwargs) -> SimState:
    """Quiescent initial state for the tiled grid (same init per block)."""
    s = init_state(geom, dt0=dt0, **init_kwargs)

    def rep(a):
        if a.ndim == 0:
            return a
        reps = [1] * a.ndim
        reps[0] = n_cases
        return jnp.tile(a, reps)

    tiled = jax.tree.map(rep, s)
    # Face-shaped x arrays (u) must drop duplicated block-end faces.
    u = s.u
    u_merged = jnp.concatenate([u[:-1]] * n_cases + [u[-1:]], axis=0)
    return dataclasses.replace(tiled, u=u_merged)


def untile(arr, n_cases: int, face_x: bool = False):
    """Split a merged-grid array back into per-case blocks (leading case
    axis). `face_x` re-duplicates the shared block-end x-faces."""
    a = np.asarray(arr)
    if face_x:
        nxp = (a.shape[0] - 1) // n_cases
        return np.stack([a[i * nxp: i * nxp + nxp + 1]
                         for i in range(n_cases)])
    return np.stack(np.split(a, n_cases, axis=0))


def make_tiled_sweep_step(
    geom: TankGeometry,
    n_cases: int,
    props: PhysicalProperties = PhysicalProperties(),
    controls: SolverControls = SolverControls(),
):
    """Step function advancing all tiled cases at once:
    `step(state, params) -> (state', diag)` with `params` a batched
    CaseParams (leading (n_cases,) leaves, as from batch_params)."""
    tgeom = tile_geometry(geom, n_cases)
    ga = geometry_arrays(tgeom)
    spacing = tuple(float(s) for s in geom.spacing)
    nx = geom.shape[0]

    def forcing(t, params):
        # Per-case uniform acceleration, repeated across each x block.
        G = jax.vmap(lambda p: mo.effective_gravity(t, p, props.g))(params)
        gx = jnp.repeat(G[:, 0], nx).reshape(-1, 1, 1)
        gy = jnp.repeat(G[:, 1], nx).reshape(-1, 1, 1)
        # G_z is identical across cases (gravity; orbital forcing is
        # horizontal) — keep it scalar so the z-force stays fused.
        return gx, gy, G[0, 2]

    core = make_step_core(props, controls, open_top=True, forcing=forcing)

    def step(state: SimState, params: CaseParams, t_stop=None):
        return core(state, params, ga, spacing, t_stop=t_stop)

    return step


def run_tiled_sweep(
    geom: TankGeometry,
    param_rows: list[dict],
    t_end: float,
    props: PhysicalProperties = PhysicalProperties(),
    controls: SolverControls = SolverControls(),
    max_steps: int = 100_000,
):
    """Advance a tiled sweep to t_end. Returns (merged state, n_steps)."""
    n = len(param_rows)
    params = batch_params(param_rows)
    state = tile_state(geom, n)
    step = make_tiled_sweep_step(geom, n, props, controls)

    @jax.jit
    def advance(state, params):
        def body(carry):
            s, k = carry
            s2, _ = step(s, params)
            return (s2, k + 1)

        def cond(carry):
            s, k = carry
            return jnp.logical_and(s.t < t_end, k < max_steps)

        return jax.lax.while_loop(cond, body, (state, 0))

    state, k = advance(state, params)
    return state, int(k)
