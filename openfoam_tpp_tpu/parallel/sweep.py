"""vmapped parameter sweeps — the TPU replacement for the reference's
"one Slurm job per case" sweep farming (/root/reference/main.py:599-608).

All cases in a batch share one geometry (H, D, mesh, geo fixed) and vary
the forcing (R, freq, ramp) — exactly the (f, R) sweep axes of the
reference's zip/Cartesian builder. The SimState gains a leading batch
axis; one jitted vmapped step advances every case simultaneously, and the
batch axis can additionally be sharded over the device mesh's `case` axis
(see parallel/sharding.py) for multi-chip sweep farming.

Batched cases share a single adaptive dt (the min over the batch) so the
batch stays in one jit program — the standard batched-ODE compromise.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
from openfoam_tpp_tpu.core.state import CaseParams, SimState, init_state
from openfoam_tpp_tpu.mesh.geometry import TankGeometry
from openfoam_tpp_tpu.solver.timestep import make_step


def batch_params(param_rows: list[dict]) -> CaseParams:
    """Stack per-case (R, freq, duration, ramp) dicts into one CaseParams
    pytree with a leading batch axis."""
    built = [
        CaseParams.make(
            R=row["R"], freq=row["freq"], duration=row["duration"],
            ramp=row.get("ramp", -1.0),
        )
        for row in param_rows
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *built)


def batch_states(geom: TankGeometry, n: int, dt0: float = 1e-3) -> SimState:
    """n identical quiescent initial states with a leading batch axis."""
    s = init_state(geom, dt0=dt0)
    return jax.tree.map(lambda a: jnp.broadcast_to(a, (n,) + a.shape).copy(), s)


def make_sweep_step(
    geom: TankGeometry,
    props: PhysicalProperties = PhysicalProperties(),
    controls: SolverControls = SolverControls(),
):
    """vmapped step: (batched SimState, batched CaseParams) -> same.

    The per-case adaptive dt is synchronized to the batch minimum before
    stepping, keeping all cases on a common time axis.
    """
    step = make_step(geom, props, controls)

    vstep = jax.vmap(step)

    def sweep_step(states: SimState, params: CaseParams):
        dt_sync = jnp.min(states.dt)
        states = dataclasses.replace(
            states, dt=jnp.broadcast_to(dt_sync, states.dt.shape)
        )
        return vstep(states, params)

    return sweep_step


def run_sweep(
    geom: TankGeometry,
    param_rows: list[dict],
    t_end: float,
    props: PhysicalProperties = PhysicalProperties(),
    controls: SolverControls = SolverControls(),
    max_steps: int = 100_000,
):
    """Advance a whole sweep batch to t_end. Returns (states, n_steps)."""
    params = batch_params(param_rows)
    states = batch_states(geom, len(param_rows))
    sweep_step = make_sweep_step(geom, props, controls)

    @jax.jit
    def advance(states, params):
        def cond(c):
            s, n = c
            return jnp.logical_and(jnp.min(s.t) < t_end, n < max_steps)

        def body(c):
            s, n = c
            s2, _ = sweep_step(s, params)
            return s2, n + 1

        return jax.lax.while_loop(cond, body, (states, jnp.asarray(0, jnp.int32)))

    states, n = advance(states, params)
    return states, int(np.asarray(n))
