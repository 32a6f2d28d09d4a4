"""CSF surface tension vs the Laplace pressure-jump oracle.

The reference templates ship sigma = 0 (constant/phaseProperties:17-19),
but the CSF machinery (solver/momentum.py csf_force/curvature) is a
first-class capability here. Oracle: a static water COLUMN (cylinder of
radius R in xy, uniform in z, zero gravity) must carry an interior
pressure jump Δp = σ·κ = σ/R, with bounded parasitic currents — the
standard Brackbill-CSF verification.
"""

import dataclasses

import jax
import numpy as np

from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
from openfoam_tpp_tpu.core.state import CaseParams, init_state
from openfoam_tpp_tpu.mesh import build_box_geometry
from openfoam_tpp_tpu.solver.timestep import make_step


def test_laplace_pressure_jump_cylinder_column():
    mesh = 0.001
    L, Lz = 0.016, 0.006
    R0 = 0.004
    sigma = 0.072
    geom = build_box_geometry(L, L, Lz, mesh, z0=0.0, open_top=False)
    props = dataclasses.replace(PhysicalProperties(), sigma=sigma, g=0.0)
    controls = SolverControls(p_max_iters=30)
    step = jax.jit(make_step(geom, props, controls))
    params = CaseParams.make(R=0.0, freq=0.0, duration=1.0)

    state = init_state(geom, dt0=5e-5)
    # Water column: alpha from a sub-cell-smoothed radial profile.
    nx, ny, nz = geom.shape
    x = (np.arange(nx) + 0.5) * mesh - L / 2.0
    y = (np.arange(ny) + 0.5) * mesh - L / 2.0
    r = np.sqrt(x[:, None] ** 2 + y[None, :] ** 2)
    prof = np.clip(0.5 - (r - R0) / mesh, 0.0, 1.0)
    alpha = np.broadcast_to(prof[:, :, None], geom.shape).copy()
    state = dataclasses.replace(state, alpha=np.asarray(alpha, np.float32))

    for _ in range(5):
        state, diag = step(state, params)

    a = np.asarray(state.alpha)
    p = np.asarray(state.p)
    core = a > 0.99
    # Exclude the smeared interface band AND the wall-adjacent cells.
    far = (a < 0.01) & (r[:, :, None] < L / 2.0 - 2 * mesh)
    assert core.any() and far.any()
    dp = p[core].mean() - p[far].mean()
    expected = sigma / R0
    # Brackbill CSF with smoothed-gradient curvature: the jump is right
    # to the curvature estimate's accuracy at 8 cells/radius (~15-25%).
    assert abs(dp - expected) / expected < 0.3, (dp, expected)

    # Parasitic currents stay capillary-small: U_par << sqrt(sigma/(rho h))
    umax = max(np.abs(np.asarray(state.u)).max(),
               np.abs(np.asarray(state.v)).max(),
               np.abs(np.asarray(state.w)).max())
    u_cap = np.sqrt(sigma / (998.2 * mesh))
    assert umax < 0.1 * u_cap, (umax, u_cap)
    # Column mass conserved.
    assert abs(a.sum() - alpha.sum()) < 1e-3 * alpha.sum()
