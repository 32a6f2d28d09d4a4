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


def test_height_function_curvature_sinusoid():
    """curvature_hf on an analytic sinusoidal interface matches the exact
    graph curvature to <2% (slope fit over the interior) — the accuracy
    class the smoothed-VoF estimator cannot reach (~65% of stiffness at
    this resolution); the blend must select HF here (near-horizontal
    interface) and VoF on a vertical-column interface where a z height
    function is undefined."""
    import jax.numpy as jnp

    from openfoam_tpp_tpu.mesh import build_box_geometry
    from openfoam_tpp_tpu.solver import momentum as mom

    mesh = 4e-4
    L, W, Hb = 0.008, 0.0024, 0.008
    geom = build_box_geometry(L, W, Hb, mesh, z0=0.0, open_top=True)
    x, _, zc = geom.cell_centers()
    hz = geom.spacing[2]
    k, A, depth = np.pi / L, 3e-4, 0.004
    xs = np.asarray(x)
    eta = depth + A * np.cos(k * (xs + L / 2))
    frac = np.clip(
        (eta[:, None, None] - (np.asarray(zc)[None, None, :] - hz / 2)) / hz,
        0.0, 1.0)
    alpha = jnp.asarray(
        np.where(np.asarray(geom.vfrac) > 0, frac, 0.0), jnp.float32)
    vfrac = jnp.asarray(geom.vfrac)

    k2d = np.asarray(mom.curvature_hf(alpha, geom.spacing, vfrac))[:, :, 0]
    hx_slope = A * k * np.sin(k * (xs + L / 2))
    k_exact = A * k * k * np.cos(k * (xs + L / 2)) \
        / (1.0 + hx_slope ** 2) ** 1.5
    mid = geom.shape[1] // 2
    slope = np.polyfit(k_exact[2:-2], k2d[2:-2, mid], 1)[0]
    assert abs(slope - 1.0) < 0.02, slope

    # Blend selects HF on the near-horizontal interface...
    kb = np.asarray(mom.curvature(alpha, geom.spacing, vfrac=vfrac,
                                  method="blend"))
    iz = int(depth / hz)
    np.testing.assert_allclose(kb[2:-2, mid, iz], k2d[2:-2, mid],
                               rtol=1e-5)
    # ...and falls back to the VoF estimator on a VERTICAL interface
    # (liquid slab in x: n_z = 0, column height function undefined).
    slab = jnp.asarray(
        np.where(xs < 0.0, 1.0, 0.0)[:, None, None]
        * np.ones(geom.shape, np.float32) * (np.asarray(geom.vfrac) > 0),
        jnp.float32)
    kv, _ = mom.curvature_vof(slab, geom.spacing)
    kb2 = np.asarray(mom.curvature(slab, geom.spacing, vfrac=vfrac,
                                   method="blend"))
    np.testing.assert_allclose(kb2, np.asarray(kv), atol=1e-6)
