"""Fused momentum megakernel vs the jnp reference path (interpret mode).

The kernel must reproduce solver/momentum.py's visc − conv at every OPEN
face (aperture > 0) — wall faces are masked downstream in the timestep.
"""

import jax
import jax.numpy as jnp
import numpy as np

from openfoam_tpp_tpu.config import PhysicalProperties
from openfoam_tpp_tpu.core.state import init_state, mixture_viscosity
from openfoam_tpp_tpu.mesh import build_tank_geometry
from openfoam_tpp_tpu.ops.pallas import momentum3 as m3
from openfoam_tpp_tpu.solver import momentum as mom
from openfoam_tpp_tpu.solver.timestep import geometry_arrays


def _random_fields(geom, seed=0):
    """Random MAC fields with wall faces zeroed (the packed contract)."""
    keys = jax.random.split(jax.random.PRNGKey(seed), 8)
    ga = geometry_arrays(geom)
    shp = geom.shape
    nx, ny, nz = shp

    def rand(k, s):
        return jax.random.normal(k, s, jnp.float32)

    u = rand(keys[0], (nx + 1, ny, nz)).at[-1].set(0.0).at[0].set(0.0)
    v = rand(keys[1], (nx, ny + 1, nz)).at[:, -1].set(0.0).at[:, 0].set(0.0)
    w = rand(keys[2], (nx, ny, nz + 1))
    rpx = (rand(keys[3], (nx + 1, ny, nz)) * ga["ax"])
    rpy = (rand(keys[4], (nx, ny + 1, nz)) * ga["ay"])
    rpz = (rand(keys[5], (nx, ny, nz + 1)) * ga["az"])
    alpha = jnp.clip(
        init_state(geom).alpha + 0.2 * rand(keys[6], shp), 0.0, 1.0
    )
    mu = mixture_viscosity(alpha, PhysicalProperties()) * 1e4  # O(1) scale
    return u, v, w, (rpx, rpy, rpz), mu, ga


def test_momentum_megakernel_matches_jnp():
    geom = build_tank_geometry(H=0.05, D=0.02, mesh=0.0025, geo="flat",
                               round_to=m3.SLAB)
    spacing = tuple(float(s) for s in geom.spacing)
    u, v, w, rho_phi, mu, ga = _random_fields(geom)

    # Reference: the jnp momentum path.
    mu_edges = mom.edge_viscosities(mu)
    refs = []
    for ax, q in enumerate((u, v, w)):
        conv = mom.convect_face_field(q, ax, rho_phi, spacing)
        visc = mom.viscous_face_field(q, ax, mu, spacing, mu_edges)
        refs.append(np.asarray(visc - conv))

    outs = m3.momentum_rhs_mac(u, v, w, rho_phi, mu, spacing,
                               interpret=True)
    masks = (np.asarray(ga["ax"]) > 0, np.asarray(ga["ay"]) > 0,
             np.asarray(ga["az"]) > 0)
    for ax, (ref, out, mask) in enumerate(zip(refs, outs, masks)):
        out = np.asarray(out)
        scale = np.abs(ref[mask]).max()
        err = np.abs(out - ref)[mask].max() / scale
        assert err < 1e-5, f"component {ax}: rel err {err}"


def test_w_top_plane_matches_jnp():
    """The separately computed atmosphere w-plane equals the jnp path's
    face-nz row."""
    geom = build_tank_geometry(H=0.05, D=0.02, mesh=0.0025, geo="flat",
                               round_to=m3.SLAB)
    spacing = tuple(float(s) for s in geom.spacing)
    u, v, w, rho_phi, mu, ga = _random_fields(geom, seed=3)

    mu_edges = mom.edge_viscosities(mu)
    conv = mom.convect_face_field(w, 2, rho_phi, spacing)
    visc = mom.viscous_face_field(w, 2, mu, spacing, mu_edges)
    ref = np.asarray(visc - conv)[:, :, -1]

    top = np.asarray(m3.w_top_rhs(u, v, w, rho_phi, mu, spacing))
    mask = np.asarray(ga["az"])[:, :, -1] > 0
    scale = max(np.abs(ref[mask]).max(), 1e-12)
    assert np.abs(top - ref)[mask].max() / scale < 1e-5
