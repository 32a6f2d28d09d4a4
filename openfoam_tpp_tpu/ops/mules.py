"""Bounded compressive VoF advection (MULES-class), fully vectorized.

Reproduces the behavioral contract of the reference solver's alpha
equation — `div(phi,alpha) Gauss interfaceCompression vanLeer 1` with
MULES limiting, nAlphaSubCycles 3, nLimiterIter 3
(/root/reference/circularSloshingTank/system/fvSchemes:30,
fvSolution:19-23) — as a flux-corrected-transport (Zalesak) scheme:

  * low-order flux  : donor-cell upwind of alpha with the volumetric flux
  * high-order flux : van Leer MUSCL reconstruction + artificial
                      interface-compression flux  cAlpha·|u|·n̂ α(1−α)
  * limiter         : iterative Zalesak FCT keeping alpha in
                      [max(0, local min), min(1, local max)]

Unlike OpenFOAM's cell-sweep limiter, every stage is a dense stencil op —
the iterative limiter is 3 Jacobi-style passes, ideal for the TPU VPU.

Also produces the phase-consistent mass flux `rhoPhi` used by conservative
momentum transport (interFoam's rhoPhi; critical at density ratio 1000:1).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from openfoam_tpp_tpu.ops import stencil as st


def _neighbor_max(a):
    out = a
    for ax in range(3):
        out = jnp.maximum(out, jnp.maximum(st.shift_down(a, ax), st.shift_up(a, ax)))
    return out


def _neighbor_min(a):
    out = a
    for ax in range(3):
        out = jnp.minimum(out, jnp.minimum(st.shift_down(a, ax), st.shift_up(a, ax)))
    return out


def interface_normals_at_faces(alpha, spacing, eps=1e-8):
    """Unit interface normal components at the three face sets."""
    hx, hy, hz = spacing
    gx = st.faces_to_cells_avg(st.gradient_at_faces(alpha, 0, hx), 0)
    gy = st.faces_to_cells_avg(st.gradient_at_faces(alpha, 1, hy), 1)
    gz = st.faces_to_cells_avg(st.gradient_at_faces(alpha, 2, hz), 2)
    mag = jnp.sqrt(gx * gx + gy * gy + gz * gz) + eps
    nxf = st.cells_to_faces_avg(gx / mag, 0)
    nyf = st.cells_to_faces_avg(gy / mag, 1)
    nzf = st.cells_to_faces_avg(gz / mag, 2)
    return nxf, nyf, nzf


def compression_fluxes(alpha, phi, apertures, spacing, c_alpha):
    """Per-axis compression velocity u_c = cAlpha·|u|·n̂ (aperture-weighted
    via A·u in phi; |u| recovered on open faces only).

    Computed ONCE per advection call, not per subcycle — interFoam parity
    (phic/nHatf are evaluated before the alpha sub-cycle loop) and ~20
    fewer stencil passes per step."""
    if c_alpha <= 0.0:
        return None
    normals = interface_normals_at_faces(alpha, spacing)
    ucs = []
    for ax in range(3):
        f = phi[ax]
        a_ap = apertures[ax]
        u_face = f / jnp.maximum(a_ap, 1e-6)
        ucs.append(c_alpha * jnp.abs(u_face) * normals[ax] * a_ap)
    return tuple(ucs)


def _face_fluxes(alpha, phi, u_cs):
    """Per-axis (low-order, antidiffusive) alpha fluxes."""
    lows, antis = [], []
    for ax in range(3):
        f = phi[ax]
        # Low-order: donor-cell upwind.
        low = f * st.upwind_faces(alpha, f, ax)
        # High-order: van Leer MUSCL.
        high = f * st.vanleer_faces(alpha, f, ax)
        if u_cs is not None:
            u_c = u_cs[ax]
            ac = st.vanleer_faces(alpha, u_c, ax)
            high = high + u_c * ac * (1.0 - ac)
        lows.append(low)
        antis.append(high - low)
    return lows, antis


def _apply_top_bc(flux_z, phi_z, alpha):
    """Atmosphere patch: outflow carries interior alpha, inflow carries
    alpha=0 (`inletOutlet` with inletValue 0, 0/alpha.water:27-31)."""
    top_out = jnp.maximum(phi_z[:, :, -1], 0.0) * alpha[:, :, -1]
    return flux_z.at[:, :, -1].set(top_out)


def _div(fluxes, spacing):
    return st.divergence(fluxes[0], fluxes[1], fluxes[2], spacing)


def _fct_limited(alpha_n, alpha_low, antis, dt, spacing, inv_vol, fluid,
                 n_iters, use_pallas=False, fct_bf16=False, spmd=None):
    """Iterative Zalesak limiter: returns the LIMITED antidiffusive
    fluxes λ·anti (face layout) after `n_iters` iterations."""
    hx, hy, hz = spacing

    amax = jnp.minimum(1.0, _neighbor_max(jnp.maximum(alpha_n, alpha_low)))
    amin = jnp.maximum(0.0, _neighbor_min(jnp.minimum(alpha_n, alpha_low)))

    if use_pallas:
        # Fused limiter kernels (ops/pallas/mules_fct.py): face arrays
        # cross into the kernel's cell (lower-face) layout — the dropped
        # global upper-boundary faces are identically zero.
        from openfoam_tpp_tpu.ops.pallas import mules_fct as mf

        # (A slab-resident ALL-iterations variant was built and measured
        # in the r3 TPU A/B: 158.3M vs 160.4M updates/s — the 3x working
        # set forced a narrow slab whose halo re-reads ate the saved
        # launches. Deleted per win-or-delete; git history @ 80f202c.)
        dt_iv = dt * inv_vol
        cell_antis = (antis[0][:-1], antis[1][:, :-1], antis[2][:, :, :-1])
        # bf16 λ/anti streams halve the limiter's HBM traffic (its
        # dominant cost: 6 face arrays × n_iters passes). Sound because
        # λ ∈ [0,1] is a limiter weight and anti is a CORRECTION flux;
        # bounds/α stay f32 and the final α update clips to [0,1] — mass
        # telescoping is exact either way (one value per face).
        lam_dt = jnp.bfloat16 if fct_bf16 else alpha_low.dtype
        cell_antis = tuple(a.astype(lam_dt) for a in cell_antis)
        lams = tuple(jnp.zeros(alpha_low.shape, lam_dt) for _ in range(3))
        if spmd is not None:
            # One shard_map island runs ALL iterations per shard with
            # ppermute λ-halo rings (parallel/spmd.fct_iters).
            from openfoam_tpp_tpu.parallel import spmd as sm

            lams = sm.fct_iters(lams, cell_antis, alpha_low, amax, amin,
                                dt_iv, spacing, n_iters, spmd)
        else:
            for _ in range(n_iters):
                lams = mf.fct_iter(lams, cell_antis, alpha_low, amax,
                                   amin, dt_iv, spacing)
        f32 = alpha_low.dtype
        lim = tuple(l.astype(f32) * a.astype(f32)
                    for l, a in zip(lams, cell_antis))
        zx = jnp.zeros_like(lim[0][:1])
        zy = jnp.zeros_like(lim[1][:, :1])
        zz = jnp.zeros_like(lim[2][:, :, :1])
        return (jnp.concatenate([lim[0], zx], 0),
                jnp.concatenate([lim[1], zy], 1),
                jnp.concatenate([lim[2], zz], 2))

    lam = [jnp.zeros_like(a) for a in antis]

    def body(_, lam):
        lam_ax, lam_ay, lam_az = lam
        applied = (lam_ax * antis[0], lam_ay * antis[1], lam_az * antis[2])
        a_work = alpha_low - dt * inv_vol * _div(applied, spacing)
        rem = ((1.0 - lam_ax) * antis[0],
               (1.0 - lam_ay) * antis[1],
               (1.0 - lam_az) * antis[2])
        # P± : total remaining antidiffusive in/outflow per cell.
        p_in = jnp.zeros_like(alpha_low)
        p_out = jnp.zeros_like(alpha_low)
        for ax, h in zip(range(3), (hx, hy, hz)):
            r = rem[ax]
            lo = r[st._sl(ax, slice(0, -1))]   # flux through lower face
            hi = r[st._sl(ax, slice(1, None))]  # flux through upper face
            p_in = p_in + (jnp.maximum(lo, 0.0) - jnp.minimum(hi, 0.0)) / h
            p_out = p_out + (jnp.maximum(hi, 0.0) - jnp.minimum(lo, 0.0)) / h
        p_in = dt * inv_vol * p_in
        p_out = dt * inv_vol * p_out
        eps = 1e-12
        r_plus = jnp.clip((amax - a_work) / (p_in + eps), 0.0, 1.0)
        r_minus = jnp.clip((a_work - amin) / (p_out + eps), 0.0, 1.0)

        new_lam = []
        for ax in range(3):
            rp_l, rp_r = st.face_lr(r_plus, ax)
            rm_l, rm_r = st.face_lr(r_minus, ax)
            c = jnp.where(rem[ax] >= 0.0,
                          jnp.minimum(rm_l, rp_r),
                          jnp.minimum(rp_l, rm_r))
            new_lam.append(jnp.clip(lam[ax] + (1.0 - lam[ax]) * c, 0.0, 1.0))
        return tuple(new_lam)

    lam = jax.lax.fori_loop(0, n_iters, body, tuple(lam))
    return tuple(l * a for l, a in zip(lam, antis))


def advect_alpha(
    alpha,
    phi,            # (phi_x, phi_y, phi_z): aperture-weighted face velocity A·u
    geom_arrays,    # dict with 'vfrac', 'ax', 'ay', 'az' jnp arrays
    spacing,
    dt,
    rho1, rho2,
    c_alpha=1.0,
    n_subcycles=3,
    n_limiter_iters=3,
    use_pallas=False,
    fct_bf16=False,
    spmd=None,
):
    """Advance alpha over `dt` with `n_subcycles` FCT sub-steps.

    Returns (alpha_new, rhoPhi tuple) where rhoPhi_f = rho1·Fα + rho2·(φ−Fα)
    uses the time-averaged limited alpha flux (momentum-consistent mass flux).

    `spmd` (parallel/spmd.SpmdCtx): run the fused flux/FCT kernels
    per shard under shard_map with ppermute halo rings — kernel
    feasibility then checks the PER-SHARD shape.
    """
    vfrac = geom_arrays["vfrac"]
    apertures = (geom_arrays["ax"], geom_arrays["ay"], geom_arrays["az"])
    fluid = vfrac > 0.0
    inv_vol = jnp.where(fluid, 1.0 / jnp.maximum(vfrac, 0.5), 0.0)

    dt_sub = dt / n_subcycles
    u_cs = compression_fluxes(alpha, phi, apertures, spacing, c_alpha)
    use_flux_kernel = False
    if use_pallas:
        from openfoam_tpp_tpu.ops.pallas import mules_fct as mf
        from openfoam_tpp_tpu.ops.pallas import mules_flux as mfx

        if spmd is not None:
            use_pallas = spmd.supports(mf.supported, alpha.shape,
                                       alpha.dtype)
            use_flux_kernel = (
                use_pallas
                and u_cs is not None
                and spmd.supports(mfx.supported, alpha.shape, alpha.dtype)
            )
        else:
            use_pallas = mf.supported(alpha.shape, alpha.dtype)
            use_flux_kernel = (
                use_pallas
                and u_cs is not None
                and mfx.supported(alpha.shape, alpha.dtype)
            )
    fct_bf16 = bool(fct_bf16) and use_pallas
    if use_flux_kernel:
        # Cell lower-face layout views (the kernel's native layout; the
        # dropped global upper-boundary faces are wall-zeros / the
        # top plane rewritten by _apply_top_bc below either way).
        uc_dt = jnp.bfloat16 if fct_bf16 else alpha.dtype
        phis_cell = (phi[0][:-1], phi[1][:, :-1], phi[2][:, :, :-1])
        ucs_cell = tuple(
            u.astype(uc_dt)
            for u in (u_cs[0][:-1], u_cs[1][:, :-1], u_cs[2][:, :, :-1]))

    def _cell_to_faces(arrs):
        """Re-append the implicit zero upper-boundary plane per axis."""
        fx, fy, fz = arrs
        return [
            jnp.concatenate([fx, jnp.zeros_like(fx[:1])], 0),
            jnp.concatenate([fy, jnp.zeros_like(fy[:, :1])], 1),
            jnp.concatenate([fz, jnp.zeros_like(fz[:, :, :1])], 2),
        ]

    def subcycle(carry, _):
        a, flux_acc = carry
        if use_flux_kernel:
            if spmd is not None:
                from openfoam_tpp_tpu.parallel import spmd as sm

                lows_c, antis_c = sm.flux_all(
                    a, phis_cell, ucs_cell, spmd,
                    anti_dtype=jnp.bfloat16 if fct_bf16 else None)
            else:
                lows_c, antis_c = mfx.flux_all(
                    a, phis_cell, ucs_cell,
                    anti_dtype=jnp.bfloat16 if fct_bf16 else None)
            lows = _cell_to_faces(lows_c)
            antis = _cell_to_faces(antis_c)
        else:
            lows, antis = _face_fluxes(a, phi, u_cs)
            lows = list(lows)
            antis = list(antis)
        lows[2] = _apply_top_bc(lows[2], phi[2], a)
        antis[2] = antis[2].at[:, :, -1].set(0.0)

        a_low = a - dt_sub * inv_vol * _div(lows, spacing)
        limited = _fct_limited(a, a_low, antis, dt_sub, spacing, inv_vol,
                               fluid, n_limiter_iters,
                               use_pallas=use_pallas, fct_bf16=fct_bf16,
                               spmd=spmd)
        a_new = a_low - dt_sub * inv_vol * _div(limited, spacing)
        a_new = jnp.where(fluid, jnp.clip(a_new, 0.0, 1.0), 0.0)
        flux_acc = tuple(
            acc + (lo + li) / n_subcycles
            for acc, lo, li in zip(flux_acc, lows, limited)
        )
        return (a_new, flux_acc), None

    zero_flux = tuple(jnp.zeros_like(p) for p in phi)
    (alpha_new, alpha_flux), _ = jax.lax.scan(
        subcycle, (alpha, zero_flux), None, length=n_subcycles
    )

    rho_phi = tuple(
        rho1 * fa + rho2 * (p - fa) for fa, p in zip(alpha_flux, phi)
    )
    return alpha_new, rho_phi, alpha_flux
