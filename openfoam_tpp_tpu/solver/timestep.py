"""The jit-compiled VoF time step — the TPU replacement for the reference's
entire `foamRun incompressibleVoF` inner loop (SURVEY.md §3.2):

    per Δt: adapt dt from Co/alphaCo ≤ 0.5 → α sub-cycles (MULES ×3) →
    explicit momentum (vanLeerV convection with rhoPhi, viscous) →
    uniform effective-gravity forcing G(t) = g − a_frame(t) + CSF →
    pressure projection (MG-preconditioned CG) → flux/velocity correction.

`make_step(geom, props, controls)` returns a pure function
`step(state, params) -> (state', diag)` suitable for `jax.jit`,
`jax.vmap` over CaseParams (parameter sweeps) and sharded jit over a
device mesh (halo exchange inserted by XLA).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
from openfoam_tpp_tpu.core import motion as mo
from openfoam_tpp_tpu.core.state import SimState, mixture_density, mixture_viscosity
from openfoam_tpp_tpu.mesh.geometry import TankGeometry
from openfoam_tpp_tpu.ops import mules
from openfoam_tpp_tpu.ops import stencil as st
from openfoam_tpp_tpu.solver import frame as fr
from openfoam_tpp_tpu.solver import momentum as mom
from openfoam_tpp_tpu.solver import poisson


def _mom_pallas_enabled(controls: SolverControls) -> bool:
    """Fused momentum-RHS kernel gate (read at trace time so tests can
    flip it per-process). Default: follow ``controls.use_pallas`` — the
    r3 TPU A/B measured the kernel at 186.2M vs 160.4M cell-updates/s
    steady (+16%, 11.48 wall-s/shaking-period) on the 1M-cell flagship,
    so it is ON wherever the other fused kernels are. OFTPP_MOM_PALLAS
    =0/1 overrides (the r2 megakernel that measured SLOWER was a packed-
    layout design, deleted; this one is ops/pallas/momentum_rhs.py)."""
    import os

    if controls.mom_pallas is False:
        # An explicit False is a STRUCTURAL pin (the vmapped sweep paths
        # set it: the kernel is a single-grid program and measured slower
        # under vmap, 130.0M vs 142.1M — parallel/sweep.py) and beats the
        # env override; OFTPP_MOM_PALLAS=1 there would silently degrade
        # sweep throughput (ADVICE r3).
        return False
    env = os.environ.get("OFTPP_MOM_PALLAS")
    if env is not None:
        return env == "1"
    if controls.mom_pallas is not None:
        return controls.mom_pallas
    return controls.use_pallas


def _finish_pallas_enabled(controls: SolverControls) -> bool:
    """Fused momentum-finish kernel gate (ops/pallas/mom_finish.py).
    OFTPP_FINISH_PALLAS=1 opts in (awaiting the TPU A/B; parity:
    tests/test_pallas_finish.py). Applies only where the fused RHS
    kernel ran AND the sources that the jnp path adds between the
    density scaling and the wall mask are absent (no rotating frame, no
    CSF, scalar G)."""
    import os

    if controls.mom_pallas is False:
        return False   # structural single-grid pin (vmapped sweeps)
    return os.environ.get("OFTPP_FINISH_PALLAS") == "1"


def _corr_pallas_enabled(controls: SolverControls) -> bool:
    """Fused projection-epilogue kernel gate (velocity correction +
    divergence max in one pass, ops/pallas/correction.py). Default:
    follow use_pallas — the r4 TPU A/B measured 212.1M vs 203.3M
    cell-updates/s steady (+4.3%) with an identical p_iters histogram
    on the 1M-cell flagship. OFTPP_CORR_PALLAS=0/1 overrides; parity:
    tests/test_pallas_correction.py."""
    import os

    if controls.mom_pallas is False:
        return False   # structural single-grid pin (vmapped sweeps)
    env = os.environ.get("OFTPP_CORR_PALLAS")
    if env is not None:
        return env == "1"
    return controls.use_pallas


def _fct_bf16_enabled(controls: SolverControls) -> bool:
    """bf16 FCT streams (config.py fct_bf16). OFTPP_FCT_BF16=0/1
    overrides — read at trace time so A/B arms can flip per-process."""
    import os

    env = os.environ.get("OFTPP_FCT_BF16")
    if env is not None:
        return env == "1"
    return controls.fct_bf16


class StepDiagnostics(NamedTuple):
    """Per-step scalars (the reference's solver-log numbers)."""

    courant: jax.Array        # max Courant number of the step taken
    alpha_courant: jax.Array  # max interface Courant number
    p_residual: jax.Array     # final pressure residual norm
    p_iters: jax.Array        # CG iterations used
    div_error: jax.Array      # max |div(phi)| after correction (continuity)
    alpha_min: jax.Array      # bounds check ("bounding alpha.water" parity)
    alpha_max: jax.Array


def geometry_arrays(geom: TankGeometry, dtype=jnp.float32):
    """Upload static geometry to device arrays once."""
    as_j = lambda a: jnp.asarray(a, dtype)
    return {
        "vfrac": as_j(geom.vfrac),
        "ax": as_j(geom.ax),
        "ay": as_j(geom.ay),
        "az": as_j(geom.az),
        "top_open": as_j(geom.top_open),
    }


def make_step_core(
    props: PhysicalProperties = PhysicalProperties(),
    controls: SolverControls = SolverControls(),
    motion: mo.TableMotion | None = None,
    open_top: bool = True,
    face_xyz=None,
    forcing=None,
    sync_axis: str | None = None,
    carry_precond: bool = False,
    sealed_x: bool = True,
    spmd=None,
):
    """Build the geometry-generic step:
    `step(state, params, ga, spacing, t_stop) -> (state', diag)`.

    `ga` (the geometry_arrays dict) and `spacing` are ARGUMENTS, not
    closure constants — the same compiled core serves every geometry of a
    given shape, and vmapping over a leading/trailing batch axis of `ga`
    yields geometry-batched (H, D, geo) sweeps (the reference's Cartesian
    sweep engine, /root/reference/main.py:504-534). `make_step` wraps it
    with a fixed geometry closed over (constant-folded by XLA).

    `spmd` (parallel/spmd.SpmdCtx): the step runs under a spatial device
    mesh — every fused Pallas kernel call becomes a per-shard shard_map
    island with explicit lax.ppermute halo rings (feasibility checked on
    the PER-SHARD shape), instead of pinning off to the jnp path as the
    plain GSPMD route does (~20%/chip forfeit, docs/ROADMAP.md
    "GSPMD-vs-fused-kernel gap"). Everything between islands still
    lowers through GSPMD. The momentum-FINISH kernel stays off under
    spmd (opt-in only, no halo variant).

    `carry_precond=True` changes the signature to
    `step(state, params, ga, spacing, t_stop, precond) ->
    (state', diag, precond')`: the bf16 MG preconditioner bundle
    (poisson.make_bundle — physics-neutral, see build_operator) is taken
    from the caller's loop carry and refreshed only every
    `controls.precond_refresh` steps, amortizing its construction cost.
    The operator itself is rebuilt from the current ρ every step.
    """
    rot_enabled = motion is not None and motion.has_rotation
    if rot_enabled and face_xyz is None:
        raise ValueError("rotational motion requires face_xyz coordinates")
    # The fused momentum-RHS / finish / projection-epilogue kernels all
    # emit ZEROS for u's face-nx row (sealed-wall assumption, true for
    # every shipped geometry). `sealed_x=False` (an open +x face) pins
    # them to the jnp path — which masks by the actual aperture — and an
    # explicit env force on such a geometry fails loudly (ADVICE r4).
    if not sealed_x:
        import os as _os

        for _v in ("OFTPP_MOM_PALLAS", "OFTPP_FINISH_PALLAS",
                   "OFTPP_CORR_PALLAS"):
            if _os.environ.get(_v) == "1":
                raise ValueError(
                    f"{_v}=1 forced on a geometry whose +x face is not "
                    "sealed (last x-aperture plane has open faces): the "
                    "fused kernels hard-code zeros there and would "
                    "silently diverge from the aperture-masked jnp path")
    # `forcing(t, params) -> (Gx, Gy, Gz)` overrides the uniform
    # effective-gravity computation; components may be scalars or arrays
    # varying along x (piecewise-constant per case block — the tiled
    # sweep layout, parallel/tiled_sweep.py).

    def effective_g(t, params):
        """Uniform body acceleration in the tank frame.

        Pure translation: G = g − a_frame. With rotation the lab vectors
        are additionally rotated into the tank frame by Rᵀ."""
        if motion is None:
            return mo.effective_gravity(t, params, props.g)
        a = motion.acceleration(t)
        g_lab = jnp.asarray([0.0, 0.0, -props.g], a.dtype)
        if rot_enabled:
            R = mo.rotation_matrix(motion.orientation(t))
            return R.T @ (g_lab - a)
        return g_lab - a

    def interp_to_faces(q, qax, ax):
        """Velocity component living on qax-faces, averaged to ax-faces."""
        if qax == ax:
            return q
        return st.cells_to_faces_avg(st.faces_to_cells_avg(q, qax), ax)

    def courant_numbers(u, v, w, alpha, dt, fluid, spacing):
        """Cell Courant and interface Courant (controlDict maxCo/maxAlphaCo)."""
        hx, hy, hz = spacing
        speed = (
            jnp.abs(st.faces_to_cells_avg(u, 0)) / hx
            + jnp.abs(st.faces_to_cells_avg(v, 1)) / hy
            + jnp.abs(st.faces_to_cells_avg(w, 2)) / hz
        )
        co = dt * jnp.max(jnp.where(fluid, speed, 0.0))
        near_if = (alpha > 0.01) & (alpha < 0.99)
        co_a = dt * jnp.max(jnp.where(fluid & near_if, speed, 0.0))
        # Interface compression doubles the effective phase-flux speed.
        return co, co_a * (1.0 + controls.c_alpha)

    def step(state: SimState, params, ga, spacing,
             t_stop=None, precond=None):
        hx, hy, hz = spacing
        fluid = ga["vfrac"] > 0.0
        masks = (ga["ax"] > 0.0, ga["ay"] > 0.0, ga["az"] > 0.0)
        # --- adaptive dt (controlDict:45-51 adjustTimeStep semantics) ---
        co, co_a = courant_numbers(state.u, state.v, state.w, state.alpha,
                                   state.dt, fluid, spacing)
        limit = jnp.minimum(
            controls.max_co / jnp.maximum(co / state.dt, 1e-10),
            controls.max_alpha_co / jnp.maximum(co_a / state.dt, 1e-10),
        )
        dt_cfl = jnp.minimum(
            jnp.minimum(controls.dt_growth * state.dt, limit),
            controls.max_dt,
        ).astype(state.dt.dtype)
        # --- explicit-stability dt bounds (SolverControls.max_diff_co /
        # max_capillary_co). The reference's viscous solve is implicit so
        # OpenFOAM gets these for free (controlDict:47-51 only caps Co);
        # our explicit momentum update must cap dt itself or a quiescent
        # case drifts to max_dt and blows up in the air phase.
        if controls.max_diff_co > 0.0:
            inv_h2 = 1.0 / hx ** 2 + 1.0 / hy ** 2 + 1.0 / hz ** 2
            nu_max = max(props.nu1, props.nu2)
            dt_cfl = jnp.minimum(
                dt_cfl, controls.max_diff_co / (nu_max * inv_h2)
            ).astype(state.dt.dtype)
        if props.sigma != 0.0 and controls.max_capillary_co > 0.0:
            # Brackbill CSF capillary-wave limit on the finest spacing.
            h_min = jnp.minimum(jnp.minimum(hx, hy), hz)
            dt_cap = controls.max_capillary_co * jnp.sqrt(
                (props.rho1 + props.rho2) * h_min ** 3
                / (4.0 * np.pi * abs(props.sigma))
            )
            dt_cfl = jnp.minimum(dt_cfl, dt_cap).astype(state.dt.dtype)
        if sync_axis is not None:
            # Lockstep batched sweeps: every vmapped lane takes the batch-
            # min CFL dt, so case times stay bitwise identical and land on
            # the write grid together (manager/sweeprun.py).
            dt_cfl = jax.lax.pmin(dt_cfl, sync_axis)

        # --- adjustableRunTime (controlDict:29-32): split the time to the
        # next write target (and t_stop, if given) into equal steps each
        # <= dt_cfl, so the run lands EXACTLY on the k*writeInterval grid —
        # checkpoint times are exact 0.05 multiples, matching the
        # reference's 401 evenly spaced outputs per 20 s run. The landing
        # time is snapped bitwise to (k+1)*w so driver loops comparing
        # t < t_target terminate without epsilon games.
        w = float(controls.write_interval)
        if w > 0.0:
            wj = jnp.asarray(w, dt_cfl.dtype)
            k_next = jnp.floor(state.t / wj + 1e-4) + 1.0
            t_next = k_next * wj
        else:
            t_next = jnp.asarray(jnp.inf, dt_cfl.dtype)
        if t_stop is not None:
            t_next = jnp.minimum(t_next, jnp.asarray(t_stop, dt_cfl.dtype))
        rem = jnp.maximum(t_next - state.t, jnp.asarray(1e-12, dt_cfl.dtype))
        finite = jnp.isfinite(rem)
        n_split = jnp.maximum(jnp.ceil(rem / dt_cfl - 1e-4), 1.0)
        dt = jnp.where(finite, rem / n_split, dt_cfl)
        t_new = jnp.where(finite & (n_split <= 1.0), t_next, state.t + dt)

        # --- alpha advection with the divergence-free flux from step n ---
        phi = (ga["ax"] * state.u, ga["ay"] * state.v, ga["az"] * state.w)
        alpha_new, rho_phi, _ = mules.advect_alpha(
            state.alpha, phi, ga, spacing, dt,
            props.rho1, props.rho2,
            c_alpha=controls.c_alpha,
            n_subcycles=controls.n_alpha_subcycles,
            n_limiter_iters=controls.n_limiter_iters,
            # batch_lanes (vmapped sweeps): the MULES kernels are
            # single-grid programs whose vmap lowering runs one grid
            # step per case (lane-padded) — slower than the
            # lane-vectorized jnp path; only the 7-point pressure
            # kernels have batch-native variants (config.py).
            use_pallas=controls.use_pallas and not controls.batch_lanes,
            fct_bf16=_fct_bf16_enabled(controls),
            spmd=spmd,
        )

        rho_old = mixture_density(state.alpha, props)
        rho_new = mixture_density(alpha_new, props)
        mu = mixture_viscosity(alpha_new, props)

        # --- Poisson operator for the new density (also supplies the
        #     face 1/ρ interpolants shared by forces & correction) ---
        prob, pack = poisson.build_operator(
            ga, spacing, rho_new, ga["top_open"] if open_top else None,
            use_pallas=controls.use_pallas, spmd=spmd,
        )
        if carry_precond and precond is not None:
            # Amortized refresh: the bundle is ONLY a preconditioner (any
            # fixed symmetric M is valid inside CG), so reusing a K-step-
            # stale hierarchy is physics-exact — it just smooths with the
            # interface where it was up to K steps ago (≤ K/2 cells away
            # at maxAlphaCo 0.5).
            K = max(int(controls.precond_refresh), 1)
            if K <= 1:
                bundle = poisson.make_bundle(
                    pack, use_pallas=controls.use_pallas, spmd=spmd)
            else:
                bundle = jax.lax.cond(
                    state.step % K == 0,
                    lambda: poisson.make_bundle(
                        pack, use_pallas=controls.use_pallas, spmd=spmd),
                    lambda: precond,
                )
        else:
            bundle = poisson.make_bundle(pack,
                                         use_pallas=controls.use_pallas,
                                         spmd=spmd)
        prob = poisson.attach_precond(prob, bundle, spmd=spmd)
        beta_f = prob.beta_faces

        # --- explicit conservative momentum (no pressure, no gravity) ---
        t_mid = state.t + 0.5 * dt
        G = forcing(t_mid, params) if forcing is not None \
            else effective_g(t_mid, params)
        if rot_enabled:
            omega_b, domega_b = fr.angular_rates(motion, t_mid)

        kappa = None
        if props.sigma != 0.0:
            kappa = mom.curvature(alpha_new, spacing, vfrac=ga["vfrac"],
                                  method=controls.csf_curvature)

        vels = (state.u, state.v, state.w)
        # dev2 transpose stress (fvSchemes:32 parity): ∇·U from the step-n
        # aperture-weighted fluxes (≈ 0 after the previous projection).
        div_u = (st.divergence(*phi, spacing)
                 if controls.dev2_stress else None)
        # Fused momentum RHS kernel (visc + dev2 − conv in one pass over
        # all three components) — measured +16% on the flagship
        # (docs/ROADMAP.md §6e).
        fused_rhs = None
        if sealed_x and _mom_pallas_enabled(controls):
            from openfoam_tpp_tpu.ops.pallas import momentum_rhs as _mrk

            ok = (spmd.supports(_mrk.supported, state.alpha.shape,
                                state.alpha.dtype) if spmd is not None
                  else _mrk.supported(state.alpha.shape, state.alpha.dtype))
            if ok:
                try:
                    # Traced spacing (geometry-batched sweep lanes) can't
                    # feed the static kernel args — stay on the jnp path.
                    h_static = tuple(float(h) for h in spacing)
                except (TypeError, jax.errors.TracerArrayConversionError):
                    h_static = None
                if h_static is not None and spmd is not None:
                    from openfoam_tpp_tpu.parallel import spmd as _sm

                    fused_rhs = _sm.momentum_rhs(
                        state.u, state.v, state.w, rho_phi, mu, div_u,
                        h_static, spmd, dev2=bool(controls.dev2_stress))
                elif h_static is not None:
                    fused_rhs = _mrk.momentum_rhs(
                        state.u, state.v, state.w, rho_phi, mu, div_u,
                        h_static, dev2=bool(controls.dev2_stress))
        # Fused momentum FINISH kernel (ops/pallas/mom_finish.py): the
        # density face-means + explicit update + gravity + wall mask for
        # all three components in one pass. Only valid where the sources
        # the jnp loop adds between the density scaling and the mask are
        # absent: no rotating frame, no CSF, scalar G components.
        finished = None
        if (fused_rhs is not None and not rot_enabled and kappa is None
                and spmd is None and _finish_pallas_enabled(controls)):
            from openfoam_tpp_tpu.ops.pallas import mom_finish as _mfk

            G3 = tuple(G[i] for i in range(3))
            if (_mfk.supported(state.alpha.shape, state.alpha.dtype)
                    and all(getattr(g, "ndim", 0) == 0 for g in G3)):
                # momentum_rhs pads au to faces; the finish kernel wants
                # it cell-shaped (it re-emits the zero face-nx row).
                finished = _mfk.momentum_finish(
                    state.u, state.v, state.w,
                    (fused_rhs[0][:-1], fused_rhs[1], fused_rhs[2]),
                    rho_old, rho_new, ga["ax"], ga["ay"], ga["az"],
                    dt, G3)

        mu_edges = None if fused_rhs is not None \
            else mom.edge_viscosities(mu)
        new_vels = []
        for ax, q in enumerate(vels):
            if finished is not None:
                new_vels.append(finished[ax])
                continue
            rof = st.cells_to_faces_avg(rho_old, ax)
            rnf = st.cells_to_faces_avg(rho_new, ax)
            if fused_rhs is not None:
                vc = fused_rhs[ax]
            else:
                conv = mom.convect_face_field(q, ax, rho_phi, spacing)
                visc = mom.viscous_face_field(q, ax, mu, spacing,
                                              mu_edges)
                vc = visc - conv
                if controls.dev2_stress:
                    vc = vc + mom.transpose_viscous_face_field(
                        vels, ax, mu, spacing, mu_edges, div_u)
            q_star = (rof * q + dt * vc) / rnf
            # Effective-gravity acceleration (total-p formulation — see
            # the forcing note in solver/momentum.py) + CSF. A forcing
            # component varying along its own axis is face-averaged
            # (junction faces between tiled cases are zero-aperture, so
            # the averaged value there is never used).
            Gc = G[ax]
            if getattr(Gc, "ndim", 0) == 3 and Gc.shape[ax] > 1:
                Gc = st.cells_to_faces_avg(Gc, ax)
            q_star = q_star + dt * Gc
            if rot_enabled:
                # Centrifugal + Euler + Coriolis sources of the rotating
                # tank frame (solver/frame.py; explicit in the old velocity).
                q_star = q_star + dt * fr.rotational_acceleration(
                    ax, face_xyz[ax], omega_b, domega_b,
                    interp_to_faces(vels[0], 0, ax),
                    interp_to_faces(vels[1], 1, ax),
                    interp_to_faces(vels[2], 2, ax),
                )
            if kappa is not None:
                q_star = q_star + dt * mom.csf_force(
                    alpha_new, kappa, props.sigma, ax, spacing[ax], beta_f[ax]
                )
            new_vels.append(jnp.where(masks[ax], q_star, 0.0))
        u_s, v_s, w_s = new_vels

        # --- projection (PIMPLE corrector loop, fvSolution:81 nCorrectors) ---
        # On the MAC grid one exact projection replaces the reference's
        # lagged-H/A corrector pair (solver/momentum.py module docstring);
        # n_correctors > 1 re-solves on the residual divergence of the
        # corrected flux — literal nCorrectors-structure parity, driving
        # the div error toward solver tolerance at one extra solve each.
        u_c, v_c, w_c = u_s, v_s, w_s
        p_new = state.p
        corr_kernel = None
        if sealed_x and _corr_pallas_enabled(controls):
            from openfoam_tpp_tpu.ops.pallas import correction as _ckr

            ok = (spmd.supports(_ckr.supported, state.alpha.shape,
                                state.alpha.dtype) if spmd is not None
                  else _ckr.supported(state.alpha.shape, state.alpha.dtype))
            if ok:
                try:
                    tuple(float(h) for h in spacing)
                    corr_kernel = _ckr
                except (TypeError, jax.errors.TracerArrayConversionError):
                    corr_kernel = None  # traced spacing: jnp path
        n_corr = max(int(controls.n_correctors), 1)
        div_err = None
        for _corr in range(n_corr):
            phi_star = (ga["ax"] * u_c, ga["ay"] * v_c, ga["az"] * w_c)
            div_star = st.divergence(*phi_star, spacing)
            b = jnp.where(fluid, -div_star / dt, 0.0)
            dp, p_res, p_iters = poisson.solve_pcg(
                prob, b, p_new if _corr == 0 else jnp.zeros_like(p_new),
                tol_rel=controls.p_tol_rel,
                tol_abs=controls.p_tol_abs,
                tol_rel_b=controls.p_tol_rel_b,
                max_iters=controls.p_max_iters,
            )
            p_new = dp if _corr == 0 else p_new + dp

            if corr_kernel is not None and _corr == n_corr - 1:
                # Fused epilogue: correction + div max in one pass
                # (ops/pallas/correction.py; the earlier correctors feed
                # the next b-build and stay on the jnp path).
                topo = ga["top_open"].astype(state.alpha.dtype) \
                    if open_top else jnp.zeros(
                        state.alpha.shape[:2], state.alpha.dtype)
                rho_top = rho_new[:, :, -1]
                if spmd is not None:
                    from openfoam_tpp_tpu.parallel import spmd as _sm

                    u_c, v_c, w_c, div_err = _sm.correct_divmax(
                        dp, u_c, v_c, w_c, beta_f,
                        ga["ax"], ga["ay"], ga["az"], ga["vfrac"],
                        topo, rho_top, dt,
                        tuple(float(h) for h in spacing), spmd,
                        open_top=bool(open_top))
                else:
                    u_c, v_c, w_c, div_err = corr_kernel.correct_divmax(
                        dp, u_c, v_c, w_c, beta_f,
                        ga["ax"], ga["ay"], ga["az"], ga["vfrac"],
                        topo, rho_top, dt,
                        tuple(float(h) for h in spacing),
                        open_top=bool(open_top))
                continue

            # --- velocity correction (exactly the operator's gradient) ---
            u_c = u_c - dt * beta_f[0] * st.gradient_at_faces(dp, 0, hx)
            v_c = v_c - dt * beta_f[1] * st.gradient_at_faces(dp, 1, hy)
            w_c = w_c - dt * beta_f[2] * st.gradient_at_faces(dp, 2, hz)
            if open_top and prob.c_top is not None:
                # Half-cell Dirichlet gradient at the atmosphere faces.
                beta_top = jnp.where(
                    ga["top_open"] > 0, 1.0 / rho_new[:, :, -1], 0.0
                )
                w_top = (w_c[:, :, -1]
                         + dt * beta_top * 2.0 * dp[:, :, -1] / hz)
                w_c = w_c.at[:, :, -1].set(w_top)
            u_c = jnp.where(masks[0], u_c, 0.0)
            v_c = jnp.where(masks[1], v_c, 0.0)
            w_c = jnp.where(masks[2], w_c, 0.0)

        if div_err is None:
            div_err = jnp.max(
                jnp.abs(
                    st.divergence(
                        ga["ax"] * u_c, ga["ay"] * v_c, ga["az"] * w_c,
                        spacing
                    )
                )
                * fluid
            )

        # state.dt carries the UNCLIPPED CFL dt as the growth base for the
        # next step, so write-grid clipping never persistently shrinks dt.
        new_state = SimState(
            alpha=alpha_new, u=u_c, v=v_c, w=w_c, p=p_new,
            t=t_new, dt=dt_cfl, step=state.step + 1,
        )
        # Diagnostics reuse the start-of-step Courant numbers (the ones
        # that sized dt) — the end-of-step values are recomputed anyway at
        # the next step's entry, so evaluating them here would duplicate
        # six interpolation passes and two global reductions per step.
        rescale = dt / jnp.maximum(state.dt, 1e-30)
        diag = StepDiagnostics(
            courant=co * rescale,
            alpha_courant=co_a * rescale,
            p_residual=p_res,
            p_iters=p_iters,
            div_error=div_err,
            alpha_min=jnp.min(jnp.where(fluid, alpha_new, 0.0)),
            alpha_max=jnp.max(alpha_new),
        )
        if carry_precond:
            return new_state, diag, bundle
        return new_state, diag

    return step


_WARNED_UNFUSED = False


def _warn_if_unfused_on_tpu(shape, dtype):
    """One-time nudge when a kernel-eligible grid is built for a TPU
    backend without the fused Pallas stencils. The manager and bench
    sniff the backend and enable them (manager/runner.py); library
    callers of make_step otherwise get the ~1.5x-slower jnp path
    silently. Never forces backend init (a hint isn't worth waking a
    remote TPU tunnel)."""
    global _WARNED_UNFUSED
    if _WARNED_UNFUSED:
        return
    try:
        from jax._src import xla_bridge as _xb

        if not _xb.backends_are_initialized():
            return
        if jax.default_backend() != "tpu":
            return
        from openfoam_tpp_tpu.ops.pallas import seven_point as sp

        if not sp.supported(tuple(shape), dtype):
            return
    except Exception:
        return
    _WARNED_UNFUSED = True
    import warnings

    warnings.warn(
        "make_step on a TPU backend with use_pallas=False: this grid "
        "shape supports the fused Pallas stencil kernels (~1.5x step "
        "throughput). Pass SolverControls(use_pallas=True) unless the "
        "step runs under GSPMD sharding (the kernels are single-device "
        "programs).",
        stacklevel=3,
    )


def make_step(
    geom: TankGeometry,
    props: PhysicalProperties = PhysicalProperties(),
    controls: SolverControls = SolverControls(),
    motion: mo.TableMotion | None = None,
    dtype=jnp.float32,
    carry_precond: bool = False,
    spmd=None,
):
    """Build the jit-able step function for a fixed geometry.

    `motion=None` means analytic orbital forcing driven by CaseParams
    (the circularSloshingTank family); a TableMotion gives 6DoF.dat-driven
    translation (sloshingTank3D6DoF family). Geometry arrays are closed
    over (XLA constant-folds them); use `make_step_core` directly for
    geometry-batched sweeps.

    `carry_precond=True`: step takes/returns the preconditioner bundle
    (see make_step_core) and gains an `init_precond(state)` attribute
    that builds the initial bundle for a driver loop's carry.
    """
    if not controls.use_pallas:
        _warn_if_unfused_on_tpu(geom.shape, dtype)
    ga = geometry_arrays(geom, dtype)
    spacing = tuple(float(s) for s in geom.spacing)
    open_top = bool(np.any(geom.top_open > 0))
    rot_enabled = motion is not None and motion.has_rotation
    face_xyz = (
        tuple(fr.face_coordinates(geom, ax) for ax in range(3))
        if rot_enabled else None
    )
    core = make_step_core(props, controls, motion=motion, open_top=open_top,
                          face_xyz=face_xyz, carry_precond=carry_precond,
                          sealed_x=bool(np.all(geom.ax[-1] == 0.0)),
                          spmd=spmd)

    if carry_precond:
        def step(state: SimState, params, t_stop=None, precond=None):
            return core(state, params, ga, spacing, t_stop=t_stop,
                        precond=precond)

        def init_precond(state: SimState):
            rho = mixture_density(state.alpha, props)
            _, pack = poisson.build_operator(
                ga, spacing, rho, ga["top_open"] if open_top else None,
                use_pallas=controls.use_pallas, spmd=spmd)
            return poisson.make_bundle(pack,
                                       use_pallas=controls.use_pallas,
                                       spmd=spmd)

        step.init_precond = init_precond
        return step

    def step(state: SimState, params, t_stop=None):
        return core(state, params, ga, spacing, t_stop=t_stop)

    return step


def make_step_ga(
    spacing,
    props: PhysicalProperties = PhysicalProperties(),
    controls: SolverControls = SolverControls(),
    motion: mo.TableMotion | None = None,
    open_top: bool = True,
    face_xyz=None,
    carry_precond: bool = False,
    sealed_x: bool = True,
):
    """Geometry-as-OPERANDS step: `step(state, params, ga, ...)`.

    `sealed_x=True` asserts every geometry this step will be fed has a
    fully sealed +x face (last x-aperture plane all zero — true for all
    shipped tank geometries); the fused kernels rely on it. Callers
    passing geometries with an open +x face must set it False (pins the
    kernels to the aperture-masked jnp path).

    Unlike make_step (which closes over the geometry arrays, baking
    ~5·n³ floats into the executable as HLO constants), the `ga` dict
    here crosses the jit boundary as arguments — one compiled advance
    serves every geometry of a given (shape, spacing), and the persistent
    compile cache stops fragmenting across (H, D) sweeps (VERDICT r3
    item 8; ROADMAP "Infrastructure"). `spacing` stays STATIC: the fused
    Pallas kernels take it as compile-time scalars.

    With carry_precond the step gains `init_precond(state, ga)`."""
    spacing = tuple(float(s) for s in spacing)
    core = make_step_core(props, controls, motion=motion, open_top=open_top,
                          face_xyz=face_xyz, carry_precond=carry_precond,
                          sealed_x=sealed_x)

    if carry_precond:
        def step(state: SimState, params, ga, t_stop=None, precond=None):
            return core(state, params, ga, spacing, t_stop=t_stop,
                        precond=precond)

        def init_precond(state: SimState, ga):
            rho = mixture_density(state.alpha, props)
            _, pack = poisson.build_operator(
                ga, spacing, rho, ga["top_open"] if open_top else None,
                use_pallas=controls.use_pallas)
            return poisson.make_bundle(pack,
                                       use_pallas=controls.use_pallas)

        step.init_precond = init_precond
        step.takes_ga = True
        return step

    def step(state: SimState, params, ga, t_stop=None):
        return core(state, params, ga, spacing, t_stop=t_stop)

    step.takes_ga = True
    return step


def make_multi_step(step_fn, n_inner: int):
    """Fuse `n_inner` steps into one lax.scan for dispatch-free execution."""

    def multi(state, params):
        def body(s, _):
            s2, d = step_fn(s, params)
            return s2, d

        final, diags = jax.lax.scan(body, state, None, length=n_inner)
        last = jax.tree.map(lambda a: a[-1], diags)
        return final, last

    return multi
