"""Momentum transport on the staggered (MAC) grid.

Implements the semi-discrete momentum equation of the interFoam class
(SURVEY.md §2.3):

    ∂(ρU)/∂t + ∇·(rhoPhi U) = ∇·(μ∇U) − ∇p + ρ G(t) + σκ∇α

with component-wise van Leer reconstruction of the advected velocity
(`Gauss vanLeerV` analog, fvSchemes:29) and the *phase-consistent* mass
flux `rhoPhi` from the MULES step — the standard requirement for
stability at the water/air density ratio.

On vanLeerV vs component-wise vanLeer: OpenFOAM's V-scheme computes ONE
limiter per face from the direction of steepest change of the colocated
velocity vector, preventing the per-component limiters from rotating U
across a shock on unstructured colocated meshes. On a staggered MAC grid
that failure mode does not arise — each component is advected on its own
control volume whose faces carry their own donor states, so there is no
colocated vector to keep coherent; the component-wise limiter here is
the standard (and TVD) choice for MAC schemes. The V-variant's only
behavioral difference (slightly more diffusion near multi-dimensional
extrema) is below the discretization differences already documented in
VALIDATION.md. The pressure and body-force
terms are face-located (MAC faces coincide with flux points, so no
Rhie–Chow machinery is needed). Forcing uses the TOTAL-pressure
formulation: the body force is the uniform acceleration dt·G added to
face velocities, p absorbs the hydrostatic profile, and the projection
uses the arithmetic face density β_f (see the forcing note below and
poisson.build_poisson) — this keeps a stratified tank quiescent to f32
machine precision (tested in tests/test_hydrostatic.py).

momentumPredictor=no parity (fvSolution:80): velocity is advanced
explicitly and corrected by one exact projection — on an orthogonal MAC
grid a single pressure solve plays the role of the reference's two
PISO correctors over a lagged H/A.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from openfoam_tpp_tpu.ops import stencil as st


def _sl(axis, s):
    out = [slice(None)] * 3
    out[axis] = s
    return tuple(out)


def _zero_pad_axis(f, axis):
    """Pad one zero slab on both ends of `axis`."""
    shape = list(f.shape)
    shape[axis] = 1
    z = jnp.zeros(shape, f.dtype)
    return jnp.concatenate([z, f, z], axis=axis)


def convect_face_field(q, qax, rho_phi, spacing):
    """∇·(rhoPhi q) evaluated at the q-face points (conservative form).

    q lives on faces normal to `qax`. For the parallel direction the
    momentum-CV faces sit at cell centers (mass flux = average of the two
    bracketing face fluxes); for transverse directions they sit on edges
    (mass flux = average of the transverse face flux along qax). The
    advected value is van Leer-reconstructed upwind of the local mass flux.
    """
    conv = jnp.zeros_like(q)
    for d in range(3):
        h = spacing[d]
        if d == qax:
            rp = rho_phi[d]
            # Mass flux at cell centers along d, then zero-padded so the
            # "faces" of the q-array (centers + 2 domain ends) line up.
            g_center = 0.5 * (rp[_sl(d, slice(0, -1))] + rp[_sl(d, slice(1, None))])
            g = _zero_pad_axis(g_center, d)
        else:
            # Edge-located mass flux: transverse face flux averaged along qax.
            g = st.cells_to_faces_avg(rho_phi[d], qax)
        qf = st.vanleer_faces(q, g, d)
        flux = g * qf
        conv = conv + (flux[_sl(d, slice(1, None))] - flux[_sl(d, slice(0, -1))]) / h
    return conv


def edge_viscosities(mu):
    """The three edge-averaged μ arrays, one per axis pair — shared by the
    symmetric (qax, d)/(d, qax) viscous terms so each 4-point average is
    computed once per step instead of twice."""
    return {
        frozenset((0, 1)): st.cells_to_faces_avg(st.cells_to_faces_avg(mu, 0), 1),
        frozenset((0, 2)): st.cells_to_faces_avg(st.cells_to_faces_avg(mu, 0), 2),
        frozenset((1, 2)): st.cells_to_faces_avg(st.cells_to_faces_avg(mu, 1), 2),
    }


def viscous_face_field(q, qax, mu, spacing, mu_edges=None):
    """∇·(μ∇q) at the q-face points (Laplacian form).

    Variable μ: cell-centered for the parallel direction, 4-point edge
    average for transverse directions (pass `mu_edges` from
    `edge_viscosities` to share them across components). The deviatoric
    transpose term ∇·(μ dev2(∇U)ᵀ) — which vanishes for constant μ by
    continuity — is `transpose_viscous_face_field` below (fvSchemes:32
    parity), added separately in the timestep.
    """
    out = jnp.zeros_like(q)
    for d in range(3):
        h = spacing[d]
        if d == qax:
            # dq/dd at cell centers; flux divergence back at faces.
            dq = (q[_sl(d, slice(1, None))] - q[_sl(d, slice(0, -1))]) / h
            flux = mu * dq
            flux = _zero_pad_axis(flux, d)
        else:
            if mu_edges is not None:
                mu_edge = mu_edges[frozenset((qax, d))]
            else:
                mu_edge = st.cells_to_faces_avg(st.cells_to_faces_avg(mu, qax), d)
            dq = st.gradient_at_faces(q, d, h)
            flux = mu_edge * dq
        out = out + (flux[_sl(d, slice(1, None))] - flux[_sl(d, slice(0, -1))]) / h
    return out


def transpose_viscous_face_field(vels, qax, mu, spacing, mu_edges=None,
                                 div_u=None):
    """∇·(μ [(∇U)ᵀ − (2/3)(∇·U) I]), component `qax`, at qax-face points —
    the explicit dev2 stress term of fvSchemes:32
    (`div(((rho*nuEff)*dev2(T(grad(U)))))`), completing the full
    deviatoric Newtonian stress together with `viscous_face_field`'s
    implicit-analog μ∇U part.

    Identically zero for constant μ and ∇·U = 0; physically active at the
    interface where ∇μ ≠ 0 (μ jumps ~55× between water and air). Flux of
    component qax along direction d is μ·∂u_d/∂x_qax: at cell centers for
    d = qax (where μ is native), at (qax, d) edges otherwise (4-point μ
    average, shared via `mu_edges`). The trace part −(2/3)μ∇·U enters the
    d = qax flux only; `div_u` is the cell-centered velocity divergence
    (≈ 0 after projection — kept for exact dev2 form parity).
    """
    q = vels[qax]
    out = jnp.zeros_like(q)
    for d in range(3):
        h = spacing[d]
        if d == qax:
            dq = (q[_sl(d, slice(1, None))] - q[_sl(d, slice(0, -1))]) / h
            if div_u is not None:
                dq = dq - (2.0 / 3.0) * div_u
            flux = _zero_pad_axis(mu * dq, d)
        else:
            if mu_edges is not None:
                mu_edge = mu_edges[frozenset((qax, d))]
            else:
                mu_edge = st.cells_to_faces_avg(
                    st.cells_to_faces_avg(mu, qax), d)
            # ∂u_d/∂x_qax lands exactly on the (qax, d) edge points.
            flux = mu_edge * st.gradient_at_faces(vels[d], qax, spacing[qax])
        out = out + (flux[_sl(d, slice(1, None))] - flux[_sl(d, slice(0, -1))]) / h
    return out


# Gravity/frame forcing note (total-pressure formulation):
# interFoam splits p = p_rgh + ρ g·x and applies the face force
# −(G·x)_f ∂ρ/∂n — well-balanced in f64, but in f32 the interface face
# force is O(g·ρ_w/Δh) ≈ 1e5 m/s² and its cancellation against ∇p_rgh is
# limited to ~1e-6 relative, leaving O(1e-4 m/s) spurious currents.
# This solver instead works with the *total* pressure: the body force is
# the uniform per-unit-mass acceleration G(t) (O(10) m/s², added directly
# to face velocities in the timestep), and p absorbs the hydrostatic
# profile. On the MAC grid with β_f = 1/(arithmetic face-mean ρ) — the
# choice poisson.build_poisson makes deliberately; see its comment — the
# discrete hydrostatic balance for z-stratified ρ is still exact:
# Δp = G_z h / β_f is single-valued, so the projection returns
# machine-zero velocity (tested in tests/test_hydrostatic.py) — with
# forces 4 orders smaller than the p_rgh split's face forces, f32-safe.


def csf_force(alpha, kappa, sigma, axis, h, beta_face):
    """Continuum-surface-force σ κ_f ∂α/∂n · β_f at faces (Brackbill CSF).

    σ = 0 in the reference templates (constant/phaseProperties:17-19) but
    the machinery is first-class for the thin-layer cap cases."""
    kf = st.cells_to_faces_avg(kappa, axis)
    da = st.gradient_at_faces(alpha, axis, h)
    return sigma * kf * da * beta_face


def smooth_alpha(alpha, n=2):
    """Laplacian-style 7-point smoothing of the VoF field for CURVATURE
    ESTIMATION ONLY (alpha itself is never smoothed — mass is untouched).

    A 1-cell-sharp interface carries O(1/h) staircase noise in the
    discrete curvature; smoothing the κ input is the standard CSF remedy
    (Brackbill's original formulation convolves the color function).
    Measured: without it, capillary waves of sub-cell amplitude see a
    noise-dominated force and the dispersion test fails; with n=2 the
    capillary branch of ω²=(gk+σk³/ρ)tanh(kd) is reproduced."""
    for _ in range(n):
        sm = alpha
        for ax in range(3):
            sm = sm + st.shift_down(alpha, ax) + st.shift_up(alpha, ax)
        alpha = sm / 7.0
    return alpha


def curvature_vof(alpha, spacing, eps=1e-8, n_smooth=2):
    """κ = −∇·n̂ from smoothed VoF gradients (cell-centered).

    Resolution-limited: delivers ~60–70% of the true capillary stiffness
    at ~20 cells/λ with a 1–2 cell interface (VALIDATION.md) — the known
    CSF/VoF floor. Kept as the estimator for interface orientations a z
    height function cannot represent (vertical columns, overturning)."""
    hx, hy, hz = spacing
    alpha = smooth_alpha(alpha, n_smooth)
    gx = st.faces_to_cells_avg(st.gradient_at_faces(alpha, 0, hx), 0)
    gy = st.faces_to_cells_avg(st.gradient_at_faces(alpha, 1, hy), 1)
    gz = st.faces_to_cells_avg(st.gradient_at_faces(alpha, 2, hz), 2)
    mag = jnp.sqrt(gx * gx + gy * gy + gz * gz) + eps
    nxf = st.cells_to_faces_avg(gx / mag, 0)
    nyf = st.cells_to_faces_avg(gy / mag, 1)
    nzf = st.cells_to_faces_avg(gz / mag, 2)
    kv = -st.divergence(nxf, nyf, nzf, spacing)
    return kv, (gx, gy, gz, mag)


def curvature_hf(alpha, spacing, vfrac):
    """Column height-function curvature κ(x, y), broadcast over z.

    The standard VoF curvature fix (Cummins/Francois/Kothe 2005): sum α
    down each (i, j) column into a liquid height H, then evaluate the
    exact graph curvature
        κ = −(H_xx(1+H_y²) + H_yy(1+H_x²) − 2 H_x H_y H_xy) / W³,
    W = √(1+H_x²+H_y²), with central differences. Because H integrates α
    over the column, the O(1/h) staircase noise that caps the smoothed-
    VoF estimator cancels, recovering ≳95% of the true capillary
    stiffness at the same resolution (tests/test_accuracy_corroboration).

    Sign matches curvature_vof: both are −∇·n̂ with n̂ = ∇α/|∇α| (α = 1
    below the surface ⇒ n̂ = (H_x, H_y, −1)/W).

    Cut cells: α is the water fraction of each cell's FLUID part
    (core/state.py init; solid cells carry α = 0), so Σ_k α·hz is the
    liquid depth directly — including laterally cut wall columns, whose
    openness is z-uniform in every shipped template. Columns with no
    fluid cells take their neighbor's H via a zero-gradient (90° contact
    angle) fallback — the same wall condition the apertures impose on α
    itself. Assumes a flat floor under the interface band (true for
    every shipped template: flat, cap, 6DoF box)."""
    hx, hy, hz = spacing
    wet = jnp.max(vfrac, axis=2) > 0.0
    H = jnp.where(wet, jnp.sum(alpha, axis=2) * hz, 0.0)

    nx, ny = H.shape[-2], H.shape[-1]
    Hp = jnp.pad(H, 1, mode="edge")
    wp = jnp.pad(wet, 1, constant_values=False)

    def nb(di, dj):
        v = jax.lax.dynamic_slice_in_dim(
            jax.lax.dynamic_slice_in_dim(Hp, 1 + di, nx, axis=0),
            1 + dj, ny, axis=1)
        m = jax.lax.dynamic_slice_in_dim(
            jax.lax.dynamic_slice_in_dim(wp, 1 + di, nx, axis=0),
            1 + dj, ny, axis=1)
        return jnp.where(m, v, H)   # Neumann at walls/domain edges

    He, Hw = nb(1, 0), nb(-1, 0)
    Hn, Hs = nb(0, 1), nb(0, -1)
    Hx = (He - Hw) / (2.0 * hx)
    Hy = (Hn - Hs) / (2.0 * hy)
    Hxx = (He - 2.0 * H + Hw) / (hx * hx)
    Hyy = (Hn - 2.0 * H + Hs) / (hy * hy)
    Hxy = (nb(1, 1) - nb(1, -1) - nb(-1, 1) + nb(-1, -1)) / (4.0 * hx * hy)
    W2 = 1.0 + Hx * Hx + Hy * Hy
    k2d = -(Hxx * (1.0 + Hy * Hy) + Hyy * (1.0 + Hx * Hx)
            - 2.0 * Hx * Hy * Hxy) / (W2 * jnp.sqrt(W2))
    return jnp.where(wet, k2d, 0.0)[..., None]


def curvature(alpha, spacing, vfrac=None, method="blend",
              eps=1e-8, n_smooth=2):
    """CSF curvature (cell-centered). method: "blend" (default) weights
    the height-function estimator by the local interface verticality
    n_z²/|n|² — pure HF on near-horizontal interfaces (the capillary
    thin-layer regime HF exists for), pure smoothed-VoF where a z height
    function is undefined (vertical columns: the static Laplace oracle,
    test_csf.py). "hf" / "vof" force one estimator."""
    if method == "hf":
        if vfrac is None:
            # Fail loudly: silently falling through to the smoothed-VoF
            # estimator ignored a forced height-function request (ADVICE r4).
            raise ValueError(
                "curvature(method='hf') requires vfrac (the cell fluid "
                "fractions) — the height function integrates alpha over "
                "wet columns; pass vfrac or use method='vof'/'blend'")
        k2d = curvature_hf(alpha, spacing, vfrac)
        return jnp.broadcast_to(k2d, alpha.shape)
    kv, (gx, gy, gz, mag) = curvature_vof(alpha, spacing, eps, n_smooth)
    if method == "vof" or vfrac is None:
        return kv
    kh = curvature_hf(alpha, spacing, vfrac)
    # Verticality of the (smoothed) interface normal: 1 on a flat
    # surface, 0 on a vertical one. Squared ratio already transitions
    # sharply; the clip ramp makes the pure regimes exact.
    w = (gz * gz) / (mag * mag)
    w = jnp.clip((w - 0.25) * 2.0, 0.0, 1.0)
    return w * kh + (1.0 - w) * kv
