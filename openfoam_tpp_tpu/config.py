"""Global defaults and physical properties.

Parity: the reference's ``DEFAULTS`` schema (/root/reference/main.py:102-114)
and phase properties (/root/reference/circularSloshingTank/constant/
physicalProperties.{water,air}:17-21, phaseProperties:17-19, g:17-18).
"""

from __future__ import annotations

import dataclasses

# Parameter schema of a case. Same keys/semantics as the reference manager:
#   H        tank (cylinder) height [m]
#   D        tank diameter [m]
#   mesh     target cell size [m] (here: uniform Cartesian spacing h)
#   geo      'flat' | 'cap' (spherical-cap bottom of radius D/2 below z=0)
#   R        orbital shaking radius [m]
#   freq     shaking frequency [Hz]
#   duration simulated time [s]
#   dt       initial time step [s] (adaptive afterwards)
#   ramp     soft-start ramp duration [s]; negative => 10% of duration
#   n_cpus   reference-era CPU count; kept for case-dir compat (unused on TPU)
DEFAULTS = {
    "H": 0.1,
    "D": 0.02,
    "mesh": 0.002,
    "geo": "flat",
    "R": 0.003,
    "freq": 2.0,
    "duration": 10.0,
    "dt": 0.001,
    "ramp": -1,
    "n_cpus": 1,
}

GRAVITY = 9.81  # m/s^2, along -z (constant/g:17-18)


@dataclasses.dataclass(frozen=True)
class PhysicalProperties:
    """Two-phase incompressible properties (phase1 = water, phase2 = air)."""

    rho1: float = 998.2     # water density [kg/m^3]
    rho2: float = 1.0       # air density [kg/m^3]
    nu1: float = 1.0e-6     # water kinematic viscosity [m^2/s]
    nu2: float = 1.48e-5    # air kinematic viscosity [m^2/s]
    sigma: float = 0.0      # surface tension [N/m]; reference ships sigma=0
    g: float = GRAVITY

    @property
    def mu1(self) -> float:
        return self.rho1 * self.nu1

    @property
    def mu2(self) -> float:
        return self.rho2 * self.nu2


# Numerical controls, mirroring system/controlDict + fvSolution of the
# reference template (SURVEY.md §2.3).
@dataclasses.dataclass(frozen=True)
class SolverControls:
    max_co: float = 0.5          # controlDict:47  maxCo
    max_alpha_co: float = 0.5    # controlDict:49  maxAlphaCo
    max_dt: float = 1.0          # controlDict:51  maxDeltaT
    dt_growth: float = 1.2       # OpenFOAM-style damped dt increase
    n_alpha_subcycles: int = 3   # fvSolution:22   nAlphaSubCycles
    n_limiter_iters: int = 3     # MULES nLimiterIter default
    c_alpha: float = 1.0         # fvSchemes:30    interfaceCompression cAlpha 1
    p_tol_rel: float = 1e-3      # relative CG tolerance per incremental
                                 # (warm-started, diagonally-scaled) solve.
                                 # Measured at the 1M-cell flagship: the
                                 # step's continuity error is identical to
                                 # 1e-4 (dominated by f32 flux arithmetic)
                                 # at 2x fewer CG iterations; 1e-2 degrades
                                 # div(phi) by 60x — do not loosen further.
    p_tol_abs: float = 1e-8      # fvSolution:46   p_rgh tolerance (scaled)
    p_tol_rel_b: float = 3e-4    # OpenFOAM-normFactor-style criterion:
                                 # additionally stop when the scaled
                                 # residual falls below this fraction of
                                 # ||b̂|| (the RHS scale). The reference's
                                 # GAMG/PCG tolerances are ABSOLUTE on the
                                 # normFactor-normalized residual
                                 # (fvSolution:46), so its warm-started
                                 # steady-state solves stop early; the
                                 # pure r0-relative criterion instead
                                 # demands a fixed 1e3 reduction even when
                                 # the warm start is already at the f32
                                 # representation floor. Measured
                                 # (scripts/tol_criterion_study.py, 300
                                 # violent-regime steps, 32^3 flagship):
                                 # 3e-4 cuts 7% of CG iterations there
                                 # (more at steady state, where it binds)
                                 # at 0.0003%-of-depth interface change
                                 # and unchanged div(phi); 1e-3 cuts 31%
                                 # but doubles the instantaneous div
                                 # error — offered via OFTPP_P_TOL_REL_B
                                 # for steady production farms. 0 = off.
    p_max_iters: int = 50
    write_interval: float = 0.05  # controlDict:32 writeInterval
    use_pallas: bool = False     # fused TPU stencil kernels for the CG
                                 # operator + MG V-cycle smoothers
                                 # (ops/pallas/). Enable on real TPU
                                 # single-device paths; requires
                                 # nx % 8 == 0 (geometry round_to=8) —
                                 # silently falls back otherwise.
    batch_lanes: bool = False    # the step runs vmapped with the case
                                 # axis in the lanes (geometry-batched
                                 # sweeps, parallel/sweep.py): the
                                 # 7-point pressure kernels reroute to
                                 # their batch-native rank-4 variants
                                 # via custom_vmap (ops/pallas/
                                 # seven_point_batch.py) while the
                                 # single-grid MULES kernels stay OFF
                                 # (their vmap lowering is one grid
                                 # program per case — measured slower
                                 # than the lane-vectorized jnp path).
    n_correctors: int = 1        # PIMPLE pressure correctors
                                 # (fvSolution:81 nCorrectors 2). One MAC
                                 # projection is already exact to solver
                                 # tolerance (solver/momentum.py); each
                                 # extra corrector re-solves on the
                                 # corrected flux's residual divergence.
    dev2_stress: bool = True     # explicit ∇·(μ dev2(∇U)ᵀ) transpose
                                 # stress (fvSchemes:32 parity) — active
                                 # only where ∇μ ≠ 0 (the interface);
                                 # solver/momentum.py
                                 # transpose_viscous_face_field.
    precond_refresh: int = 1     # rebuild the bf16 MG preconditioner
                                 # hierarchy every K steps instead of
                                 # every step (carry_precond driver loops
                                 # only — solver/poisson.build_operator).
                                 # Physics-exact for any K (the operator
                                 # is always fresh); K>1 trades CG
                                 # iterations for the hierarchy build.
                                 # Measured (v5e, 1M-cell flagship,
                                 # steady): K=1 160.4M updates/s, K=4
                                 # 157.2M, K=8 152.5M, K=16 146.9M — the
                                 # stale V-cycle costs more iterations
                                 # than the rebuild saves; keep K=1.
    max_diff_co: float = 0.25    # explicit-diffusion stability bound:
                                 # nu_max * dt * (1/hx^2+1/hy^2+1/hz^2)
                                 # <= max_diff_co. The pure-FTCS limit is
                                 # 0.5 but is MARGINAL once convection and
                                 # the free-surface coupling ride on the
                                 # same explicit update (measured: a
                                 # quiescent h=1 mm tank at 0.5 grows
                                 # velocity excursions; 0.25 is clean) —
                                 # default keeps a 2x safety factor.
                                 # The reference's viscous term
                                 # is implicit (fvSolution U smoothSolver)
                                 # so OpenFOAM never needs this; our
                                 # momentum update is explicit and a
                                 # quiescent case would otherwise grow dt
                                 # to max_dt=1 s, far beyond h^2/(6 nu_air)
                                 # (~0.045 s at h=2 mm). 0 disables.
    max_capillary_co: float = 1.0  # capillary-wave dt bound (Brackbill):
                                 # dt <= factor * sqrt((rho1+rho2) h_min^3
                                 # / (4 pi sigma)); active only when
                                 # sigma != 0. 0 disables.
    fct_bf16: bool = True        # bf16 λ/antidiffusive-flux streams in
                                 # the fused MULES FCT pipeline (pallas
                                 # paths only; jnp fallback stays f32).
                                 # λ is a [0,1] limiter weight and the
                                 # antidiffusive flux a correction term —
                                 # α, bounds and low-order fluxes stay
                                 # f32, so mass telescoping is exact and
                                 # boundedness is enforced by the final
                                 # f32 clip. OFTPP_FCT_BF16=0 disables.
    csf_curvature: str = "blend"  # CSF curvature estimator: "blend"
                                 # (default) mixes column height-function
                                 # curvature (near-horizontal interface,
                                 # ~2nd-order — the capillary thin-layer
                                 # regime) with smoothed-VoF (vertical /
                                 # overturning interfaces, where a z
                                 # height function is undefined); "vof"
                                 # forces the r3 smoothed-VoF estimator;
                                 # "hf" forces pure height-function.
                                 # solver/momentum.py curvature().
    mom_pallas: bool | None = None  # fused momentum-RHS kernel
                                 # (ops/pallas/momentum_rhs.py). None =
                                 # follow use_pallas (measured +16% on
                                 # the flagship); vmapped sweep paths
                                 # pin False (single-grid kernel).
                                 # OFTPP_MOM_PALLAS env overrides both.
