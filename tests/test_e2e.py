"""End-to-end: build → run → resume → postprocess on a tiny case, plus the
physics oracle — standing-wave frequency vs the dispersion relation
ω² = gk·tanh(kd) (the analytic backbone of the reference's potential-flow
validation, SURVEY.md §4)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
from openfoam_tpp_tpu.core.state import CaseParams, init_state
from openfoam_tpp_tpu.manager import cases as case_mgr
from openfoam_tpp_tpu.manager.runner import run_case
from openfoam_tpp_tpu.mesh import build_box_geometry
from openfoam_tpp_tpu.solver.timestep import make_step
from openfoam_tpp_tpu.utils.io import list_checkpoints


def test_run_case_end_to_end(tmp_path):
    params = {
        "H": 0.05, "D": 0.02, "mesh": 0.004, "geo": "flat",
        "R": 0.002, "freq": 3.0, "duration": 0.1, "dt": 5e-4, "ramp": 0.05,
    }
    case_dir = case_mgr.setup_case(params, str(tmp_path))
    assert os.path.exists(os.path.join(case_dir, "case.json"))
    assert os.path.exists(os.path.join(case_dir, "constant", "6DoF.dat"))

    stats = run_case(case_dir, log=lambda *a, **k: None)
    assert stats["steps"] > 0
    chks = list_checkpoints(case_dir)
    assert len(chks) >= 2  # t=0 + two writes at 0.05/0.1
    assert case_mgr.is_case_done(case_dir)

    # Resume is a no-op when done.
    stats2 = run_case(case_dir, log=lambda *a, **k: None)
    assert stats2["steps"] == 0

    # Postprocess: interface CSVs + VTPs with the reference schema.
    from openfoam_tpp_tpu.manager.cli import action_flow, action_interface

    assert action_interface(case_dir)
    idir = os.path.join(case_dir, "postProcessing", "interface")
    summary = open(os.path.join(idir, "interface_summary.csv")).read().splitlines()
    assert summary[0] == "time,max_z,min_z,mean_z,num_points"
    assert len(summary) == 1 + len(chks)
    wall = open(os.path.join(idir, "wall_elevation.csv")).read().splitlines()
    assert wall[0] == "time,theta,zeta_wall"
    assert any(f.startswith("interface_t") and f.endswith(".vtp")
               for f in os.listdir(idir))

    assert action_flow(case_dir)
    pdir = os.path.join(case_dir, "postProcessing", "potential_flow")
    assert os.path.exists(os.path.join(pdir, "potential_flow_wall.csv"))

    # Probe file in OpenFOAM text layout, sampled every solver TIMESTEP
    # (functionObject parity: row count ≈ step count, not write count —
    # /root/reference/circularSloshingTank/system/functions:17-33).
    probe = os.path.join(case_dir, "postProcessing", "probes", "0", "p")
    lines = open(probe).read().splitlines()
    assert lines[0].startswith("# Probe 0")
    data_rows = [l for l in lines if not l.startswith("#") and l.strip()]
    assert len(data_rows) == stats["steps"], (len(data_rows), stats["steps"])
    # η wave gauges: same cadence, physical start height ≈ fill level H/2.
    eta_f = os.path.join(case_dir, "postProcessing", "probes", "0", "eta")
    eta_rows = [l.split() for l in open(eta_f).read().splitlines()
                if not l.startswith("#") and l.strip()]
    assert len(eta_rows) == stats["steps"]
    eta0 = [float(v) for v in eta_rows[0][1:]]
    assert all(abs(e - params["H"] / 2.0) < 0.01 for e in eta0), eta0


def test_standing_wave_dispersion():
    """First sloshing mode of a rectangular tank: simulated period within
    ~7% of ω² = g k tanh(k d) (validates gravity, projection, and alpha
    transport working together)."""
    L, W, Hbox = 0.2, 0.04, 0.15
    depth = 0.075
    mesh = 0.01
    geom = build_box_geometry(L, W, Hbox, mesh, z0=0.0, open_top=True)
    a0 = 0.004

    state = init_state(geom, fill_height=depth)
    # Superpose the first mode: interface z = depth + a0*cos(pi x / L).
    x, _, zc = geom.cell_centers()
    hz = geom.spacing[2]
    eta = depth + a0 * np.cos(np.pi * (x + L / 2) / L)
    frac = np.clip((eta[:, None, None] - (zc[None, None, :] - hz / 2)) / hz,
                   0.0, 1.0)
    alpha = np.broadcast_to(frac, geom.shape).copy()
    state = state.__class__(
        alpha=jnp.asarray(alpha, jnp.float32), u=state.u, v=state.v,
        w=state.w, p=state.p, t=state.t, dt=state.dt, step=state.step,
    )

    controls = SolverControls(p_max_iters=30)
    step = jax.jit(make_step(geom, PhysicalProperties(), controls))
    params = CaseParams.make(R=0.0, freq=1.0, duration=10.0)

    k = np.pi / L
    omega = np.sqrt(9.81 * k * np.tanh(k * depth))
    period = 2 * np.pi / omega

    # Track the surface height in the first column; find the first
    # minimum (half period) and the return to maximum (full period).
    hzsum = []
    times = []
    t_end = 1.3 * period
    while float(state.t) < t_end:
        state, diag = step(state, params)
        hzsum.append(float(jnp.sum(state.alpha[1, geom.shape[1] // 2, :]) * hz))
        times.append(float(state.t))
    hzsum = np.asarray(hzsum)
    times = np.asarray(times)

    # The signal starts at max; locate the next maximum via the minimum of
    # the first 3/4 and the max after it.
    imin = np.argmin(hzsum[: int(len(hzsum) * 0.7)])
    imax2 = imin + np.argmax(hzsum[imin:])
    t_period = times[imax2] - times[0]
    assert abs(t_period - period) / period < 0.07, (t_period, period)
    # Amplitude persists (not over-damped by the scheme).
    amp2 = hzsum[imax2] - hzsum[imin]
    assert amp2 > 0.8 * a0  # crest-to-trough ≈ 2*a0; allow dissipation
