"""Resource estimation, re-targeted from CPU-cluster sizing to TPU.

The reference's calibrated model (/root/reference/main.py:193-249):
80 cpu-hours per (Mcell·s simulated), 20k–50k cells/core sweet spot,
200 MB/100k cells + 2 GB. The TPU model below keeps the same API shape
(cells → time/memory estimates) with chip-calibrated constants, and adds
the TPU-specific knob: how many vmapped sweep cases fit per chip.
"""

from __future__ import annotations

import dataclasses
import math

# Calibrated on TPU v5e (bench.py measures the live number; these are the
# planning constants). cell-updates/s aggregated over a full VoF step
# (alpha subcycles + momentum incl. dev2 + MG-CG pressure solve). r4
# steady-state measurement: 2.13e8 at 1M cells (BENCH_r04.json — fused
# MULES/momentum-RHS/CG/Chebyshev/projection-epilogue Pallas kernels).
TPU_CELL_UPDATES_PER_SEC = 2.13e8
# SimState + geometry + MG levels + transients, bytes per cell (f32).
BYTES_PER_CELL = 4 * (5 + 4 + 12) * 2
HBM_BYTES = 16e9  # v5e chip


def estimate_cells(params: dict) -> int:
    """πr²H / mesh³ cells (reference formula, main.py:199-203)."""
    r = params["D"] / 2.0
    vol = math.pi * r * r * params["H"]
    if params.get("geo") == "cap":
        vol += (2.0 / 3.0) * math.pi * r ** 3
    return max(int(vol / params["mesh"] ** 3), 1)


def estimate_steps(params: dict) -> int:
    """Adaptive-dt step count estimate from the CFL bound: wave speed
    ~ max(orbit speed, sqrt(g·H/2)) at maxCo 0.5."""
    u = max(
        2.0 * math.pi * params["freq"] * params["R"],
        math.sqrt(9.81 * params["H"] / 2.0) * 0.5,
    )
    dt_cfl = 0.5 * params["mesh"] / max(u, 1e-9)
    dt = min(dt_cfl, 1.0)
    return max(int(params["duration"] / dt), 1)


@dataclasses.dataclass
class ResourceEstimate:
    n_cells: int
    n_steps: int
    wall_seconds: float
    memory_bytes: float
    cases_per_chip: int       # vmap sweep batch that fits in HBM
    fits_on_chip: bool

    def summary(self) -> str:
        return (
            f"~{self.n_cells:,} cells, ~{self.n_steps:,} steps, "
            f"~{format_time(self.wall_seconds)} wall on one chip, "
            f"{self.memory_bytes / 1e9:.2f} GB HBM "
            f"(~{self.cases_per_chip} sweep cases/chip)"
        )


def estimate_resources(params: dict) -> ResourceEstimate:
    n_cells = estimate_cells(params)
    n_steps = estimate_steps(params)
    wall = n_cells * n_steps / TPU_CELL_UPDATES_PER_SEC
    mem = n_cells * BYTES_PER_CELL + 0.5e9
    per_case = n_cells * BYTES_PER_CELL
    cases = max(int((HBM_BYTES - 1e9) / max(per_case, 1)), 1)
    return ResourceEstimate(
        n_cells=n_cells,
        n_steps=n_steps,
        wall_seconds=wall,
        memory_bytes=mem,
        cases_per_chip=cases,
        fits_on_chip=mem < HBM_BYTES,
    )


def format_time(seconds: float) -> str:
    """hh:mm:ss (the helper the reference calls but never defines —
    main.py:243, a documented latent NameError)."""
    seconds = int(round(seconds))
    h, rem = divmod(seconds, 3600)
    m, s = divmod(rem, 60)
    if h:
        return f"{h}h{m:02d}m{s:02d}s"
    if m:
        return f"{m}m{s:02d}s"
    return f"{s}s"
