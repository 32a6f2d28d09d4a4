"""Field probes — functionObject parity.

The reference samples `p` at fixed points every timestep via the OpenFOAM
`probes` functionObject (/root/reference/circularSloshingTank/system/
functions:17-33) into `postProcessing/probes/0/p`. Here probes sample on
device (trilinear interpolation of cell-centered fields) and are written
in the same text layout. Note the reference's shipped probe locations
(0, ±9.95, 19.77) are tutorial-tank coordinates far outside the small
cylinders (documented defect — probe output there is garbage); default
probe locations here are scaled into the tank instead.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from openfoam_tpp_tpu.mesh.geometry import TankGeometry


def default_probe_points(geom: TankGeometry) -> np.ndarray:
    """Two probes on the axis: mid-fill and near the top (sane replacement
    for the reference's out-of-domain tutorial points)."""
    return np.array([
        [0.0, 0.0, geom.H * 0.25],
        [0.0, 0.0, geom.H * 0.75],
    ])


def sample_cell_field(field, points, geom: TankGeometry):
    """Trilinear sample of a cell-centered field at world points (device)."""
    hx, hy, hz = geom.spacing
    x0, y0, z0 = geom.origin
    pts = jnp.asarray(points, jnp.float32)
    fx = (pts[:, 0] - x0) / hx - 0.5
    fy = (pts[:, 1] - y0) / hy - 0.5
    fz = (pts[:, 2] - z0) / hz - 0.5
    nx, ny, nz = field.shape

    def clamp(i, n):
        return jnp.clip(i, 0, n - 1)

    i0 = clamp(jnp.floor(fx).astype(jnp.int32), nx)
    j0 = clamp(jnp.floor(fy).astype(jnp.int32), ny)
    k0 = clamp(jnp.floor(fz).astype(jnp.int32), nz)
    i1, j1, k1 = clamp(i0 + 1, nx), clamp(j0 + 1, ny), clamp(k0 + 1, nz)
    tx = jnp.clip(fx - i0, 0.0, 1.0)
    ty = jnp.clip(fy - j0, 0.0, 1.0)
    tz = jnp.clip(fz - k0, 0.0, 1.0)

    def g(i, j, k):
        return field[i, j, k]

    c00 = g(i0, j0, k0) * (1 - tx) + g(i1, j0, k0) * tx
    c01 = g(i0, j0, k1) * (1 - tx) + g(i1, j0, k1) * tx
    c10 = g(i0, j1, k0) * (1 - tx) + g(i1, j1, k0) * tx
    c11 = g(i0, j1, k1) * (1 - tx) + g(i1, j1, k1) * tx
    c0 = c00 * (1 - ty) + c10 * ty
    c1 = c01 * (1 - ty) + c11 * ty
    return c0 * (1 - tz) + c1 * tz


class ProbeWriter:
    """Accumulates probe rows and writes the OpenFOAM probes text format."""

    def __init__(self, case_dir: str, points: np.ndarray, field_name="p",
                 start_time: float = 0.0):
        self.points = np.asarray(points)
        time_dir = f"{start_time:g}"
        self.dir = os.path.join(case_dir, "postProcessing", "probes", time_dir)
        os.makedirs(self.dir, exist_ok=True)
        self.path = os.path.join(self.dir, field_name)
        # Header only when the file does not exist — a re-run over already
        # written intervals must not truncate history (ADVICE r1).
        if not os.path.exists(self.path):
            with open(self.path, "w") as f:
                for i, p in enumerate(self.points):
                    f.write(f"# Probe {i} ({p[0]:g} {p[1]:g} {p[2]:g})\n")
                header = "".join(f"{i:>14d}" for i in range(len(self.points)))
                f.write(f"#{'Probe':>13s}{header}\n")
                f.write(f"#{'Time':>13s}\n")
            self._last_t = -np.inf
        else:
            self._last_t = self._read_last_time()

    def _read_last_time(self) -> float:
        """Last recorded time in the file (so re-runs skip duplicate rows)."""
        last = -np.inf
        with open(self.path) as f:
            for line in f:
                if line.startswith("#") or not line.strip():
                    continue
                try:
                    last = float(line.split()[0])
                except ValueError:
                    pass
        return last

    def append(self, t: float, values):
        if t <= self._last_t + 1e-9:
            return  # already recorded (resume over written interval)
        self._last_t = t
        vals = np.asarray(values).reshape(-1)
        with open(self.path, "a") as f:
            f.write(f"{t:>14.8g}" + "".join(f"{v:>14.6g}" for v in vals) + "\n")
