"""Case I/O: checkpoints, VTP export, 6DoF motion-table codec.

Checkpoint parity: the reference keeps every OpenFOAM time directory as a
binary snapshot (`purgeWrite 0`, controlDict:39) and resumes from
`latestTime` (controlDict:19). Here each snapshot is one ``chk_t{t}.npz``
of the SimState pytree; resume picks the latest by encoded time.

6DoF.dat parity: OpenFOAM `List<Tuple3<scalar,vector,vector>>` text —
    N
    (
    (t (x y z) (rx ry rz))
    ...
    )
written by generate_motion.py / gen6DoF.C and read by sixDoFMotion.
"""

from __future__ import annotations

import os
import re

import numpy as np

CHECKPOINT_RE = re.compile(r"chk_t([0-9.e+-]+)\.npz$")


# ---------------------------------------------------------------- checkpoints

def save_checkpoint(case_dir: str, state, extra: dict | None = None) -> str:
    """Write a SimState snapshot keyed by simulated time."""
    t = float(np.asarray(state.t))
    path = os.path.join(case_dir, f"chk_t{t:.6f}.npz")
    payload = {
        "alpha": np.asarray(state.alpha),
        "u": np.asarray(state.u),
        "v": np.asarray(state.v),
        "w": np.asarray(state.w),
        "p": np.asarray(state.p),
        "t": t,
        "dt": float(np.asarray(state.dt)),
        "step": int(np.asarray(state.step)),
    }
    for k, val in (extra or {}).items():
        payload[f"extra_{k}"] = val
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **payload)
    os.replace(tmp, path)
    return path


def list_checkpoints(case_dir: str) -> list[tuple[float, str]]:
    """Sorted (time, path) checkpoint list."""
    out = []
    if not os.path.isdir(case_dir):
        return out
    for name in os.listdir(case_dir):
        m = CHECKPOINT_RE.match(name)
        if m:
            out.append((float(m.group(1)), os.path.join(case_dir, name)))
    return sorted(out)


def latest_checkpoint(case_dir: str):
    chks = list_checkpoints(case_dir)
    return chks[-1] if chks else None


def load_checkpoint(path: str):
    """Returns a dict of arrays (convert to SimState with `to_state`)."""
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def to_state(payload: dict):
    import jax.numpy as jnp

    from openfoam_tpp_tpu.core.state import SimState

    return SimState(
        alpha=jnp.asarray(payload["alpha"]),
        u=jnp.asarray(payload["u"]),
        v=jnp.asarray(payload["v"]),
        w=jnp.asarray(payload["w"]),
        p=jnp.asarray(payload["p"]),
        t=jnp.asarray(payload["t"], jnp.float32),
        dt=jnp.asarray(payload["dt"], jnp.float32),
        step=jnp.asarray(payload["step"], jnp.int32),
    )


# ------------------------------------------------------------------ VTP files

def write_vtp(path: str, points: np.ndarray, triangles: np.ndarray,
              point_data: dict | None = None):
    """Minimal VTK XML PolyData (ASCII) writer — replaces the reference's
    pyvista `isosurface.save(...)` dependency (main.py:773)."""
    points = np.asarray(points, np.float32).reshape(-1, 3)
    triangles = np.asarray(triangles, np.int64).reshape(-1, 3)
    n_pts, n_tri = len(points), len(triangles)

    def arr_to_text(a, per_line=9):
        flat = np.asarray(a).reshape(-1)
        return "\n".join(
            " ".join(repr(x) if isinstance(x, float) else str(x)
                     for x in flat[i : i + per_line])
            for i in range(0, len(flat), per_line)
        )

    pd_blocks = []
    for name, data in (point_data or {}).items():
        pd_blocks.append(
            f'<DataArray type="Float32" Name="{name}" format="ascii">\n'
            f"{arr_to_text(np.asarray(data, np.float32))}\n</DataArray>"
        )
    point_data_xml = (
        "<PointData>\n" + "\n".join(pd_blocks) + "\n</PointData>"
        if pd_blocks
        else "<PointData/>"
    )

    xml = f"""<?xml version="1.0"?>
<VTKFile type="PolyData" version="0.1" byte_order="LittleEndian">
  <PolyData>
    <Piece NumberOfPoints="{n_pts}" NumberOfVerts="0" NumberOfLines="0" NumberOfStrips="0" NumberOfPolys="{n_tri}">
      {point_data_xml}
      <Points>
        <DataArray type="Float32" NumberOfComponents="3" format="ascii">
{arr_to_text(points)}
        </DataArray>
      </Points>
      <Polys>
        <DataArray type="Int64" Name="connectivity" format="ascii">
{arr_to_text(triangles)}
        </DataArray>
        <DataArray type="Int64" Name="offsets" format="ascii">
{arr_to_text(np.arange(3, 3 * n_tri + 1, 3))}
        </DataArray>
      </Polys>
    </Piece>
  </PolyData>
</VTKFile>
"""
    with open(path, "w") as f:
        f.write(xml)


# --------------------------------------------------------------- 6DoF tables

_ROW_RE = re.compile(
    r"\(\s*([0-9.eE+-]+)\s*"
    r"\(\s*([0-9.eE+-]+)\s+([0-9.eE+-]+)\s+([0-9.eE+-]+)\s*\)\s*"
    r"\(\s*([0-9.eE+-]+)\s+([0-9.eE+-]+)\s+([0-9.eE+-]+)\s*\)\s*\)"
)


def read_6dof_table(path: str):
    """Parse an OpenFOAM 6DoF table. Returns (times, trans(n,3), rot(n,3))."""
    text = open(path).read()
    rows = _ROW_RE.findall(text)
    if not rows:
        raise ValueError(f"no motion rows found in {path}")
    data = np.asarray(rows, np.float64)
    return data[:, 0], data[:, 1:4], data[:, 4:7]


def write_6dof_table(path: str, times, trans, rot):
    """Write the `List<Tuple3>` format exactly as generate_motion.py does
    (count, parenthesized rows, %.6g floats)."""
    times = np.asarray(times)
    trans = np.asarray(trans)
    rot = np.asarray(rot)
    g = lambda x: f"{x:.6g}"
    with open(path, "w") as f:
        f.write(f"{len(times)}\n(\n")
        for t, xyz, r in zip(times, trans, rot):
            f.write(
                f"({g(t)} ({g(xyz[0])} {g(xyz[1])} {g(xyz[2])}) "
                f"({g(r[0])} {g(r[1])} {g(r[2])}))\n"
            )
        f.write(")\n")


def generate_sine_motion_table(
    path: str,
    n: int = 100,
    duration: float = 40.0,
    trans_amp=(2.0, 3.0, 2.0),
    trans_omega=(0.5, 0.8, 0.4),
    rot_amp_deg=(30.0, 10.0, 10.0),
    rot_omega=(0.4, 0.7, 0.5),
):
    """The reference gen6DoF table: sinusoidal translation+rotation,
    100 samples over 40 s (/root/reference/sloshingTank3D6DoF/gen6DoF/
    gen6DoF.C:44-82). Same math as native/gen6dof.cpp's `sine` mode."""
    t = np.arange(n) * (duration / (n - 1))
    trans = np.stack(
        [a * np.sin(w * t) for a, w in zip(trans_amp, trans_omega)], -1
    )
    rot = np.stack(
        [a * np.sin(w * t) for a, w in zip(rot_amp_deg, rot_omega)], -1
    )
    write_6dof_table(path, t, trans, rot)
    return path


def generate_orbital_motion_table(
    path: str, r_max: float, freq: float, duration: float, dt: float,
    ramp_duration: float,
):
    """Reference-parity motion table generation (generate_motion.py:9-40):
    circular orbit with smootherstep-ramped radius, zero rotation."""
    n = int(duration / dt) + 1
    t = np.arange(n) * dt
    tau = np.clip(np.divide(t, ramp_duration, out=np.full_like(t, np.inf),
                            where=ramp_duration > 0), 0.0, 1.0)
    s = tau * tau * tau * (tau * (tau * 6 - 15) + 10)
    r = r_max * np.where(t < ramp_duration, s, 1.0)
    th = 2 * np.pi * freq * t
    trans = np.stack([r * np.cos(th), r * np.sin(th), np.zeros_like(t)], -1)
    write_6dof_table(path, t, trans, np.zeros_like(trans))
    return path
