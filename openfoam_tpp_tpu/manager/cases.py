"""Case lifecycle: build, completion checks, resume — manager parity with
the reference's `setup_case`/`is_case_done` (/root/reference/main.py:163-331)
minus the subprocess fan-out: geometry and motion are built in-process (no
gmsh/gmshToFoam/setFields binaries), so "building" a case writes metadata
+ the reference-format motion table, and the solver state is created on
demand from the encoded parameters.
"""

from __future__ import annotations

import json
import os

from openfoam_tpp_tpu.config import DEFAULTS
from openfoam_tpp_tpu.utils import naming
from openfoam_tpp_tpu.utils.io import (
    generate_orbital_motion_table,
    generate_sine_motion_table,
    latest_checkpoint,
)

# Closed rectangular 6DoF tank defaults — the OpenFOAM tutorial
# `sloshingTank3D` block (20 m × 20 m × 40 m, waterline z=0:
# /root/reference/sloshingTank3D6DoF/Allrun:7 + system/setFieldsDict
# water box up to z=0; probes at y=±9.95, z=19.77 bracket the extents).
# `chamfer` > 0 builds the tutorial resource's true shape class — the
# prism with 45°-chamfered bottom/top edges
# (mesh/geometry.build_chamfer_tank_geometry) — as a fraction of Lz;
# 0 keeps the plain box (bit-compatible with pre-r5 cases).
DEFAULTS_6DOF = {
    "model": "tank6dof",
    "Lx": 20.0,
    "Ly": 20.0,
    "Lz": 40.0,
    "mesh": 1.0,
    "chamfer": 0.0,
    "duration": 40.0,   # sloshingTank3D6DoF/system/controlDict endTime
    "dt": 0.01,         # controlDict deltaT
}


def setup_case(params: dict, base_dir: str = ".") -> str:
    """Create the case directory for a parameter set.

    Artifacts (parity with setup_case, main.py:266-331):
      * case.json            — authoritative parameter store
      * constant/6DoF.dat    — reference-format orbital motion table
      * postProcessing/      — output root
    The folder name itself is the reference's parameter codec.
    """
    params = {**DEFAULTS, **params}
    case_dir = os.path.join(base_dir, naming.get_case_name(params))
    os.makedirs(os.path.join(case_dir, "constant"), exist_ok=True)
    os.makedirs(os.path.join(case_dir, "postProcessing"), exist_ok=True)

    ramp = params["ramp"]
    ramp_t = params["duration"] * 0.1 if ramp < 0 else ramp
    generate_orbital_motion_table(
        os.path.join(case_dir, "constant", "6DoF.dat"),
        r_max=params["R"], freq=params["freq"],
        duration=params["duration"], dt=params["dt"], ramp_duration=ramp_t,
    )
    with open(os.path.join(case_dir, "case.json"), "w") as f:
        json.dump(params, f, indent=2, sort_keys=True)
    return case_dir


def setup_case_6dof(params: dict | None = None, base_dir: str = ".",
                    motion_table: str | None = None) -> str:
    """Create a closed-tank 6DoF case (sloshingTank3D6DoF parity).

    The motion table defaults to the gen6DoF sine table; pass
    `motion_table` to copy an externally generated 6DoF.dat (e.g. from
    native/gen6dof)."""
    import shutil

    params = {**DEFAULTS_6DOF, **(params or {})}
    name = (
        f"case_6dof_L{params['Lx']:g}x{params['Ly']:g}x{params['Lz']:g}"
        f"_m{params['mesh']:g}_d{params['duration']:g}"
    )
    if float(params.get("chamfer", 0.0)) > 0.0:
        name += f"_c{params['chamfer']:g}"
    case_dir = os.path.join(base_dir, name)
    os.makedirs(os.path.join(case_dir, "constant"), exist_ok=True)
    os.makedirs(os.path.join(case_dir, "postProcessing"), exist_ok=True)
    table = os.path.join(case_dir, "constant", "6DoF.dat")
    if motion_table:
        shutil.copyfile(motion_table, table)
    else:
        generate_sine_motion_table(table, duration=params["duration"])
    with open(os.path.join(case_dir, "case.json"), "w") as f:
        json.dump(params, f, indent=2, sort_keys=True)
    return case_dir


def load_case_params(case_dir: str) -> dict:
    """case.json if present, else decode the folder name (reference codec)."""
    path = os.path.join(case_dir, "case.json")
    if os.path.exists(path):
        with open(path) as f:
            params = json.load(f)
        base = DEFAULTS_6DOF if params.get("model") == "tank6dof" else DEFAULTS
        return {**base, **params}
    return naming.parse_case_params(os.path.basename(os.path.normpath(case_dir)))


def list_cases(base_dir: str = ".") -> list[str]:
    """All case_* directories under base_dir (menu listing parity)."""
    if not os.path.isdir(base_dir):
        return []
    out = [
        d for d in sorted(os.listdir(base_dir))
        if d.startswith("case_") and os.path.isdir(os.path.join(base_dir, d))
    ]
    return out


def case_progress(case_dir: str) -> float:
    """Latest checkpointed simulation time (0.0 if none)."""
    chk = latest_checkpoint(case_dir)
    return chk[0] if chk else 0.0


def is_case_done(case_dir: str, duration: float | None = None) -> bool:
    """Completion check. Unlike the reference (which tested DEFAULT
    duration — a documented defect, main.py:582), the case's own duration
    is used."""
    if duration is None:
        duration = load_case_params(case_dir)["duration"]
    return case_progress(case_dir) >= duration - 1e-6


def expand_sweep(sweep_params: dict[str, list], confirm_cartesian=None):
    """Combine per-parameter sweep lists into case parameter sets.

    Reference semantics (main.py:504-534): if every swept list has equal
    length > 1, zip them ("paired" mode); otherwise take the Cartesian
    product (optionally gated by `confirm_cartesian()` returning bool).
    """
    import itertools

    keys = list(sweep_params)
    lists = [
        v if isinstance(v, (list, tuple)) else [v] for v in sweep_params.values()
    ]
    multi = [len(v) for v in lists if len(v) > 1]
    if multi and all(n == multi[0] for n in multi) and len(multi) > 1:
        # zip mode: broadcast singletons
        n = multi[0]
        rows = []
        for i in range(n):
            rows.append({
                k: (v[i] if len(v) > 1 else v[0])
                for k, v in zip(keys, lists)
            })
        return rows, "zip"
    combos = itertools.product(*lists)
    rows = [dict(zip(keys, c)) for c in combos]
    if len(rows) > 1 and confirm_cartesian is not None:
        if not confirm_cartesian(len(rows)):
            return [], "cancelled"
    return rows, "cartesian"
