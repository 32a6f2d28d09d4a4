"""Interactive manager + headless CLI — L5 parity with the reference's
`main.py` menus (main_menu main.py:1064-1092; headless main.py:1094-1114).

Verbs: build (param sweeps → case dirs), run (solve on TPU, resume-aware),
postprocess (interface | flow | video). Headless form is a superset of the
reference's:

    python -m openfoam_tpp_tpu --headless --case case_... --action interface
    python -m openfoam_tpp_tpu --headless --case case_... --action run
"""

from __future__ import annotations

import argparse
import os
import sys

from openfoam_tpp_tpu.config import DEFAULTS
from openfoam_tpp_tpu.manager import cases as case_mgr
from openfoam_tpp_tpu.utils import naming, resources


# ------------------------------------------------------------ postprocessing

def action_interface(case_dir: str) -> bool:
    from openfoam_tpp_tpu.manager.runner import (
        _case_shape_hint,
        build_case_geometry,
        iterate_snapshots,
    )
    from openfoam_tpp_tpu.post.interface import extract_interface

    params = case_mgr.load_case_params(case_dir)
    geom = build_case_geometry(params, _case_shape_hint(case_dir))
    print(f"  📊 Extracting interface for {case_dir} (on-device column pass)...")
    out = extract_interface(case_dir, geom, iterate_snapshots(case_dir))
    print(f"  ✅ Extraction complete: {out}")
    return True


def action_flow(case_dir: str) -> bool:
    """Potential-flow prediction (generate_potential_flow parity,
    main.py:820-880; liquid depth d = H/2, main.py:846 — but keeping the
    case's parsed duration, fixing the reference's overwrite bug)."""
    from openfoam_tpp_tpu.utils import potential_flow as pf

    params = case_mgr.load_case_params(case_dir)
    print(f"  📐 Generating potential flow prediction for "
          f"{os.path.basename(case_dir)}...")
    out_dir = os.path.join(case_dir, "postProcessing", "potential_flow")
    os.makedirs(out_dir, exist_ok=True)
    out, summary = pf.generate_wall_elevation_csv(
        out_dir,
        R=params["D"] / 2.0,
        a=params["R"],
        freq=params["freq"],
        d=params["H"] / 2.0,
        duration=params["duration"],
    )
    pf.print_summary(summary)
    print(f"  ✅ Potential flow data saved: {out}")
    return True


def action_video(case_dir: str) -> bool:
    from openfoam_tpp_tpu.post.video import generate_video

    return generate_video(case_dir)


def action_run(case_dir: str, devices=None) -> bool:
    from openfoam_tpp_tpu.manager.runner import run_case

    print(f"  🚀 Running {os.path.basename(case_dir)} ..."
          + (f" ({devices}-device sharded)" if devices not in (None, 1)
             else ""))
    run_case(case_dir, devices=devices)
    return True


def action_profile(case_dir: str) -> bool:
    """XLA trace + per-step timing for a case (utils/profiling.py) — the
    in-process profiling subsystem the reference lacks (SURVEY.md §5)."""
    from openfoam_tpp_tpu.utils.profiling import profile_case

    print(f"  ⏱  Profiling {os.path.basename(case_dir)} ...")
    n = int(os.environ.get("OFTPP_PROFILE_STEPS", "20"))
    profile_case(case_dir, n_steps=n)
    return True


def action_runsweep(case_dirs: list[str], lockstep: bool = True,
                    devices=None) -> bool:
    """Run many cases as vmapped batches (manager/sweeprun.py) — the
    in-process replacement for per-case Slurm job farming
    (/root/reference/main.py:599-608). `lockstep=False` (--percase-dt)
    gives every lane its own adaptive dt (solo-run parity).

    `devices=N` farms each batch over an N-device case-axis mesh (zero
    halo traffic — the multi-chip sweep path, VERDICT r3 item 2c); a
    group remainder that does not divide N runs unsharded."""
    from openfoam_tpp_tpu.manager.sweeprun import (
        group_cases,
        run_cases_batched,
    )
    from openfoam_tpp_tpu.parallel.sharding import parse_devices

    d_x, d_y = parse_devices(devices)
    n_dev = d_x * d_y

    for group in group_cases(case_dirs):
        chunks = [(group, 1)]
        if n_dev > 1 and len(group) > 1:
            head = len(group) - (len(group) % n_dev)
            chunks = ([(group[:head], n_dev)] if head else []) \
                + ([(group[head:], 1)] if head < len(group) else [])
        for part, nd in chunks:
            if len(part) == 1:
                action_run(part[0])
            else:
                print(f"  🚀 Batched run: {len(part)} cases in one program"
                      + (f" over {nd} devices" if nd > 1 else "")
                      + ("" if lockstep else " (per-case dt)"))
                run_cases_batched(part, lockstep=lockstep, devices=nd)
    return True


ACTIONS = {
    "interface": action_interface,
    "flow": action_flow,
    "video": action_video,
    "run": action_run,
    "profile": action_profile,
}


def _default_6dof_table() -> str | None:
    """Path of the native gen6dof binary's output helper, if built."""
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    exe = os.path.join(here, "native", "gen6dof")
    return exe if os.path.isfile(exe) and os.access(exe, os.X_OK) else None


def build_6dof_case(overrides: dict | None = None, base_dir: str = ".",
                    motion_table: str | None = None,
                    use_native: bool = False) -> str:
    """Build a closed-tank 6DoF case; optionally generate the motion table
    with the native gen6dof CLI (gen6DoF.C parity component)."""
    import subprocess
    import tempfile

    if use_native and motion_table is None:
        exe = _default_6dof_table()
        if exe:
            tmp = tempfile.NamedTemporaryFile(
                suffix=".dat", delete=False).name
            subprocess.run([exe, "sine", tmp], check=True)
            motion_table = tmp
            print(f"  🧱 motion table from native gen6dof: {exe}")
        else:
            print("  ⚠ native/gen6dof not built (make -C native); "
                  "using the Python sine table")
    case_dir = case_mgr.setup_case_6dof(overrides, base_dir,
                                        motion_table=motion_table)
    print(f"   ✅ {os.path.basename(case_dir)} (6DoF closed tank)")
    return case_dir


def display_config(base_dir: str = "."):
    """Configuration overview — parity with the reference's
    `display_config` (/root/reference/main.py:401-430): the parameter
    schema with defaults, plus every existing case with its decoded
    parameters and run status."""
    from openfoam_tpp_tpu.manager.cases import DEFAULTS_6DOF

    print("\n--- Current configuration ---")
    print("  Orbital cylinder defaults (DEFAULTS):")
    for k, v in DEFAULTS.items():
        print(f"    {k:10s} = {v}")
    print("  6DoF closed-tank defaults:")
    for k, v in DEFAULTS_6DOF.items():
        if k != "model":
            print(f"    {k:10s} = {v}")
    all_cases = case_mgr.list_cases(base_dir)
    if not all_cases:
        print("  (no cases built yet)")
        return
    print(f"  {len(all_cases)} case(s) in {os.path.abspath(base_dir)}:")
    for c in all_cases:
        case_dir = os.path.join(base_dir, c)
        params = case_mgr.load_case_params(case_dir)
        done = case_mgr.is_case_done(case_dir)
        prog = case_mgr.case_progress(case_dir)
        status = ("done" if done
                  else f"t={prog:g}/{params['duration']:g}s" if prog > 0
                  else "new")
        print(f"    {c}  [{status}]")


# ------------------------------------------------------------------- menus

def _prompt(msg: str, default: str = "") -> str:
    try:
        raw = input(msg).strip()
    except EOFError:
        return default
    return raw or default


def menu_build_cases(base_dir: str = "."):
    """Per-parameter entry with MATLAB ranges; zip/Cartesian sweep
    semantics (main.py:431-566)."""
    print("\n--- Build Cases ---")
    print("Enter values (or MATLAB ranges start:step:end, comma lists).")
    sweep = {}
    for key, dv in DEFAULTS.items():
        if key == "n_cpus":
            continue
        raw = _prompt(f"  {key} [{dv}]: ", str(dv))
        if key == "geo":
            vals = [v.strip() for v in raw.split(",")]
            for v in vals:
                if v not in ("flat", "cap"):
                    print(f"  ⚠ invalid geo {v!r}, using 'flat'")
            vals = [v if v in ("flat", "cap") else "flat" for v in vals]
            sweep[key] = vals
        else:
            try:
                sweep[key] = naming.parse_range(raw)
            except ValueError as e:
                print(f"  ⚠ {e}; using default")
                sweep[key] = [dv]

    def confirm(n):
        return _prompt(
            f"  Cartesian product gives {n} cases. Proceed? [y/N]: ", "n"
        ).lower().startswith("y")

    rows, mode = case_mgr.expand_sweep(sweep, confirm_cartesian=confirm)
    if not rows:
        print("  Cancelled.")
        return
    print(f"  {len(rows)} case(s) ({mode} mode):")
    for row in rows:
        est = resources.estimate_resources({**DEFAULTS, **row})
        d = case_mgr.setup_case(row, base_dir)
        print(f"   ✅ {os.path.basename(d)}  — {est.summary()}")


def menu_run_cases(base_dir: str = "."):
    all_cases = case_mgr.list_cases(base_dir)
    if not all_cases:
        print("  No cases found. Build some first.")
        return
    print("\n--- Run Cases ---")
    for i, c in enumerate(all_cases):
        params = case_mgr.load_case_params(os.path.join(base_dir, c))
        done = case_mgr.is_case_done(os.path.join(base_dir, c))
        prog = case_mgr.case_progress(os.path.join(base_dir, c))
        status = "✅ done" if done else (
            f"▶ t={prog:g}/{params['duration']:g}s" if prog > 0 else "· new"
        )
        print(f"  {i + 1}. {c}  [{status}]")
    sel = _prompt("Select cases (e.g. 1,3-5 or all): ", "")
    if not sel:
        return
    # Cluster submission parity ("Are you on Oscar?" — USER_GUIDE.md:12):
    # offered when a Slurm scheduler is present.
    import shutil as _sh

    submit = False
    if _sh.which("sbatch"):
        submit = _prompt(
            "Submit to Slurm instead of running locally? [y/N]: ", "n"
        ).lower().startswith("y")
    picked = [os.path.join(base_dir, all_cases[idx])
              for idx in naming.parse_indices(sel, len(all_cases))]
    if submit:
        from openfoam_tpp_tpu.manager.submit import submit_case

        for case_dir in picked:
            submit_case(case_dir, "run")
        return
    batched = len(picked) > 1 and _prompt(
        f"Run the {len(picked)} cases as vmapped batches "
        "(one compiled program per compatible group)? [y/N]: ", "n"
    ).lower().startswith("y")
    if batched:
        action_runsweep(picked)
    else:
        for case_dir in picked:
            action_run(case_dir)


def menu_postprocess(base_dir: str = "."):
    all_cases = case_mgr.list_cases(base_dir)
    if not all_cases:
        print("  No cases found.")
        return
    print("\n--- Postprocess ---")
    for i, c in enumerate(all_cases):
        print(f"  {i + 1}. {c}")
    sel = _prompt("Select cases (e.g. 1,3-5 or all): ", "")
    if not sel:
        return
    print("  Actions: 1) video  2) interface  3) flow (potential theory)")
    act = _prompt("Action [2]: ", "2")
    action = {"1": "video", "2": "interface", "3": "flow"}.get(act, "interface")
    for idx in naming.parse_indices(sel, len(all_cases)):
        ACTIONS[action](os.path.join(base_dir, all_cases[idx]))


def menu_build_6dof(base_dir: str = "."):
    """Interactive build for the closed-tank 6DoF family
    (/root/reference/sloshingTank3D6DoF)."""
    from openfoam_tpp_tpu.manager.cases import DEFAULTS_6DOF

    print("\n--- Build 6DoF closed-tank case ---")
    overrides = {}
    for key in ("Lx", "Ly", "Lz", "mesh", "chamfer", "duration", "dt"):
        dv = DEFAULTS_6DOF[key]
        raw = _prompt(f"  {key} [{dv}]: ", str(dv))
        try:
            overrides[key] = float(raw)
        except ValueError:
            print(f"  ⚠ invalid {key}; using default")
            overrides[key] = dv
    table = _prompt(
        "  Motion table path [blank = gen6DoF sine table]: ", ""
    ) or None
    use_native = False
    if table is None and _default_6dof_table():
        use_native = _prompt(
            "  Generate table with native gen6dof? [Y/n]: ", "y"
        ).lower().startswith("y")
    build_6dof_case(overrides, base_dir, motion_table=table,
                    use_native=use_native)


def main_menu(base_dir: str = "."):
    while True:
        print("\n========== TPU Sloshing Manager ==========")
        print(" 1. Build cases (parameter sweeps)")
        print(" 2. Run cases (TPU solver, resume-aware)")
        print(" 3. Postprocess (interface / flow / video)")
        print(" 4. Build 6DoF closed-tank case")
        print(" 5. Show configuration")
        print(" 6. Exit")
        choice = _prompt("Choice: ", "6")
        if choice == "1":
            menu_build_cases(base_dir)
        elif choice == "2":
            menu_run_cases(base_dir)
        elif choice == "3":
            menu_postprocess(base_dir)
        elif choice == "4":
            menu_build_6dof(base_dir)
        elif choice == "5":
            display_config(base_dir)
        else:
            return


# --------------------------------------------------------------------- main

def main(argv=None):
    # Honor an explicit JAX_PLATFORMS request: site plugins (the axon TPU
    # tunnel here) force jax_platforms at import, clobbering the env var —
    # re-assert it so `JAX_PLATFORMS=cpu python -m openfoam_tpp_tpu`
    # reliably runs local CPU (e.g. when the TPU tunnel is down).
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    ap = argparse.ArgumentParser(
        description="TPU-native sloshing simulation manager"
    )
    ap.add_argument("--headless", action="store_true",
                    help="non-interactive mode (reference parity)")
    ap.add_argument("--case", help="case directory name")
    ap.add_argument("--action", choices=sorted(ACTIONS) + ["build6dof",
                                                           "config",
                                                           "runsweep"],
                    help="headless action")
    ap.add_argument("--base-dir", default=".", help="cases root directory")
    ap.add_argument("--params", default="",
                    help="comma-separated key=value overrides for "
                         "--action build6dof (e.g. Lx=20,mesh=1)")
    ap.add_argument("--motion-table", default=None,
                    help="existing 6DoF.dat to copy into a build6dof case")
    ap.add_argument("--native-table", action="store_true",
                    help="generate the build6dof motion table with the "
                         "native gen6dof binary")
    ap.add_argument("--submit", action="store_true",
                    help="submit the action as a Slurm job instead of "
                         "running it in-process (run_case_oscar parity)")
    ap.add_argument("--partition", default="tpu", help="Slurm partition")
    ap.add_argument("--percase-dt", action="store_true",
                    help="runsweep: per-lane adaptive dt with masked holds "
                         "at write targets (solo-run parity; the reference "
                         "farms cases as independent jobs) instead of the "
                         "lockstep batch-min dt")
    ap.add_argument("--devices", type=str, default=None,
                    help="shard the run over N devices (jax.sharding mesh "
                         "— decomposePar/mpirun/reconstructPar parity), or "
                         "'NxM' for a 2-D x·y spatial decomposition "
                         "(hierarchical-n decomposeParDict analog); with "
                         "runsweep, farms the batch case axis across the "
                         "N devices (zero-halo multi-chip sweep farming); "
                         "provision virtual devices for testing with "
                         "XLA_FLAGS=--xla_force_host_platform_device_count=N)")
    args = ap.parse_args(argv)

    # Dependency self-check (venv bootstrap parity, main.py:9-95): verify
    # the runtime imports; OFTPP_BOOTSTRAP=1 enables full venv
    # self-provisioning + re-exec (utils/bootstrap.py).
    from openfoam_tpp_tpu.utils.bootstrap import ensure_dependencies

    if not ensure_dependencies(base_dir=args.base_dir):
        return 2

    # Persistent XLA compile cache: solver compiles take minutes on the
    # remote TPU compiler — cache across CLI invocations.
    from openfoam_tpp_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    if args.headless:
        if args.action == "config":
            display_config(args.base_dir)
            return 0
        if args.action == "runsweep":
            # --case: comma-separated case names, or "all"/omitted for
            # every unfinished case under --base-dir.
            if args.case and args.case != "all":
                names = [c.strip() for c in args.case.split(",")]
            else:
                names = [c for c in case_mgr.list_cases(args.base_dir)
                         if not case_mgr.is_case_done(
                             os.path.join(args.base_dir, c))]
            dirs = [os.path.join(args.base_dir, c) for c in names]
            missing = [d for d in dirs if not os.path.isdir(d)]
            if missing:
                print(f"❌ case(s) not found: {missing}")
                return 1
            if not dirs:
                print("Nothing to run.")
                return 0
            return 0 if action_runsweep(
                dirs, lockstep=not args.percase_dt,
                devices=args.devices) else 1
        if args.action == "build6dof":
            overrides = {}
            for kv in filter(None, args.params.split(",")):
                k, _, v = kv.partition("=")
                overrides[k.strip()] = float(v)
            build_6dof_case(overrides, args.base_dir,
                            motion_table=args.motion_table,
                            use_native=args.native_table)
            return 0
        if not (args.case and args.action):
            ap.error("--headless requires --case and --action")
        case_dir = os.path.join(args.base_dir, args.case)
        if not os.path.isdir(case_dir):
            print(f"❌ case not found: {case_dir}")
            return 1
        if args.submit:
            from openfoam_tpp_tpu.manager.submit import submit_case

            return 0 if submit_case(case_dir, args.action,
                                    partition=args.partition) else 1
        print(f"Post-processing: {args.action} on {args.case}"
              if args.action != "run" else f"Running: {args.case}")
        if args.action == "run" and args.devices:
            ok = action_run(case_dir, devices=args.devices)
        else:
            ok = ACTIONS[args.action](case_dir)
        return 0 if ok else 1

    main_menu(args.base_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
