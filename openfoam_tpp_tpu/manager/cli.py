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


def action_run(case_dir: str) -> bool:
    from openfoam_tpp_tpu.manager.runner import run_case

    print(f"  🚀 Running {os.path.basename(case_dir)} ...")
    run_case(case_dir)
    return True


ACTIONS = {
    "interface": action_interface,
    "flow": action_flow,
    "video": action_video,
    "run": action_run,
}


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
    for idx in naming.parse_indices(sel, len(all_cases)):
        case_dir = os.path.join(base_dir, all_cases[idx])
        if submit:
            from openfoam_tpp_tpu.manager.submit import submit_case

            submit_case(case_dir, "run")
        else:
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


def main_menu(base_dir: str = "."):
    while True:
        print("\n========== TPU Sloshing Manager ==========")
        print(" 1. Build cases (parameter sweeps)")
        print(" 2. Run cases (TPU solver, resume-aware)")
        print(" 3. Postprocess (interface / flow / video)")
        print(" 4. Exit")
        choice = _prompt("Choice: ", "4")
        if choice == "1":
            menu_build_cases(base_dir)
        elif choice == "2":
            menu_run_cases(base_dir)
        elif choice == "3":
            menu_postprocess(base_dir)
        else:
            return


# --------------------------------------------------------------------- main

def main(argv=None):
    ap = argparse.ArgumentParser(
        description="TPU-native sloshing simulation manager"
    )
    ap.add_argument("--headless", action="store_true",
                    help="non-interactive mode (reference parity)")
    ap.add_argument("--case", help="case directory name")
    ap.add_argument("--action", choices=sorted(ACTIONS),
                    help="headless action")
    ap.add_argument("--base-dir", default=".", help="cases root directory")
    ap.add_argument("--submit", action="store_true",
                    help="submit the action as a Slurm job instead of "
                         "running it in-process (run_case_oscar parity)")
    ap.add_argument("--partition", default="tpu", help="Slurm partition")
    args = ap.parse_args(argv)

    if args.headless:
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
        ok = ACTIONS[args.action](case_dir)
        return 0 if ok else 1

    main_menu(args.base_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
