"""Build + run + postprocess the curved-bottom (cap) demo case into cases/.

The reference ships two cap cases with only initial fields
(/root/reference/case_H0.004_D0.0221_cap_R0.005_f2.0/0/ — no golden
time series exists upstream), so this artifact is the repo's own
end-to-end cap run: the reference's cap parameter point at a resolution
that actually resolves the 4 mm fill (the reference name implies its
2 mm default mesh — 2 cells over the fill), driven through the exact
manager path a user takes (setup → run → interface), with the interface
summary CSVs as the shipped result.

Run on the TPU host:  python scripts/make_cap_artifact.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                    "cases")

ROW = {
    # Reference cap point (case_H0.004_D0.0221_cap_R0.005_f2.0) at a
    # fill-resolving mesh: 10 cells over H, ~55 across the bowl.
    "H": 0.004, "D": 0.0221, "geo": "cap", "R": 0.005, "freq": 2.0,
    "duration": 3.0, "mesh": 0.0004, "dt": 5e-4, "ramp": -1.0,
    "n_cpus": 1,
}


def main():
    if os.environ.get("JAX_PLATFORMS"):
        # Site plugins (axon tunnel) clobber jax_platforms at import.
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from openfoam_tpp_tpu.manager.cases import setup_case
    from openfoam_tpp_tpu.manager.cli import action_interface
    from openfoam_tpp_tpu.manager.runner import run_case
    from openfoam_tpp_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    case_dir = setup_case(dict(ROW), BASE)
    print(f"case: {case_dir}")
    run_case(case_dir)
    action_interface(case_dir)
    print("cap artifact complete")


if __name__ == "__main__":
    main()
