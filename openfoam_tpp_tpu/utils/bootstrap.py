"""Dependency bootstrap — TPU-native analog of the reference's venv
self-setup (/root/reference/main.py:9-95).

The reference auto-creates a ``sloshing/`` venv, pip-installs
``requirements.txt``, and re-execs itself inside the venv whenever it
detects it is running outside it. On a TPU host the runtime (jax et al.)
is usually baked into the machine image, so the default behavior here is
a *check*: verify every runtime dependency imports and meets the minimum
version, and print one actionable line per problem. Full venv
self-provisioning (create → install → re-exec, the reference's exact
behavior) is available behind ``auto=True`` / ``OFTPP_BOOTSTRAP=1`` so
air-gapped images never spawn pip unasked.
"""

from __future__ import annotations

import importlib
import os
import subprocess
import sys

#: Runtime requirements (import name -> minimum version). jax is the
#: compute path; numpy the host path; matplotlib/scipy serve postprocess
#: and the potential-flow oracle (reference requirements.txt:2-8).
REQUIRED = {
    "jax": "0.4",
    "numpy": "1.24",
}
OPTIONAL = {
    "matplotlib": "3.5",   # videos / dashboards (post/video.py)
    "scipy": "1.8",        # Bessel functions (utils/potential_flow.py)
}

VENV_DIR = ".venv-sloshing"   # reference uses "sloshing/" (main.py:22)
_ENV_FLAG = "OFTPP_BOOTSTRAP"
_REEXEC_GUARD = "OFTPP_BOOTSTRAPPED"


def _version_tuple(v: str) -> tuple:
    out = []
    for part in v.split("."):
        digits = "".join(ch for ch in part if ch.isdigit())
        if not digits:
            break
        out.append(int(digits))
    return tuple(out)


def check_dependencies(include_optional: bool = True) -> list[str]:
    """Return a list of human-readable problems (empty = all good)."""
    problems = []
    groups = [(REQUIRED, "required")]
    if include_optional:
        groups.append((OPTIONAL, "optional"))
    for table, kind in groups:
        for name, min_ver in table.items():
            try:
                mod = importlib.import_module(name)
            except ImportError:
                problems.append(f"{kind} dependency '{name}' is missing "
                                f"(need >= {min_ver})")
                continue
            ver = getattr(mod, "__version__", None)
            if ver and _version_tuple(ver) < _version_tuple(min_ver):
                problems.append(f"{kind} dependency '{name}' is {ver}, "
                                f"need >= {min_ver}")
    return problems


def in_managed_venv() -> bool:
    """True when running inside the framework-managed venv (the
    reference's venv-mismatch detection, main.py:36-43)."""
    return os.path.basename(sys.prefix) == VENV_DIR


def ensure_dependencies(auto: bool | None = None,
                        base_dir: str = ".") -> bool:
    """Verify the runtime; optionally self-provision a venv and re-exec.

    Returns True when the environment is usable. With ``auto`` unset, the
    ``OFTPP_BOOTSTRAP=1`` env var enables provisioning (reference
    behavior); otherwise problems are reported and required-dependency
    failures return False.
    """
    if auto is None:
        auto = os.environ.get(_ENV_FLAG, "") == "1"
    problems = check_dependencies()
    required_broken = [p for p in problems if p.startswith("required")]
    for p in problems:
        print(f"  ⚠️  {p}", file=sys.stderr)
    if not required_broken:
        return True
    if not auto or os.environ.get(_REEXEC_GUARD):
        print(
            "  ❌ Runtime incomplete. Install the packages above into this "
            f"interpreter, or set {_ENV_FLAG}=1 to let the manager build "
            f"a '{VENV_DIR}' venv and re-exec itself (requires network).",
            file=sys.stderr,
        )
        return False
    return _provision_and_reexec(base_dir)


def _provision_and_reexec(base_dir: str) -> bool:
    """Create the venv, install this package, re-exec under it —
    the reference's create/install/exec sequence (main.py:46-95)."""
    venv_path = os.path.join(base_dir, VENV_DIR)
    py = os.path.join(venv_path, "bin", "python")
    if not os.path.exists(py):
        print(f"  🔧 Creating virtual environment at {venv_path} ...")
        subprocess.run([sys.executable, "-m", "venv", venv_path],
                       check=True)
    pkg_root = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    print("  📦 Installing openfoam-tpp-tpu (+deps) into the venv ...")
    subprocess.run([py, "-m", "pip", "install", "-e", pkg_root],
                   check=True)
    env = dict(os.environ, **{_REEXEC_GUARD: "1"})
    print("  🔁 Re-executing inside the venv ...")
    os.execve(py, [py, "-m", "openfoam_tpp_tpu"] + sys.argv[1:], env)
    return True  # unreachable
