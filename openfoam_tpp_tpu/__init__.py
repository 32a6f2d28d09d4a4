"""openfoam_tpp_tpu — TPU-native two-phase VoF sloshing framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the
OpenFOAM sloshing manager `elvis-aguero/openfoam-TPP`: parameterized
orbital-shaking VoF simulations in cylindrical tanks, with sweeps,
run/resume, interface extraction, and potential-flow comparison —
with the entire interFoam-class physics engine implemented natively
on TPU instead of delegating to `foamRun incompressibleVoF`.
"""

__version__ = "0.1.0"

from openfoam_tpp_tpu.config import DEFAULTS, PhysicalProperties  # noqa: F401
