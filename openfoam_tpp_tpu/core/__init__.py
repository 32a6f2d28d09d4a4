from openfoam_tpp_tpu.core.state import SimState, CaseParams, init_state  # noqa: F401
from openfoam_tpp_tpu.core.motion import (  # noqa: F401
    smootherstep,
    orbital_position,
    orbital_acceleration,
    effective_gravity,
    TableMotion,
)
