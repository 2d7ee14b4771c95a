from particle_simulator_tpu.engine.state import (  # noqa: F401
    PARTICLE_MASS,
    ParticleState,
    SimParams,
    empty_state,
    state_from_numpy,
    state_to_numpy,
)
from particle_simulator_tpu.engine.simulator import Simulator  # noqa: F401
