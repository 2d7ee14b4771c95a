from particle_simulator_tpu.engine.state import (  # noqa: F401
    PARTICLE_MASS,
    ParticleState,
    SimParams,
    empty_state,
    state_from_numpy,
    state_to_numpy,
)


def __getattr__(name):
    # lazy: simulator imports physics.bucket which imports engine.state —
    # importing it eagerly here would be a circular import
    if name == "Simulator":
        from particle_simulator_tpu.engine.simulator import Simulator

        return Simulator
    raise AttributeError(name)
