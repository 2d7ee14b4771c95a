from particle_simulator_tpu.physics.mie import (  # noqa: F401
    cursor_force,
    leapfrog_apply,
    mie_constant,
    mie_force,
    mie_force_repulsive,
    mie_potential,
    pair_force_accum,
    wall_force,
)
