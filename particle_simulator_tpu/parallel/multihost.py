"""Multi-host (pod / DCN) scaling scaffolding.

The reference is single-node (its only cluster artifact is a SLURM sbatch
script, cuda_simulator/job.sh). The TPU-native scale-out beyond one host uses
jax.distributed: every host runs the same engine binary, JAX stitches the
hosts' chips into one global device set, and the spatial domain decomposition
(parallel/domain.py) shards the bucket grid over the *global* mesh — halo
exchanges between co-located chips ride ICI, shard edges that cross hosts
ride DCN. Host 0 owns the editor TCP connection and the frame
gather/readback.

Single-host runs need none of this; ``init_distributed`` is a no-op when the
coordinator env vars are absent. This module is exercised in CI only at the
API level (single process) — multi-host hardware is not available in this
environment.
"""

from __future__ import annotations

import os

import jax

from particle_simulator_tpu.parallel.domain import make_mesh


def init_distributed() -> bool:
    """Initialize jax.distributed from standard env vars.

    Reads ``PS_TPU_COORDINATOR`` (host:port of process 0),
    ``PS_TPU_NUM_PROCESSES`` and ``PS_TPU_PROCESS_ID``; falls back to JAX's
    own autodetection (TPU pod metadata) when only ``PS_TPU_DISTRIBUTED=1``
    is set. Returns True if a multi-process runtime was initialized.
    """
    coord = os.environ.get("PS_TPU_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["PS_TPU_NUM_PROCESSES"]),
            process_id=int(os.environ["PS_TPU_PROCESS_ID"]),
        )
        return True
    if os.environ.get("PS_TPU_DISTRIBUTED") == "1":
        jax.distributed.initialize()  # pod autodetection
        return True
    return False


def global_mesh():
    """2D ("dy","dx") mesh over every chip of every host (jax.devices() is
    global after init_distributed)."""
    return make_mesh(jax.devices())


def is_frame_owner() -> bool:
    """Host 0 talks to the editor; other hosts only compute."""
    return jax.process_index() == 0
