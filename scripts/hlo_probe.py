"""Dump copy/DUS structure of the compiled sharded user-grid frame program."""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# honor JAX_PLATFORMS before any device probe (see move_decomp.py)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from particle_simulator_tpu.engine.simulator import GridConfig, SimParams
from particle_simulator_tpu.engine.state import empty_state
from particle_simulator_tpu.io.frame import default_metadata
from particle_simulator_tpu.parallel.domain import (
    make_mesh,
    make_sharded_frame_fn,
    pad_rows_for_mesh,
    shard_state,
)

cfg = GridConfig(10, 10, 16)  # the 1M user-scene grid: 1024x1024x16
mesh = make_mesh(n_devices=1)
fn = make_sharded_frame_fn(cfg, mesh, donate=False, kernel="pallas",
                           lane_chunks=8)
state, _ = pad_rows_for_mesh(empty_state(cfg.grid_shape), mesh)
state = shard_state(state, mesh)
params = SimParams.from_record(default_metadata())

comp = fn.lower(state, params).compile()
txt = comp.as_text()
print(f"HLO text: {len(txt)/1e6:.1f} MB", file=sys.stderr)

# big tensors only: anything >= 8M elements (a full 1024x1088x16 field is 17.8M)
BIG = re.compile(r"(\d+(?:,\d+)*)\]")


def nelem(shape_str):
    n = 1
    for d in shape_str.split(","):
        n *= int(d)
    return n


hits = {}
for line in txt.splitlines():
    s = line.strip()
    op = None
    for kind in ("copy(", "dynamic-update-slice", "concatenate(", "transpose(",
                 "dynamic-slice("):
        if kind in s and "fusion" not in s.split("=")[0]:
            op = kind
            break
    if not op:
        continue
    m = BIG.search(s)
    if not m:
        continue
    if nelem(m.group(1)) >= 4_000_000:
        key = (op, m.group(1))
        hits[key] = hits.get(key, 0) + 1

print("big copy/DUS/concat/transpose/dyn-slice ops (op, shape) -> count:")
for k, v in sorted(hits.items(), key=lambda kv: -kv[1]):
    print(f"  {k[0]:<22} [{k[1]}] x {v}")

ca = comp.cost_analysis()
if ca:
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    for key in ("flops", "bytes accessed"):
        if key in ca:
            print(f"cost_analysis {key}: {ca[key]:.3e}")
ma = comp.memory_analysis()
print("memory:", ma)
