"""The simulator core: device state management + frame scheduling.

This is the TPU-native replacement for the reference's ``Kernel`` buffer manager
and dispatch logic (cuda_simulator/src/kernel.cuh):

- The reference hand-rolls 3 device buffers, a CUDA stream, pinned host memory,
  and ping-pong scheduling. Under JAX none of that is manual: ``jit`` with donated
  arguments reuses device buffers in place, and **async dispatch** gives the
  compute/readback overlap (compute of frame k+1 overlaps host readback of frame
  k, the reference's double-buffer trick at cuda_simulator.cu:7-26) for free:
  ``frame_async()`` returns immediately after enqueueing the device work, and
  ``read_frame()`` only blocks on the *previous* state's transfer.

- Scene frames are prepared into the kernel layout on the host
  (``kernel_prepare_frame`` analog, kernel.cuh:200-250): CompactArray frames are
  compacted and capacity-padded; MatrixBuckets frames are bucketized by
  coordinate top-bits.

- Device selection (``Device`` metadata field) is honored per frame at runtime:
  GPU -> the accelerator (TPU), CPU_* -> the JAX CPU backend running the *same*
  step functions — preserving the reference's one-kernel-all-devices property
  (doc/project.typ:673-708). If no accelerator is present, GPU falls back to
  CPU_THREAD_POOL exactly like the reference (kernel.cuh:203-205).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Optional

import jax
import numpy as np

from particle_simulator_tpu.engine.state import (
    ParticleState,
    SimParams,
    state_from_numpy,
    state_to_numpy,
)
from particle_simulator_tpu.io.frame import (
    DataStructure,
    Device,
    Frame,
    default_metadata,
)
from particle_simulator_tpu.ops.readback import pow2_at_least
from particle_simulator_tpu.physics.bucket import (
    GridConfig,
    REFERENCE_GRID,
    bucketize_numpy,
    run_frame_bucket,
)
from particle_simulator_tpu.physics.step import allpairs_step, run_frame


class ReadbackTicket:
    """A started device->host readback (engine/daemon.py enqueues these).

    ``packed``/``scalars`` are the device-compacted outputs of
    ops/readback.dense_readback (None when the state was read the slow
    full-grid way); ``state`` is retained for the rare overflow retry."""

    __slots__ = ("state", "scalars", "packed", "k", "ncap")

    def __init__(self, state, scalars=None, packed=None, k=0, ncap=0):
        self.state = state
        self.scalars = scalars
        self.packed = packed
        self.k = k
        self.ncap = ncap


def _accelerator_device():
    for platform in ("tpu", "axon", "gpu"):
        try:
            devs = jax.devices(platform)
            if devs:
                return devs[0]
        except RuntimeError:
            continue
    return None


def _cpu_device():
    return jax.devices("cpu")[0] if jax.local_devices(backend="cpu") else jax.devices()[0]


def _sharded_step_kernel() -> str:
    """Local step kernel for the sharded (mesh) path: the Pallas VMEM kernel
    on real TPU, the portable jnp kernel elsewhere (the Pallas interpreter is
    far too slow to serve frames). Module-level so tests can monkeypatch the
    selection and drive the sharded progressive-compile machinery on CPU."""
    return "pallas" if jax.default_backend() == "tpu" else "jnp"


def _grid_for(
    live: np.ndarray,
    base: GridConfig,
    box_width: float,
    r0: float,
    box_height: float | None = None,
) -> GridConfig:
    """Density-aware grid selection.

    The reference compiles a fixed 64x64x16 grid and silently drops bucket
    overflow (kernel.cuh:14-20, kernel_bucket.cuh:30-31). Here the grid is
    chosen per scene: grow the bucket grid until the actual max per-bucket
    occupancy fits, but never shrink buckets below ~2 equilibrium distances
    (the 3x3 neighborhood must cover the interaction range — the reference's
    own bucket width is ~2 r0); past that floor, grow the bucket capacity
    instead. Pathologically overlapping scenes stop at cap 256 and drop, like
    the reference.
    """
    def max_occupancy(c: GridConfig) -> int:
        bx = (live["x"] >> np.uint32(32 - c.bx_log2)).astype(np.int64)
        by = (live["y"] >> np.uint32(32 - c.by_log2)).astype(np.int64)
        return int(np.bincount(by * c.bx + bx, minlength=c.buckets).max())

    cfg = base
    while cfg.capacity < len(live):
        cfg = GridConfig(cfg.bx_log2 + 1, cfg.by_log2 + 1, cfg.cap, cfg.move_every)
    if len(live) == 0:
        return cfg
    box_height = box_width if box_height is None else box_height
    while max_occupancy(cfg) > cfg.cap:
        # the smaller bucket side governs the 3x3 window's force coverage
        bucket_side = min(box_width / cfg.bx, box_height / cfg.by)
        if bucket_side / 2.0 >= 2.0 * r0:
            cfg = GridConfig(cfg.bx_log2 + 1, cfg.by_log2 + 1, cfg.cap, cfg.move_every)
        elif cfg.cap < 256:
            cfg = GridConfig(cfg.bx_log2, cfg.by_log2, cfg.cap * 2, cfg.move_every)
        else:
            break  # accept drops (reference semantics)

    # Capacity refinement: the step kernel's roll-pass count scales with the
    # bucket capacity (3*(4*cap-1) passes), so at equal slot count a finer
    # grid with half the cap does HALF the pair-enumeration work. Halve cap
    # while splitting the coarser axis, as long as the scene still fits (the
    # same occupancy <= cap criterion the coarse search uses) and the 3x3
    # window keeps covering the force range (bucket side >= 2 r0, like the
    # reference's own ~2-sigma buckets).
    while cfg.cap > 8:
        if box_width / cfg.bx >= box_height / cfg.by:  # split the wider side
            finer = GridConfig(cfg.bx_log2 + 1, cfg.by_log2, cfg.cap // 2, cfg.move_every)
            side = box_width / finer.bx
        else:
            finer = GridConfig(cfg.bx_log2, cfg.by_log2 + 1, cfg.cap // 2, cfg.move_every)
            side = box_height / finer.by
        if side < 2.0 * r0 or max_occupancy(finer) > finer.cap:
            break
        cfg = finer

    # In-place capacity refinement: when the bucket side is already at the
    # 2 r0 floor (no axis may split) but occupancy has >= 2x headroom after
    # halving, halve the capacity without splitting. Both the step cost AND
    # the Mosaic compile time scale with cap (the 64x64 reference grid:
    # 569 s to compile at cap 16 vs 54 s at cap 8 over the tunnel). The 2x
    # headroom keeps live clustering from out-dropping the reference's
    # fixed cap 16 — note the default 50x50 editor lattice (max occupancy 6)
    # deliberately FAILS this gate and stays on the drop-safe cap-16 grid;
    # the daemon's warm-start thread hides that grid's compile instead.
    while cfg.cap > 8 and 2 * max_occupancy(cfg) <= cfg.cap // 2:
        cfg = GridConfig(cfg.bx_log2, cfg.by_log2, cfg.cap // 2, cfg.move_every)
    return cfg


# NOT donated: the engine loop reads back frame k's state while frame k+1
# computes from it (the reference's compute/readback overlap,
# cuda_simulator.cu:7-26) — donating would delete the buffer being shipped.
@jax.jit
def _run_compact(state: ParticleState, p: SimParams) -> ParticleState:
    return run_frame(state, p, allpairs_step)


@jax.jit
def _run_bucket(state: ParticleState, p: SimParams) -> ParticleState:
    # this runner serves the CPU fallback devices — never unroll, even on a
    # TPU host (XLA-CPU compile time at large grids dwarfs loop overhead)
    return run_frame_bucket(state, p, unroll=False)


def _ext_io_mode() -> tuple[bool | None, bool]:
    """(ext_io, compact_tiles) for the lane-chunked runner, from PS_EXT_IO.
    Default is the CLASSIC per-step-ext path: the persistent pad-extended
    layout (+ live-tile-compacted schedule) proved bit-identical on chip but
    measured at or below classic in every same-window user-scene A/B
    (83.7/81.9/80.3 pre-strided-halo, 94.5/94.4/90.9 with it) — the dead-tile
    DMA it removes was already hidden under pair math, and the compacted
    schedule's scalar-prefetch bookkeeping costs what the skip saves. The
    machinery stays opt-in ("compact"/"nocompact") for sparser scenes and is
    hw-tested; `bench.py --user-scene --ext-io ...` is the A/B knob."""
    mode = os.environ.get("PS_EXT_IO", "off").lower()
    if mode in ("compact", "auto", "on", "1"):
        return True, True
    if mode == "nocompact":
        return True, False
    return False, True


@functools.partial(
    jax.jit,
    static_argnames=("block_rows", "lane_chunks", "ext_io", "compact_tiles"),
)
def _run_bucket_pallas(
    state: ParticleState, p: SimParams, block_rows: int | None = None,
    lane_chunks: int = 1, ext_io: bool | None = None, compact_tiles: bool = True,
) -> ParticleState:
    from particle_simulator_tpu.ops.bucket_pallas import run_frame_bucket_pallas

    return run_frame_bucket_pallas(
        state, p, block_rows=block_rows, lane_chunks=lane_chunks,
        ext_io=ext_io, compact_tiles=compact_tiles,
    )


def _lane_chunk_candidates(grid: GridConfig):
    """Lane-chunk splits that are VALID for this grid shape (largest first;
    independent of scene occupancy). A scene then lands on the first one
    whose occupancy leaves a skip margin, or on 1 — so the signatures a grid
    can realistically hit are {candidates[0], 1} (a failing occupancy test
    at the finest split fails a fortiori at coarser ones)."""
    L = grid.bx * grid.cap
    out = []
    for c in (8, 4, 2):
        w = L // c
        if grid.bx % c or w % 128 or w < 1024:
            continue
        out.append(c)
    return out


def _lane_chunks_for(occ: np.ndarray, grid: GridConfig) -> int:
    """Pick the step kernel's lane-chunk count from the loaded scene's
    spatial occupancy (ops/bucket_pallas.py ``lane_chunks``): the largest
    valid split whose live-tile fraction leaves a worthwhile skip margin.
    Wide grids whose live region doesn't span the box (editor-drawn scenes
    fill ~25% of the area) skip the pair math of empty column chunks;
    box-spanning scenes (the dense bench) stay on the unchunked kernel —
    chunking costs an extra grid copy per step and only pays when tiles die."""
    for c in _lane_chunk_candidates(grid):
        # 8-row tiles approximate the kernel's row blocks; a tile is live if
        # any bucket in its (8 rows x bx/c cols) range is occupied
        by8 = (grid.by + 7) // 8
        pad_rows = by8 * 8 - grid.by
        occ_p = np.pad(occ, ((0, pad_rows), (0, 0)))
        tiles = occ_p.reshape(by8, 8, c, grid.bx // c).max(axis=(1, 3)) > 0
        if tiles.mean() <= 0.75:
            return c
    return 1


@jax.jit
def _run_compact_pallas(state: ParticleState, p: SimParams) -> ParticleState:
    from particle_simulator_tpu.ops.allpairs_pallas import run_frame_allpairs_pallas

    return run_frame_allpairs_pallas(state, p)


class Simulator:
    """Holds the device-resident scene and advances it frame by frame.

    With a ``mesh`` (jax.sharding.Mesh), the MatrixBuckets path runs the
    spatial domain decomposition (parallel/domain.py): the bucket grid shards
    over the mesh, halos ride ICI, and ``read_frame``'s device_get gathers
    the global state to the host (the editor connection lives on host 0,
    SURVEY.md section 7). CompactArray stays single-device — all-pairs has no
    spatial locality to shard."""

    def __init__(self, grid: GridConfig = REFERENCE_GRID, mesh=None):
        self.base_grid = grid
        self.grid = grid
        self.mesh = mesh
        self._sharded_fns = {}
        self.accel = _accelerator_device()
        self.cpu = _cpu_device()
        self.state: Optional[ParticleState] = None
        # True when self.state is a jit OUTPUT (frame_async), False right
        # after a host upload (load_frame / re-layout). The daemon's readback
        # pipeline may only copy_to_host_async jit outputs — hinting a fresh
        # device_put array wedges the tunneled platform (engine/state.py NOTE)
        self.state_is_dispatched = False
        self.params: Optional[SimParams] = None
        self.meta_record: Optional[np.ndarray] = None
        self.data_structure = DataStructure.MATRIX_BUCKETS
        self.active_device = Device.GPU
        # Device-side readback compaction (ops/readback.py): kcap = the
        # occupied slot prefix the dense pack gathers from (sticky, power of
        # two; grows on overflow, shrinks on a long low streak); ncap = the
        # dense pack's output length (sticky, power of two >= the live
        # count, seeded at scene load — physics only ever DROPS particles,
        # so it can't overflow between loads; guarded anyway).
        # force_device_readback lets CPU tests drive the fast path (on a
        # real CPU backend the transfer it saves is free).
        self._readback_k = 8
        self._readback_ncap = 1
        self._readback_low_streak = 0
        # step-kernel lane chunking (ops/bucket_pallas.py): chosen per scene
        # load from spatial occupancy; 1 = the unchunked kernel
        self._lane_chunks = 1
        # Progressive kernel compile: a grid shape whose Pallas program has
        # never compiled on this machine costs minutes of Mosaic compile
        # (~570 s for a cap-16 grid over the dev tunnel; the persistent
        # cache only helps RE-runs). With this on, frame_async serves such
        # shapes through the XLA-jnp frame runner on the accelerator
        # (compiles in seconds, runs ~3x slower) while a daemon thread
        # compiles the Pallas program, then switches over — frames flow from
        # the first dispatch. The switch changes f32 summation order, the
        # same rounding-level divergence as the reference's own live device
        # switch (kernel.cuh:139-151). Off by default so bench/test runs
        # measure one kernel; the daemon turns it on (--progressive-compile).
        self.progressive_compile = False
        self._pallas_status: dict = {}  # key -> "compiling" | "ok" | "failed"
        # claims on _pallas_status keys are check-then-set from two threads
        # (frame_async's _pallas_warm on the main loop, warm_default_grid on
        # the warm-start thread); the lock makes the claim atomic so one
        # multi-minute Mosaic compile never runs twice on the single-tenant
        # tunnel
        import threading

        self._pallas_claim_lock = threading.Lock()
        # in-flight warm-ahead compile threads by _pallas_status key: pinned
        # frame_async joins these instead of tracing the same program twice
        self._warm_threads: dict = {}
        # which kernel produced the last frame_async dispatch — observability
        # for the daemon's meter line (throughput must be attributable):
        # "bucket-pallas" | "bucket-jnp-interim" (pallas still compiling) |
        # "bucket-jnp-pinned" (pallas compile failed) | "bucket-jnp-cpu" |
        # "sharded-<kernel>" | "allpairs-pallas" | "allpairs-jnp" | "host"
        self.active_kernel: str | None = None
        self.force_device_readback = False

    # -- scene / metadata ingest (kernel_prepare_frame analog) -----------------
    def _target_device(self, requested: Device):
        if requested == Device.GPU and self.accel is not None:
            return self.accel, Device.GPU
        # capability fallback: GPU requested but no accelerator (kernel.cuh:203-205)
        fallback = Device.CPU_THREAD_POOL if requested == Device.GPU else requested
        # CpuMainThread never touches an XLA client: the shared kernels run
        # eagerly via NumPy on the caller's thread (physics/host.py), so the
        # state stays host-resident — None device means "no device_put"
        if fallback == Device.CPU_MAIN_THREAD:
            return None, fallback
        return self.cpu, fallback

    def load_frame(self, frame: Frame) -> None:
        """Full scene reset from a non-empty editor frame."""
        meta = frame.metadata
        self.meta_record = meta.copy()
        self.data_structure = meta.data_structure
        requested_device = meta.device
        if jax.process_count() > 1 and (
            self.data_structure != DataStructure.MATRIX_BUCKETS
            or requested_device != Device.GPU
        ):
            # Multi-process runs shard the bucket grid over the global mesh;
            # CompactArray and single-host CPU devices have no global layout
            # (device_put to jax.devices()[0] would crash every non-zero
            # process). Every process sees the same frame bytes
            # (DistributedFrontend), so this coercion is identical everywhere.
            import sys as _sys

            print(
                "engine: multi-process run forces MatrixBuckets/accelerator "
                f"(requested {self.data_structure.name}/{requested_device.name})",
                file=_sys.stderr,
            )
            self.data_structure = DataStructure.MATRIX_BUCKETS
            requested_device = Device.GPU
            self.meta_record["data_structure"] = int(self.data_structure)
        jdev, self.active_device = self._target_device(requested_device)
        # echo the actually-active device in subsequent outbound metadata
        self.meta_record["device"] = int(self.active_device)

        parts = frame.particles
        live = parts[parts["ty"] >= 0]

        if self.data_structure == DataStructure.COMPACT_ARRAY:
            capacity = max(1024, 1 << int(np.ceil(np.log2(max(len(live), 1)))))
            layout = np.zeros(capacity, dtype=parts.dtype)
            layout["ty"] = -1
            layout[: len(live)] = live
            self.grid = self.base_grid
            state = state_from_numpy(layout, capacity)
            if jdev is None:  # CpuMainThread: host-resident NumPy state
                from particle_simulator_tpu.physics.host import to_host_state

                self.state = to_host_state(state)
            else:
                self.state = jax.device_put(state, jdev)
        else:
            self.grid = _grid_for(
                live, self.base_grid, meta.box_width,
                meta.species(0).force0_r(), box_height=meta.box_height,
            )
            if self.mesh is not None:
                # grow bx until it tiles the mesh's (power-of-two) x axis;
                # the y axis is handled by tombstone row padding below
                nx = self.mesh.devices.shape[1]
                while self.grid.bx % nx:
                    self.grid = GridConfig(
                        self.grid.bx_log2 + 1, self.grid.by_log2 + 1,
                        self.grid.cap, self.grid.move_every,
                    )
            # Occupancy from bucket ids alone (np.bincount), BEFORE the full
            # bucketize: min(count, cap) equals the per-bucket placed count
            # (bucketize fills slots ascending and drops past cap), so the
            # readback seeds and lane-chunk choice below are byte-identical
            # to deriving them from the layout — and once they're known the
            # scene's full jit signature is known, so the Pallas compile /
            # executable-deserialize can start on a thread (_warm_ahead)
            # while this thread still bucketizes and uploads (VERDICT r4
            # item 6: the pinned-mode warm-restart floor ran those phases
            # back-to-back).
            g = self.grid
            bxi = (live["x"] >> np.uint32(32 - g.bx_log2)).astype(np.int64)
            byi = (live["y"] >> np.uint32(32 - g.by_log2)).astype(np.int64)
            counts = np.bincount(bxi + byi * g.bx, minlength=g.by * g.bx)
            occ = np.minimum(counts, g.cap).reshape(g.by, g.bx)
            self._readback_k = pow2_at_least(int(occ.max(initial=0)))
            self._readback_ncap = pow2_at_least(len(live))
            self._readback_low_streak = 0
            # lane-chunked step kernel for spatially sparse scenes (the
            # column analog of the dead-row-block skip); static per load
            self._lane_chunks = _lane_chunks_for(occ, g)
            self._warm_ahead()
            self._persist_scene_signature()
            _t0 = time.perf_counter()
            layout = bucketize_numpy(live, self.grid)
            self.last_bucketize_s = time.perf_counter() - _t0
            state = state_from_numpy(layout, self.grid.capacity).reshape(self.grid.grid_shape)
            if self.mesh is not None:
                from particle_simulator_tpu.parallel.domain import (
                    pad_rows_for_mesh,
                    shard_state,
                )

                state, _ = pad_rows_for_mesh(state, self.mesh)
                self.state = shard_state(state, self.mesh)
            elif jdev is None:  # CpuMainThread: host-resident NumPy state
                from particle_simulator_tpu.physics.host import to_host_state

                self.state = to_host_state(state)
            else:
                self.state = jax.device_put(state, jdev)
        self.state_is_dispatched = False  # fresh host upload, not a jit output
        self.params = SimParams.from_record(self.meta_record)
        import sys

        desc = (
            # lane_chunks names the jit/compile-cache signature the scene
            # selects — scenes on the SAME grid can still pay separate
            # Mosaic compiles when their occupancy picks different chunking
            f"grid {self.grid.bx}x{self.grid.by}x{self.grid.cap}"
            f" lane_chunks {self._lane_chunks}"
            if self.data_structure == DataStructure.MATRIX_BUCKETS
            else f"compact capacity {self.state.ty.size}"
        )
        print(
            f"engine: scene loaded ({len(live)} live, {desc}, "
            f"{self.active_device.display_name}, bucketize "
            f"{getattr(self, 'last_bucketize_s', 0.0):.2f}s); first compile "
            "of a new shape may take a while",
            file=sys.stderr,
        )

    def update_metadata(self, frame: Frame) -> None:
        """Metadata-only frame (particle_count == 0): live reconfigure
        (cuda_simulator.cu:12-14, where write_metadata copies the FULL incoming
        metadata and run_async dispatches on it). Like the reference, a
        ``data_structure`` or ``device`` change takes effect live: the current
        particles are read back, re-laid-out into the new structure on the new
        device, and the run continues — no scene reset required. Pure parameter
        tweaks never touch particle state (and never recompile: the launch-width
        field ``gpu_threads_per_block_log2`` is a static kernel arg here, so
        live edits of it are deferred to the next re-layout/scene load to keep
        the zero-recompile invariant)."""
        if self.meta_record is None:
            return
        new = frame.metadata.copy()
        # Out-of-range enum bytes (buggy client / wire corruption past the
        # signature check) must not kill the engine loop: ignore them and
        # keep the running values, like the pre-switch behavior.
        try:
            requested_dev = Device(int(new["device"]))
            requested_ds = DataStructure(int(new["data_structure"]))
        except ValueError:
            requested_dev = self.active_device
            requested_ds = self.data_structure
            new["device"] = int(self.meta_record["device"])
            new["data_structure"] = int(self.data_structure)
        if jax.process_count() > 1:
            # multi-process: only the sharded MatrixBuckets/accelerator layout
            # exists (see load_frame) — ignore live switch requests
            requested_dev = self.active_device
            requested_ds = self.data_structure
        _, effective_dev = self._target_device(requested_dev)
        if requested_ds != self.data_structure or effective_dev != self.active_device:
            # Live structure/device switch: re-layout the running scene.
            live = self._state_numpy(self.state)
            relayout = Frame.from_particles(new, live[live["ty"] >= 0])
            self.load_frame(relayout)
            return
        # keep active layout/device fields consistent with what's actually running
        new["data_structure"] = int(self.data_structure)
        new["device"] = int(self.meta_record["device"])
        if not self.progressive_compile:
            # launch width is a STATIC kernel arg here: without the
            # progressive machinery a live edit would stall the loop on a
            # fresh Mosaic compile, so it defers to the next re-layout
            # (the zero-recompile invariant bench/test runs rely on)
            new["gpu_threads_per_block_log2"] = int(
                self.meta_record["gpu_threads_per_block_log2"]
            )
        # with progressive compile ON the edit applies LIVE, like the
        # reference's per-dispatch launch config (kernel_bucket.cuh:118-121):
        # the new block_rows is a cold signature — frames flow through the
        # interim jnp runner while it compiles, then switch (_pallas_warm)
        self.meta_record = new
        self.params = SimParams.from_record(self.meta_record)

    # -- frame stepping ---------------------------------------------------------
    def frame_async(self) -> None:
        """Dispatch one frame (steps_per_frame physics steps) on device and
        return immediately (JAX async dispatch = the reference's run_async)."""
        if self.state is None:
            return
        if self.active_device == Device.CPU_MAIN_THREAD and self.mesh is None:
            # genuinely single-threaded: the shared kernels execute eagerly
            # via NumPy on THIS thread (physics/host.py) — the analog of the
            # reference's sequential for-loop (kernel_bucket.cuh:133-141).
            # Synchronous by nature, like the reference's main-thread path.
            from particle_simulator_tpu.physics import host

            if self.data_structure == DataStructure.COMPACT_ARRAY:
                self.state = host.host_run_frame_compact(self.state, self.params)
            else:
                self.state = host.host_run_frame_bucket(
                    self.state, self.params, move_every=self.grid.move_every
                )
            self.active_kernel = "host"
            self.state_is_dispatched = False  # nothing to async-copy
            return
        if self.data_structure == DataStructure.COMPACT_ARRAY:
            if self.active_device == Device.GPU:
                self.state = _run_compact_pallas(self.state, self.params)
                self.active_kernel = "allpairs-pallas"
            else:
                self.state = _run_compact(self.state, self.params)
                self.active_kernel = "allpairs-jnp"
        elif self.mesh is not None:
            # multi-chip spatial domain decomposition (parallel/domain.py)
            kernel = _sharded_step_kernel()
            # the pallas local step honors the scene's lane-chunk column-skip
            # choice (falls back per-mesh when the local width can't chunk)
            chunks = self._lane_chunks if kernel == "pallas" else 1
            if (
                kernel == "pallas"
                and self.progressive_compile
                and not self._sharded_warm(chunks)
            ):
                # cold sharded Mosaic program: serve the same sharded step
                # math through the jnp local kernel (XLA compiles in
                # seconds) while the background thread compiles the Pallas
                # program — frames flow from the first dispatch, exactly
                # like the single-chip interim runner below
                self.state = self._sharded_fn("jnp", 1)(self.state, self.params)
                status = self._pallas_status.get(
                    ("sharded", self.grid, self.mesh, chunks)
                )
                self.active_kernel = (
                    "sharded-jnp-pinned" if status == "failed"
                    else "sharded-jnp-interim"
                )
            else:
                if kernel == "pallas":
                    self._join_warm(("sharded", self.grid, self.mesh, chunks))
                self.state = self._sharded_fn(kernel, chunks)(self.state, self.params)
                self.active_kernel = f"sharded-{kernel}"
        elif self.active_device == Device.GPU:
            # accelerator: the Pallas VMEM-resident kernel (ops/bucket_pallas.py).
            # gpu_threads_per_block_log2 (the reference's runtime launch-width
            # tunable, kernel_bucket.cuh:118-121) maps to kernel rows/block:
            # 2^7 = 128 threads <-> 8 bucket rows. Changing it recompiles once.
            k = int(self.meta_record["gpu_threads_per_block_log2"])
            block_rows = max(1, 1 << max(0, k - 4))
            if self.progressive_compile and not self._pallas_warm(block_rows):
                # cold shape: same step math via the XLA-jnp runner while the
                # Pallas program compiles in the background (see __init__)
                self.state = _run_bucket(self.state, self.params)
                status = self._pallas_status.get(
                    (self.grid, block_rows, self._lane_chunks)
                )
                self.active_kernel = (
                    "bucket-jnp-pinned" if status == "failed"
                    else "bucket-jnp-interim"
                )
            else:
                self._join_warm((self.grid, block_rows, self._lane_chunks))
                ext_io, compact = _ext_io_mode()
                self.state = _run_bucket_pallas(
                    self.state, self.params, block_rows=block_rows,
                    lane_chunks=self._lane_chunks,
                    ext_io=ext_io, compact_tiles=compact,
                )
                self.active_kernel = "bucket-pallas"
        else:
            self.state = _run_bucket(self.state, self.params)
            self.active_kernel = "bucket-jnp-cpu"
        self.state_is_dispatched = True

    def sync(self) -> None:
        if self.state is not None:
            jax.block_until_ready(self.state)

    def _sharded_fn(self, kernel: str, chunks: int, grid: GridConfig | None = None):
        """The cached jitted sharded frame runner for (grid, mesh, kernel,
        lane_chunks); ``grid`` defaults to the current one (background
        compile threads pass their claim key's grid explicitly — a scene
        re-layout mid-compile must not retarget them). Thread-safe enough
        as-is: dict get/set under the GIL, and a racing duplicate build just
        wastes one trace."""
        grid = self.grid if grid is None else grid
        key = (grid, self.mesh, kernel, chunks)
        fn = self._sharded_fns.get(key)
        if fn is None:
            from particle_simulator_tpu.parallel.domain import make_sharded_frame_fn

            fn = make_sharded_frame_fn(grid, self.mesh, donate=False,
                                       kernel=kernel, lane_chunks=chunks)
            self._sharded_fns[key] = fn
        return fn

    # -- progressive Pallas compile (see __init__ for the rationale) -----------
    def _warm_ahead(self) -> None:
        """Start compiling THIS scene's frame program on a background thread
        while load_frame is still bucketizing + uploading it (both
        multi-second at 1M over a remote link). Progressive mode already
        hides cold compiles behind the interim jnp runner; this also removes
        the serialization in PINNED mode, where the first dispatch otherwise
        pays compile/executable-deserialize strictly AFTER scene-load
        (BASELINE.md: the 102.5 s warm-restart floor). frame_async joins an
        in-flight warm for its key rather than duplicating the trace.

        Default-on only where it helps (a real accelerator backend); CPU CI
        would spawn interpret-mode compile threads that race monkeypatched
        kernels. PS_WARM_AHEAD=0/1 overrides."""
        import threading

        on = os.environ.get("PS_WARM_AHEAD")
        if on is None:
            on = "1" if jax.default_backend() == "tpu" else "0"
        if on != "1" or self.data_structure != DataStructure.MATRIX_BUCKETS:
            return
        params = SimParams.from_record(self.meta_record)
        if self.mesh is not None:
            if _sharded_step_kernel() != "pallas":
                return
            key = ("sharded", self.grid, self.mesh, self._lane_chunks)
            with self._pallas_claim_lock:
                if key in self._pallas_status:
                    return
                self._pallas_status[key] = "compiling"
            t = threading.Thread(
                target=self._compile_sharded, args=(key, params),
                daemon=True, name="sharded-pallas-warm-ahead",
            )
        elif self.accel is not None and self.active_device == Device.GPU:
            k = int(self.meta_record["gpu_threads_per_block_log2"])
            block_rows = max(1, 1 << max(0, k - 4))
            key = (self.grid, block_rows, self._lane_chunks)
            with self._pallas_claim_lock:
                if key in self._pallas_status:
                    return
                self._pallas_status[key] = "compiling"
            t = threading.Thread(
                target=self._compile_pallas, args=(key, params),
                daemon=True, name="pallas-warm-ahead",
            )
        else:
            return
        self._warm_threads[key] = t
        t.start()

    def _join_warm(self, key) -> None:
        """Block until an in-flight warm compile for ``key`` (if any)
        finishes — the pinned path's first dispatch must not trace the same
        program on two threads at once. Joins the warm-ahead thread when one
        is registered; otherwise, if another warmer holds the claim
        (warm_last_scene / warm_default_grid on the daemon's startup
        threads), waits on the status instead. The logged wait is the
        compile time NOT hidden behind scene-load / startup idle (the
        warm-restart split BASELINE tracks)."""
        t = self._warm_threads.pop(key, None)
        if t is None and self._pallas_status.get(key) != "compiling":
            return
        _t0 = time.perf_counter()
        if t is not None:
            t.join()
        else:
            while self._pallas_status.get(key) == "compiling":
                time.sleep(0.05)
        waited = time.perf_counter() - _t0
        if waited > 0.1:
            import sys

            print(
                f"engine: first dispatch waited {waited:.1f}s for the "
                "in-flight warm compile (remainder not hidden by scene load)",
                file=sys.stderr,
            )

    def _sharded_warm(self, chunks: int) -> bool:
        """Sharded-path analog of ``_pallas_warm``: True once the sharded
        Pallas frame program for (grid, mesh, lane_chunks) is compiled. The
        first call for a cold signature spawns the compile thread and
        returns False — frame_async serves the sharded-jnp runner meanwhile;
        a failed compile pins the signature to it."""
        key = ("sharded", self.grid, self.mesh, chunks)
        with self._pallas_claim_lock:
            status = self._pallas_status.get(key)
            if status is None:
                self._pallas_status[key] = "compiling"
        if status == "ok":
            return True
        if status is None:
            import threading

            threading.Thread(
                target=self._compile_sharded,
                args=(key, self.params),
                daemon=True,
                name="sharded-pallas-compile",
            ).start()
        return False

    def _compile_sharded(self, key, params: SimParams) -> None:
        """Background thread: compile (and once-execute) the sharded Pallas
        frame program on a tombstone-only dummy of the PADDED global shape —
        mesh row padding changes the jit signature, so the dummy must go
        through the same pad_rows_for_mesh + shard_state as load_frame."""
        _, grid, mesh, chunks = key
        try:
            from particle_simulator_tpu.engine.state import empty_state
            from particle_simulator_tpu.parallel.domain import (
                pad_rows_for_mesh,
                shard_state,
            )

            _t0 = time.perf_counter()
            dummy, _ = pad_rows_for_mesh(empty_state(grid.grid_shape), mesh)
            dummy = shard_state(dummy, mesh)
            out = self._sharded_fn("pallas", chunks, grid=grid)(dummy, params)
            jax.block_until_ready(out)
            self._pallas_status[key] = "ok"
            import sys

            print(
                f"engine: sharded pallas program ready for grid {grid.bx}x"
                f"{grid.by}x{grid.cap} over mesh {tuple(mesh.devices.shape)}"
                f" in {time.perf_counter() - _t0:.1f}s"
                " — switching off the interim jnp runner",
                file=sys.stderr,
            )
        except Exception as e:  # pragma: no cover - depends on device limits
            self._pallas_status[key] = "failed"
            import sys

            print(
                f"engine: sharded pallas compile failed for grid {grid.bx}x"
                f"{grid.by}x{grid.cap} ({type(e).__name__}); staying on the "
                "sharded-jnp runner",
                file=sys.stderr,
            )

    def _pallas_warm(self, block_rows: int) -> bool:
        """True once the Pallas frame program for the CURRENT (grid,
        block_rows, lane_chunks) signature is compiled and safe to call
        without stalling the loop. First call for a cold signature spawns
        the compile thread and returns False; a failed compile (e.g. VMEM
        overflow at an extreme grid) pins the signature to the jnp runner."""
        key = (self.grid, block_rows, self._lane_chunks)
        with self._pallas_claim_lock:
            status = self._pallas_status.get(key)
            if status is None:
                self._pallas_status[key] = "compiling"
        if status == "ok":
            return True
        if status is None:
            import threading

            threading.Thread(
                target=self._compile_pallas,
                args=(key, self.params),
                daemon=True,
                name="pallas-compile",
            ).start()
        return False

    def _compile_pallas(self, key, params: SimParams) -> None:
        """Background thread: compile (and once-execute, to also warm the
        XLA executable cache) the Pallas frame program on a tombstone-only
        dummy state of the target shape. jit compilation is thread-safe and
        the dummy dispatch just interleaves with the main loop's work on the
        same client (the warm-start thread uses the same pattern)."""
        grid, block_rows, lane_chunks = key
        try:
            from particle_simulator_tpu.engine.state import empty_state

            _t0 = time.perf_counter()
            dummy = jax.device_put(empty_state(grid.grid_shape), self.accel)
            ext_io, compact = _ext_io_mode()
            out = _run_bucket_pallas(
                dummy, params, block_rows=block_rows, lane_chunks=lane_chunks,
                ext_io=ext_io, compact_tiles=compact,
            )
            jax.block_until_ready(out)
            self._pallas_status[key] = "ok"
            import sys

            print(
                f"engine: pallas kernel ready for grid {grid.bx}x{grid.by}x"
                f"{grid.cap} in {time.perf_counter() - _t0:.1f}s"
                " — switching off the interim jnp runner",
                file=sys.stderr,
            )
        except Exception as e:  # pragma: no cover - depends on device limits
            self._pallas_status[key] = "failed"
            import sys

            print(
                f"engine: pallas compile failed for grid {grid.bx}x{grid.by}x"
                f"{grid.cap} ({type(e).__name__}); staying on the jnp runner",
                file=sys.stderr,
            )

    def warm_default_grid(self) -> None:
        """Pre-compile the frame runner for the DEFAULT editor scene's grid so
        the out-of-box first scene hits a warm jit cache — the first Mosaic
        compile costs minutes over a remote link. The grid is derived by
        running the ACTUAL default 50x50 lattice through _grid_for (it
        resolves to 64x64x16: max occupancy 6 keeps the in-place cap
        refinement gated off), so the warmed jit signature matches the real
        first-scene call exactly. Safe to run concurrently with the main
        loop (jit compilation is thread-safe); a no-op off the accelerator
        or on any failure (warming is best-effort)."""
        try:
            if self.accel is None:
                return
            from particle_simulator_tpu.engine.state import empty_state
            from particle_simulator_tpu.io.frame import Frame, default_metadata
            from particle_simulator_tpu.io.presets import ParticleLattice

            frame = Frame.new()
            meta = frame.metadata
            lat = ParticleLattice((50, 50), distance_factor=1.1)
            lat.hex_square(
                frame, (meta.box_width / 2, meta.box_height / 2),
                rng=np.random.default_rng(0),
            )
            parts = frame.particles
            cfg = _grid_for(
                parts[parts["ty"] >= 0], self.base_grid, meta.box_width,
                meta.species(0).force0_r(), box_height=meta.box_height,
            )
            rec = default_metadata()
            params = SimParams.from_record(rec)
            if self.mesh is not None:
                # sharded daemon (--devices N): the single-chip program below
                # would never run — warm the SHARDED Pallas program for the
                # default grid instead (grown to tile the mesh's x axis,
                # exactly like load_frame will)
                nx = self.mesh.devices.shape[1]
                while cfg.bx % nx:
                    cfg = GridConfig(
                        cfg.bx_log2 + 1, cfg.by_log2 + 1, cfg.cap,
                        cfg.move_every,
                    )
                key = ("sharded", cfg, self.mesh, 1)
                with self._pallas_claim_lock:
                    if key in self._pallas_status:
                        return
                    self._pallas_status[key] = "compiling"
                try:
                    from particle_simulator_tpu.parallel.domain import (
                        pad_rows_for_mesh,
                        shard_state,
                    )

                    dummy, _ = pad_rows_for_mesh(
                        empty_state(cfg.grid_shape), self.mesh
                    )
                    dummy = shard_state(dummy, self.mesh)
                    out = self._sharded_fn("pallas", 1, grid=cfg)(dummy, params)
                    jax.block_until_ready(out)
                    self._pallas_status[key] = "ok"
                except Exception:
                    # best-effort: clear the claim so a real scene's
                    # _sharded_warm can run (and report) its own compile
                    self._pallas_status.pop(key, None)
                    raise
                return
            # derive block_rows exactly like frame_async so the warmed jit
            # signature tracks any future default-metadata change
            k = int(rec["gpu_threads_per_block_log2"])
            block_rows = max(1, 1 << max(0, k - 4))
            # register with the progressive-compile gate UP FRONT: a default
            # scene arriving during this (multi-minute) compile must wait on
            # it through the interim jnp runner, not spawn a duplicate
            # compile of the identical program on a second thread
            key = (cfg, block_rows, 1)
            with self._pallas_claim_lock:
                if key in self._pallas_status:
                    return  # already compiled / being compiled by frame_async
                self._pallas_status[key] = "compiling"
            try:
                dummy = jax.device_put(empty_state(cfg.grid_shape), self.accel)
                out = _run_bucket_pallas(dummy, params, block_rows=block_rows)
                jax.block_until_ready(out)
                # the first default-scene frame now goes straight to the
                # Pallas kernel instead of detouring through the jnp runner
                self._pallas_status[key] = "ok"
            except Exception:
                # warming is best-effort: clear the claim so a real scene's
                # _pallas_warm can run (and report) its own compile
                self._pallas_status.pop(key, None)
                raise
        except Exception:  # pragma: no cover - warming must never hurt
            pass

    def warm_sibling_lane_chunks(self) -> int:
        """Compile the OTHER lane-chunk signature(s) the current grid can hit.

        A grid's realistic signatures are {largest valid split, 1}
        (_lane_chunk_candidates): which one a scene lands on depends on its
        occupancy, so 'warm' compile caches used to be per-signature, not
        per-grid — a webview-drawn lattice could pay a fresh multi-minute
        Mosaic compile on a machine bench.py had just warmed (r3: 378 s of
        first-frames, BASELINE.md config 5). Warming the sibling folds the
        cache back to per-grid. Synchronous; call from a background thread
        (the _pallas_status claims make concurrent callers safe) or after a
        measurement window. Returns the number of signatures compiled."""
        if self.accel is None or self.meta_record is None:
            return 0
        if self.data_structure != DataStructure.MATRIX_BUCKETS:
            return 0
        cands = _lane_chunk_candidates(self.grid)
        targets = {cands[0] if cands else 1, 1} - {self._lane_chunks}
        compiled = 0
        if self.mesh is not None:
            # sharded signatures key on (grid, mesh, lane_chunks); infeasible
            # chunk counts fall back inside the traced program, so warming
            # the requested value is always the right key
            for c in sorted(targets):
                key = ("sharded", self.grid, self.mesh, c)
                with self._pallas_claim_lock:
                    if key in self._pallas_status:
                        continue  # compiled / compiling elsewhere
                    self._pallas_status[key] = "compiling"
                self._compile_sharded(key, self.params)
                compiled += 1
            return compiled
        k = int(self.meta_record["gpu_threads_per_block_log2"])
        block_rows = max(1, 1 << max(0, k - 4))
        for c in sorted(targets):
            key = (self.grid, block_rows, c)
            with self._pallas_claim_lock:
                if key in self._pallas_status:
                    continue  # compiled / compiling elsewhere
                self._pallas_status[key] = "compiling"
            self._compile_pallas(key, self.params)
            compiled += 1
        return compiled

    def _persist_scene_signature(self) -> None:
        """Record the loaded scene's jit signature (grid + lane_chunks +
        block_rows + mesh shape) next to the persistent compile cache, so the
        NEXT daemon start can warm it before the editor even sends the scene
        (``warm_last_scene``). A warm RESTART of the same workload then pays
        the executable-deserialize during startup/handshake instead of inside
        first-frames — the measured r4 floor ran it strictly after scene
        arrival (BASELINE.md: 102.5 s first-frames, VERDICT r4 item 6).
        Best-effort: any failure is ignored."""
        try:
            import json

            from particle_simulator_tpu.utils.compile_cache import (
                default_cache_dir,
            )

            path = os.path.join(
                os.path.dirname(default_cache_dir()), "last_scene.json"
            )
            os.makedirs(os.path.dirname(path), exist_ok=True)
            g = self.grid
            sig = {
                "bx_log2": g.bx_log2, "by_log2": g.by_log2, "cap": g.cap,
                "move_every": g.move_every,
                "lane_chunks": self._lane_chunks,
                "gpu_threads_per_block_log2": int(
                    self.meta_record["gpu_threads_per_block_log2"]
                ),
                "mesh": (
                    list(self.mesh.devices.shape)
                    if self.mesh is not None else None
                ),
            }
            tmp = f"{path}.{os.getpid()}.tmp"
            with open(tmp, "w") as f:
                json.dump(sig, f)
            os.replace(tmp, path)
        except Exception:  # pragma: no cover - persistence must never hurt
            pass

    def warm_last_scene(self) -> None:
        """Best-effort pre-compile of the scene signature the PREVIOUS daemon
        run served (persisted by ``_persist_scene_signature``). Runs on the
        daemon's warm-start thread alongside ``warm_default_grid``; the
        ``_pallas_status`` claims keep the two (and any real scene arriving
        mid-compile) from duplicating work. Signatures from a different mesh
        topology are skipped — they would compile a program this run can
        never dispatch."""
        try:
            if self.accel is None:
                return
            import json

            from particle_simulator_tpu.utils.compile_cache import (
                default_cache_dir,
            )

            path = os.path.join(
                os.path.dirname(default_cache_dir()), "last_scene.json"
            )
            with open(path) as f:
                sig = json.load(f)
            mesh_shape = sig.get("mesh")
            if (mesh_shape is None) != (self.mesh is None):
                return
            if self.mesh is not None and list(self.mesh.devices.shape) != mesh_shape:
                return
            cfg = GridConfig(
                int(sig["bx_log2"]), int(sig["by_log2"]), int(sig["cap"]),
                int(sig["move_every"]),
            )
            chunks = int(sig["lane_chunks"])
            # params values don't affect the jit signature (SimParams enters
            # as arrays — the zero-recompile invariant), so defaults warm the
            # exact executable the restarted scene will hit
            params = SimParams.from_record(default_metadata())
            if self.mesh is not None:
                key = ("sharded", cfg, self.mesh, chunks)
                with self._pallas_claim_lock:
                    if key in self._pallas_status:
                        return
                    self._pallas_status[key] = "compiling"
                self._compile_sharded(key, params)
                return
            k = int(sig.get("gpu_threads_per_block_log2", 8))
            block_rows = max(1, 1 << max(0, k - 4))
            key = (cfg, block_rows, chunks)
            with self._pallas_claim_lock:
                if key in self._pallas_status:
                    return
                self._pallas_status[key] = "compiling"
            self._compile_pallas(key, params)
        except FileNotFoundError:
            pass
        except Exception:  # pragma: no cover - warming must never hurt
            pass

    # -- readback ----------------------------------------------------------------
    @staticmethod
    def _state_numpy(state: ParticleState) -> np.ndarray:
        """state_to_numpy that also handles multi-process global arrays:
        shards owned by other hosts are gathered (DCN allgather) first —
        every process ends up with the full global state, and process 0
        ships it to the editor (parallel/multihost.py)."""
        x = state.x
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from particle_simulator_tpu.parallel.multihost import gather_global

            state = gather_global(state)
        return state_to_numpy(state)

    def _fast_readback_ok(self, state) -> bool:
        """Bucket-grid states on an accelerator qualify for device-side
        compaction (ops/readback.py); everything else (CompactArray 1D
        layouts, host-resident CpuMainThread states, multi-HOST mesh states,
        plain-CPU states where the transfer is free) reads the full grid.

        Single-host mesh states DO qualify: the sharded frame fn returns the
        unpadded global (BY, BX, CAP) grid sharded P("dy","dx",None), on
        which dense_readback's cumsum/gather algebra is mesh-agnostic — GSPMD
        inserts the (ICI-resident) collectives, and the host link then
        carries the ~20 B/particle pack instead of the full slot grid
        (25.2 s -> dense-pack time for one 1M-user-grid read_frame over the
        tunnel, BASELINE.md r4). Multi-host stays on the gather_global path:
        the pack output would not be fully addressable on process 0."""
        if not isinstance(state, ParticleState):
            return False
        x = state.x
        if not isinstance(x, jax.Array) or x.ndim != 3:
            return False
        try:
            if not x.is_fully_addressable:
                return False
            if self.force_device_readback:
                return True
            return next(iter(x.devices())).platform != "cpu"
        except Exception:
            return False

    def start_readback(self, state: Optional[ParticleState] = None,
                       hint: bool = False) -> ReadbackTicket:
        """Kick off the device->host readback of ``state`` (default current)
        and return a ticket ``read_frame`` consumes. On the accelerator bucket
        path this dispatches the dense-pack readback (ops/readback.py):
        every live particle gathered into exactly-sized output arrays, so
        the host link carries ~the wire frame's own bytes (the reference
        reads exactly ``len`` particles too, kernel.cuh:116-165). ``hint``
        requests copy_to_host_async overlap — essential on the tunneled
        platform, where a synchronous first fetch of a fresh buffer runs
        ~25-85x under the async-drain rate (measured) — always safe on the
        fast path (pack outputs are jit outputs), and forwarded to the raw
        state fields on the slow path only when the caller vouches they are
        jit outputs (the tunnel-wedge rule, engine/daemon.py enqueue)."""
        state = self.state if state is None else state
        if not self._fast_readback_ok(state):
            if hint:
                for a in state:
                    if hasattr(a, "copy_to_host_async") and a.is_fully_addressable:
                        a.copy_to_host_async()
            return ReadbackTicket(state)
        from particle_simulator_tpu.ops.readback import dense_readback

        k = min(self._readback_k, state.x.shape[-1])
        ncap = self._readback_ncap
        scalars, packed = dense_readback(state, k, ncap)
        for a in (scalars, *packed):
            if hasattr(a, "copy_to_host_async"):
                a.copy_to_host_async()
        return ReadbackTicket(state, scalars, packed, k, ncap)

    def read_frame(self, state=None, meta: Optional[np.ndarray] = None) -> Frame:
        """Device -> host readback (default: current state), compacted and
        wrapped in a wire frame (frontend.write semantics: tombstones removed
        before shipping, frontend.hpp:50-56). Accepts a ``ReadbackTicket``
        from ``start_readback`` (the daemon's readback pipeline), a raw
        state, or None. ``meta`` overrides the metadata record stamped on the
        frame (captured at enqueue time so queued frames keep the params they
        were computed under)."""
        if not isinstance(state, ReadbackTicket):
            state = self.start_readback(state)
        rec = self.meta_record if meta is None else meta
        if state.packed is None:
            parts = self._state_numpy(state.state)
            # the boolean-mask gather is a fresh array — hand it over
            return Frame.from_particles(rec, parts[parts["ty"] >= 0], owned=True)

        from particle_simulator_tpu.ops.readback import (
            dense_readback,
            dense_to_particles,
            pow2_at_least,
        )

        scalars, packed, k, ncap = state.scalars, state.packed, state.k, state.ncap
        mx, total = (int(v) for v in np.asarray(jax.device_get(scalars)))
        if mx > k or total > ncap:
            # a bucket outgrew the occupied prefix (or — defensively; physics
            # only drops — the pack length): widen the sticky sizes and redo
            self._readback_k = k = min(pow2_at_least(mx), state.state.x.shape[-1])
            self._readback_ncap = ncap = max(ncap, pow2_at_least(total))
            self._readback_low_streak = 0
            scalars, packed = dense_readback(state.state, k, ncap)
            mx, total = (int(v) for v in np.asarray(jax.device_get(scalars)))
        elif mx <= k // 2 and k > 1:
            self._readback_low_streak += 1
            if self._readback_low_streak >= 256:
                self._readback_k = max(1, k // 2)
                self._readback_low_streak = 0
        else:
            self._readback_low_streak = 0
        fields = jax.device_get(tuple(packed))
        live = dense_to_particles(total, ParticleState(*fields))
        # dense_to_particles builds a fresh contiguous array — hand it over
        # instead of paying a second ~60 ms copy at 1M
        return Frame.from_particles(rec, live, owned=True)

    @property
    def live_count(self) -> int:
        if self.state is None:
            return 0
        return int(np.count_nonzero(self._state_numpy(self.state)["ty"] >= 0))
