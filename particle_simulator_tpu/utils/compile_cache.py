"""Persistent JAX compilation cache for the engine.

The reference pays zero compile latency (nvcc compiles ahead of time,
cuda_simulator/Makefile:9-17); our Mosaic kernels instead compile at first
dispatch — 45-90 s for the default grid over the dev tunnel and up to ~10
minutes for cap-16 grids. Enabling jax's persistent compilation cache makes
that a once-per-machine cost instead of once-per-daemon-restart: serialized
executables land in a cache dir keyed by program + compiler fingerprint, and
warm restarts deserialize in seconds.

Default location: $PS_TPU_COMPILE_CACHE, else ~/.cache/particle_simulator_tpu/
jax_cache. Pass an empty string to disable.
"""

from __future__ import annotations

import os


def default_cache_dir() -> str:
    return os.environ.get(
        "PS_TPU_COMPILE_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "particle_simulator_tpu", "jax_cache"
        ),
    )


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point jax at a persistent on-disk compilation cache. ``path=None`` uses
    the default location; ``path=""`` (or PS_TPU_COMPILE_CACHE="") disables.
    Returns the active cache dir, or None when disabled/unavailable."""
    if path is None:
        path = default_cache_dir()
    if not path:
        return None
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache even fast compiles: the tunnel RTT makes every retrace
        # round-trip expensive, and entries are small. The env var (jax's
        # own knob) wins when set.
        if "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS" not in os.environ:
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        # Caller-stack-stable cache keys. Pallas kernels serialize their
        # Mosaic module into the custom call's backend_config, and that
        # payload embeds MLIR locations built from the FULL Python call
        # stack at trace time. jax's cache key canonicalizes the top-level
        # stablehlo with strip-debuginfo but cannot reach into the payload
        # string — so the same frame program compiled from bench.py
        # (bench_user_scene) and from the daemon (main_loop) hashed to two
        # different keys and every entry point paid its own multi-minute
        # Mosaic compile (measured r4: the 1024x1024x16 program compiled at
        # 11:52 by bench missed at 12:43 in the daemon, 282 s of
        # first-frames; the two cached executables differed only in the
        # embedded source paths). Limiting locations to the innermost frame
        # (inside ops/, stable across callers) makes the payload — and the
        # key — caller-independent; verified byte-identical canonical IR
        # across distinct call stacks in tests/test_pallas.py.
        if "JAX_INCLUDE_FULL_TRACEBACKS_IN_LOCATIONS" not in os.environ:
            jax.config.update("jax_include_full_tracebacks_in_locations", False)
        return path
    except Exception:  # pragma: no cover - caching must never break startup
        return None
