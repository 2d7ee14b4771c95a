"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Real multi-chip TPU hardware is not available in CI; sharding/halo-exchange tests
use XLA's host-platform device virtualization instead.
"""

import os

# The session env presets JAX_PLATFORMS=axon (the remote TPU tunnel); tests must
# run on local CPU — override unconditionally unless the caller explicitly opts in.
os.environ["JAX_PLATFORMS"] = os.environ.get("PS_TPU_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon TPU plugin re-selects itself during jax import regardless of the env
# var; pin the platform through jax.config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
