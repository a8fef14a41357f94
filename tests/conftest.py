"""Test harness config: CPU backend with 8 virtual devices (simulated TPU
mesh, SURVEY.md section 4 item 4) and fp64 enabled so numpy oracles are exact.

Note: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var, so
the platform must be forced through jax.config after import. XLA_FLAGS must
still be set before the first backend is instantiated.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu"
assert jax.local_device_count() == 8
