"""Test harness: hermetic CPU backend with a virtual 8-device mesh.

Multi-device sharding tests run on virtual CPU devices (the standard JAX
substitute for fake-backend multi-node testing, SURVEY §4); bench.py runs
on the real TPU chip instead.
"""

import os

# The axon sitecustomize pins jax_platforms to "axon,cpu" in every
# process; override back to CPU *after* import (env vars alone are
# ignored) so tests never round-trip through the TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
