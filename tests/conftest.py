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

# Persistent compilation cache for the CPU test backend: the suite's
# wall time is dominated by XLA compiles of many small distinct
# programs (8-virtual-device shard_map programs especially); cached
# reruns cut the suite from ~11 min to a few minutes on this 2-core
# host (VERDICT r4 #6).
jax.config.update("jax_compilation_cache_dir", "/root/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
