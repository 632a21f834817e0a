"""Persistent XLA compilation cache setup.

The axon TPU path compiles remotely (~minutes for large programs); the
persistent cache makes repeat runs of the workloads/bench start in
seconds. Call before the first jit execution.
"""

from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.environ.get("RBSLAM_JAX_CACHE", "/root/jax_cache")


def enable_compilation_cache(directory: str | None = None) -> None:
    directory = directory or DEFAULT_CACHE_DIR
    try:
        os.makedirs(directory, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", directory)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization only
