"""Device-mesh construction for the particle x map-block sharding.

The domain's two parallel axes (SURVEY §2.4):

- ``particles`` — the data-parallel axis: every per-particle quantity
  (xn, xl, P, logw) shards its leading dimension here. Replaces the
  reference's sequential per-particle loops (src/particleFilter.m:104-204).
- ``map`` — the model-parallel axis: basis-block dimension of the
  covariance / information matrices for large n_lin.

Collectives (log-sum-exp psum, argmax pmax, resampling gathers) are
inserted by XLA GSPMD from the sharding annotations — no hand-written
NCCL analog (SURVEY §5 "distributed communication backend").
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_particle_shards: int | None = None, n_map_shards: int = 1,
              devices=None) -> Mesh:
    """Build a (particles, map) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_particle_shards is None:
        n_particle_shards = n // n_map_shards
    if n_particle_shards * n_map_shards != n:
        raise ValueError(
            f"{n_particle_shards} x {n_map_shards} != {n} devices"
        )
    arr = np.asarray(devices).reshape(n_particle_shards, n_map_shards)
    return Mesh(arr, axis_names=("particles", "map"))


def particle_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (particle) axis; replicate the rest."""
    return NamedSharding(mesh, P("particles", *([None] * (ndim - 1))))


def map_sharding(mesh: Mesh, ndim: int, axis: int) -> NamedSharding:
    """Shard one basis-block axis over the map axis."""
    spec = [None] * ndim
    spec[axis] = "map"
    return NamedSharding(mesh, P(*spec))


def particle_map_sharding(mesh: Mesh, ndim: int, map_axis: int) -> NamedSharding:
    """Leading axis over particles, one later axis over map blocks."""
    spec = [None] * ndim
    spec[0] = "particles"
    spec[map_axis] = "map"
    return NamedSharding(mesh, P(*spec))
