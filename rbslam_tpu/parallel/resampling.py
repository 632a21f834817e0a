"""Distributed resampling: explicit-collective ancestor selection on a
particle-sharded ensemble (SURVEY §2.4 "distributed resampling").

The reference resamples with per-particle inverse-CDF draws over the
full weight vector (tools/sample.m:30-33, src/particleFilter.m:104-113)
— an inherently global operation. The TPU-native split:

- The *index* computation is cheap: weights are one float per particle,
  ~4 MB at the 1M-particle north star — negligible next to the particle
  states they select (per-particle covariances are ~64 KB each). We move
  weights, never states, to decide ancestry.
- The *state* exchange is the expensive part. Ancestor indices returned
  here are global; the caller's `jnp.take` on the sharded state tensors
  compiles to a partitioned gather in which only crossing particles
  (children whose ancestor lives on another shard) move over ICI/DCN.

Two index schemes, both running inside `shard_map` with explicit
collectives (no GSPMD inference):

- ``replicated_cdf`` (default): all-gather the weight shards, one
  cumsum, every shard computes its own children's ancestors from the
  identical replicated CDF. Bitwise-identical to the single-device
  resampler — the sharding-equivalence gate.
- ``prefix``: the scalable form — per-shard weight sums are
  all-gathered (S floats, S = #shards), the exclusive prefix over
  shards offsets each local cumsum into a global CDF *segment*, and
  each shard answers inverse-CDF queries only for comb positions that
  land in its segment; answers are combined with a psum (each child's
  ancestor is found by exactly one shard). Communication: O(S) floats
  for the offsets + one [N] int psum — no replicated weight vector.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_AXIS = "particles"


def _comb(key, n, scheme, dtype):
    """Global inverse-CDF query positions in [0, 1), sorted for
    systematic/stratified (systematic's sortedness is what makes the
    fused gather kernels near-streaming)."""
    if scheme == "systematic":
        u0 = jax.random.uniform(key, ())
        return (jnp.arange(n, dtype=dtype) + u0) / n
    if scheme == "stratified":
        us = jax.random.uniform(key, (n,))
        return (jnp.arange(n, dtype=dtype) + us) / n
    if scheme == "multinomial":
        return jax.random.uniform(key, (n,))
    raise ValueError(f"unknown resampling scheme {scheme!r}")


def sharded_resample_indices(key, w, mesh: Mesh, scheme: str = "systematic",
                             mode: str = "replicated_cdf"):
    """Global ancestor indices for a particle-sharded weight vector.

    w: [N] normalized weights, sharded over the mesh's ``particles``
    axis. Returns ai [N] int32 (global indices), sharded the same way.
    Every shard uses the same `key`, so the comb is globally consistent.
    """
    n = w.shape[0]
    n_shards = mesh.shape[_AXIS]
    spec = P(_AXIS) if w.ndim == 1 else None
    dtype = w.dtype

    if mode == "replicated_cdf":

        def inner(w_local):
            w_all = jax.lax.all_gather(w_local, _AXIS, tiled=True)  # [N]
            cdf = jnp.cumsum(w_all)
            cdf = cdf / cdf[-1]
            idx = jax.lax.axis_index(_AXIS)
            n_local = w_local.shape[0]
            u_all = _comb(key, n, scheme, dtype)
            u = jax.lax.dynamic_slice(u_all, (idx * n_local,), (n_local,))
            return jnp.clip(
                jnp.searchsorted(cdf, u, side="right"), 0, n - 1
            ).astype(jnp.int32)

    elif mode == "prefix":

        def inner(w_local):
            n_local = w_local.shape[0]
            idx = jax.lax.axis_index(_AXIS)
            local_sum = jnp.sum(w_local)
            sums = jax.lax.all_gather(local_sum, _AXIS)        # [S]
            total = jnp.sum(sums)
            off = jnp.sum(
                jnp.where(jnp.arange(n_shards) < idx, sums, 0.0)
            )
            # this shard's global CDF segment [off, off + local_sum)
            cdf_seg = off + jnp.cumsum(w_local)
            u = _comb(key, n, scheme, dtype) * total            # [N] global
            # answer only queries landing in our segment; elsewhere 0
            in_seg = (u >= off) & (u < off + local_sum)
            local_ai = jnp.searchsorted(cdf_seg, u, side="right")
            ai_partial = jnp.where(
                in_seg, idx * n_local + local_ai, 0
            ).astype(jnp.int32)
            # each query is answered by exactly one shard -> psum merges
            ai = jax.lax.psum(ai_partial, _AXIS)
            # queries beyond the last CDF entry (fp rounding) -> clamp
            ai = jnp.where(u >= total, n - 1, ai)
            ai = jnp.clip(ai, 0, n - 1)
            return jax.lax.dynamic_slice(ai, (idx * n_local,), (n_local,))

    else:
        raise ValueError(f"unknown distributed resampling mode {mode!r}")

    return jax.shard_map(
        inner, mesh=mesh, in_specs=(spec,), out_specs=spec,
        check_vma=False,
    )(w)
