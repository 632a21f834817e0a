"""Sharded RBPF stepping: GSPMD-partitioned particle ensemble.

One jitted training/filter step with explicit sharding constraints: the
particle ensemble shards its leading axis over the ``particles`` mesh
axis, per-particle covariances optionally shard a basis-block axis over
``map``. XLA inserts the collectives the reference has no analog of:
psum for the log-sum-exp normalization (src/particleFilter.m:153-156),
pmax+gather for the max-weight particle (:159), a global gather for the
resampling ancestor exchange (:104-113).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..engines.rbpf import _measurement_update
from ..math.linalg import ess_from_logw, logsumexp_normalize
from ..models.base import DenseModel, SparseModel
from ..ops.resampling import resample_indices
from .mesh import particle_map_sharding, particle_sharding


class ShardedParticleState(NamedTuple):
    xn: jnp.ndarray     # [P, n_nonlin]
    xl: jnp.ndarray     # [P, n_lin]
    P: jnp.ndarray      # [P, n_lin, n_lin]
    logw: jnp.ndarray   # [P] normalized log-weights


def shard_rbpf_state(state: ShardedParticleState, mesh: Mesh,
                     shard_map_axis: bool = True) -> ShardedParticleState:
    """Device-put the ensemble with (particles[, map]) shardings."""
    put = jax.device_put
    P_sh = (
        particle_map_sharding(mesh, 3, 2)
        if shard_map_axis
        else particle_sharding(mesh, 3)
    )
    return ShardedParticleState(
        xn=put(state.xn, particle_sharding(mesh, 2)),
        xl=put(state.xl, particle_sharding(mesh, 2)),
        P=put(state.P, P_sh),
        logw=put(state.logw, particle_sharding(mesh, 1)),
    )


def sharded_step_fn(model, mesh: Mesh, R, jitter: float = 1e-3,
                    resampling: str = "systematic",
                    shard_map_axis: bool = True):
    """Build the jitted sharded filter step.

    Returns step(key, state, y_t, mask_t, u, Q_t, dt_t) -> (state', ess).
    Sharding constraints inside the step keep every carried tensor
    partitioned across scan iterations.
    """
    xn_sh = particle_sharding(mesh, 2)
    xl_sh = particle_sharding(mesh, 2)
    P_sh = (
        particle_map_sharding(mesh, 3, 2)
        if shard_map_axis
        else particle_sharding(mesh, 3)
    )
    w_sh = particle_sharding(mesh, 1)
    wsc = jax.lax.with_sharding_constraint

    @jax.jit
    def step(key, state: ShardedParticleState, y_t, mask_t, u, Q_t, dt_t):
        n_p = state.logw.shape[0]
        k_res, k_dyn = jax.random.split(key)
        w = jnp.exp(state.logw)
        ai = resample_indices(k_res, w, n_p, resampling)
        xn = wsc(jnp.take(state.xn, ai, axis=0), xn_sh)
        xl = wsc(jnp.take(state.xl, ai, axis=0), xl_sh)
        Pc = wsc(jnp.take(state.P, ai, axis=0), P_sh)

        dyn_keys = jax.random.split(k_dyn, n_p)
        xn = wsc(
            jax.vmap(lambda kk, x: model.dynamics(kk, x, u, dt_t, Q_t))(
                dyn_keys, xn
            ),
            xn_sh,
        )
        xl, Pc, logw, _ = _measurement_update(
            model, xn, xl, Pc, y_t, R, mask_t, jitter, False
        )
        _, logw_n, _ = logsumexp_normalize(logw)
        state_new = ShardedParticleState(
            xn=wsc(xn, xn_sh),
            xl=wsc(xl, xl_sh),
            P=wsc(Pc, P_sh),
            logw=wsc(logw_n, w_sh),
        )
        return state_new, ess_from_logw(logw_n)

    return step
