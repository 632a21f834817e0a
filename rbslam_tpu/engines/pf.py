"""Plain (non-Rao-Blackwellized) particle filter for terrain-matching
localization on a fixed map.

Reference: examples/mag-localization-mapping/particleFilterLocalization.m —
resample + propagate (:91-95), vectorized measurement weights (:110),
divergence check (:113-115), normalize + store trajectories (:118-131).
Differences by design: log-domain weights throughout (the reference's
linear-domain weights underflow and trigger its divergence warning; here
degeneracy is surfaced as an ESS metric instead), explicit PRNG keys,
configurable resampling, ancestor-index trajectory reconstruction.

This engine is the throughput flagship: per-particle state is 7 floats
with no covariance, so it scales to millions of particles per chip
(SURVEY §3.4: "the first thing to make fast/parallel").
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..math.linalg import ess_from_logw, logsumexp_normalize
from ..ops.resampling import resample_indices
from .rbpf import _broadcast_time, reconstruct_trajectories


class PFConfig(NamedTuple):
    n_particles: int
    resampling: str = "multinomial"
    store_trajectories: bool = False
    # Resample only when ESS < ess_threshold * N, accumulating log-weights
    # in between. 1.0 reproduces the reference's every-step resampling
    # (particleFilterLocalization.m:91-95); lower values preserve particle
    # diversity against premature collapse in global localization.
    ess_threshold: float = 0.5


class PFResult(NamedTuple):
    traj_max: jnp.ndarray      # [T, dn]
    traj_mean: jnp.ndarray     # [T, dn]
    xn: jnp.ndarray            # [N_P, dn] final particles
    logw: jnp.ndarray          # [N_P] final normalized log-weights
    ess: jnp.ndarray           # [T]
    log_evidence: jnp.ndarray  # scalar
    xn_traj: jnp.ndarray       # [T, N_P, dn] if store_trajectories else [0]
    xn_hist: jnp.ndarray       # [T, N_P, dn] raw per-step cloud (same flag)
    ancestors: jnp.ndarray     # [T-1, N_P]


@partial(jax.jit, static_argnames=("dynamics", "log_weight", "config"))
def run_pf_localization(
    key,
    dynamics: Callable,     # (key, xn, u, dt, Q) -> xn'
    log_weight: Callable,   # (y_t, xn) -> scalar
    dx,
    y,
    x0_nonlin,
    Q,
    dt,
    config: PFConfig,
) -> PFResult:
    n_p = config.n_particles
    T = y.shape[0]
    y = jnp.asarray(y)
    Q, dt = _broadcast_time(Q, dt, T)

    x0 = jnp.asarray(x0_nonlin)
    if x0.ndim == 1:
        xn0 = jnp.broadcast_to(x0, (n_p,) + x0.shape)
    else:
        xn0 = x0  # pre-spread initial cloud [N_P, dn] (run_localization.m:156-161)

    logw0 = jax.vmap(lambda x: log_weight(y[0], x))(xn0)
    w0, logw0n, logz0 = logsumexp_normalize(logw0)

    def step(carry, inputs):
        xn, logw_n = carry
        k, y_t, u, Q_t, dt_t = inputs
        k_res, k_dyn = jax.random.split(k)
        ess_prev = ess_from_logw(logw_n)
        ident = jnp.arange(n_p, dtype=jnp.int32)
        if config.ess_threshold >= 1.0:
            ai = resample_indices(
                k_res, jnp.exp(logw_n), n_p, config.resampling
            )
            logw_prev = jnp.full_like(logw_n, -jnp.log(n_p))
        else:
            do_resample = ess_prev <= config.ess_threshold * n_p
            # lax.cond executes a single branch: the cumsum+searchsorted
            # (the dominant per-step cost at large N) runs only on
            # resampling steps
            ai = jax.lax.cond(
                do_resample,
                lambda lw: resample_indices(
                    k_res, jnp.exp(lw), n_p, config.resampling
                ),
                lambda lw: ident,
                logw_n,
            )
            # after resampling the accumulated weights reset to uniform
            logw_prev = jnp.where(
                do_resample, jnp.full_like(logw_n, -jnp.log(n_p)), logw_n
            )
        xn_anc = jnp.take(xn, ai, axis=0)
        dyn_keys = jax.random.split(k_dyn, n_p)
        xn_new = jax.vmap(
            lambda kk, x: dynamics(kk, x, u, dt_t, Q_t)
        )(dyn_keys, xn_anc)
        logw = logw_prev + jax.vmap(lambda x: log_weight(y_t, x))(xn_new)
        w, logw_nn, logz = logsumexp_normalize(logw)
        iw = jnp.argmax(logw_nn)
        outs = (
            xn_new if config.store_trajectories else jnp.zeros((0,)),
            ai.astype(jnp.int32),
            xn_new[iw],
            jnp.sum(xn_new * w[:, None], axis=0),
            ess_from_logw(logw_nn),
            logz - jnp.log(n_p),
        )
        return (xn_new, logw_nn), outs

    keys = jax.random.split(key, T - 1)
    (xn_f, logw_f), outs = jax.lax.scan(
        step, (xn0, logw0n), (keys, y[1:], dx, Q, dt)
    )
    xn_hist, ancestors, tmax, tmean, ess_t, logz_t = outs

    iw0 = jnp.argmax(logw0n)
    traj_max = jnp.concatenate([xn0[iw0][None], tmax], axis=0)
    traj_mean = jnp.concatenate(
        [jnp.sum(xn0 * w0[:, None], axis=0)[None], tmean], axis=0
    )
    ess = jnp.concatenate([ess_from_logw(logw0n)[None], ess_t])
    if config.store_trajectories:
        xn_hist_full = jnp.concatenate([xn0[None], xn_hist], axis=0)
        xn_traj = reconstruct_trajectories(xn_hist_full, ancestors)
    else:
        xn_hist_full = jnp.zeros((0,))
        xn_traj = jnp.zeros((0,))

    return PFResult(
        traj_max=traj_max,
        traj_mean=traj_mean,
        xn=xn_f,
        logw=logw_f,
        ess=ess,
        log_evidence=(logz0 - jnp.log(n_p)) + jnp.sum(logz_t),
        xn_traj=xn_traj,
        xn_hist=xn_hist_full,
        ancestors=ancestors,
    )
