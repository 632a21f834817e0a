"""Batched per-particle Kalman measurement updates (dense + masked sparse).

Dense path (src/particleFilter.m:137-150,181-198): per particle i,

    S_i = C_i P_i C_i' + R          (ny x ny, ny <= 3)
    logw_i = log N(e_i; 0, S_i)
    K_i = P_i C_i' S_i^{-1}
    xl_i += K_i e_i ;  P_i -= K_i S_i K_i'

All particles at once via einsum — the [N_P, ny, nLin] x [N_P, nLin, nLin]
contractions are exactly the MXU-shaped batched matmuls that dominate the
FLOPs (SURVEY §3.1 "dominant cost").

Sparse path (src/particleFilter.m:127-136,164-180): the reference strips
NaN-masked rows to a *dynamic* size; here masked rows are kept at fixed
width and neutralized exactly — innovation zeroed, S given unit diagonal
and zero cross-terms on masked rows/cols — which leaves the Cholesky,
log-density (with n_obs = sum(mask)), gain and covariance update
numerically identical to the stripped computation while keeping static
shapes for XLA.

Functions take unbatched per-particle operands; `vmap` over particles.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..math.linalg import (
    gaussian_logpdf_chol,
    psd_cholesky,
    solve_psd,
    symmetrize,
)


def innovation_cov(C, P, R):
    """S = C P C' + R for one particle. C: [ny, nLin], P: [nLin, nLin]."""
    CP = C @ P
    return CP @ C.T + R, CP


def dense_log_weights(C, P, xl, y, R, jitter: float):
    """Marginal innovation log-likelihood for one particle.

    Returns (logw, e, L, CP, retried).
    """
    e = y - C @ xl
    S, CP = innovation_cov(C, P, R)
    L, retried = psd_cholesky(S, jitter)
    return gaussian_logpdf_chol(e, L), e, L, CP, retried


def kalman_update_dense(C, P, xl, y, R, jitter: float, joseph: bool = False):
    """One particle's KF measurement update; returns (xl', P', logw, retried).

    ``joseph=True`` uses the Joseph-stabilized covariance update (an option
    the fp64 reference did not need; recommended under fp32, SURVEY §7.3#4).
    """
    logw, e, L, CP, retried = dense_log_weights(C, P, xl, y, R, jitter)
    # K = P C' S^{-1}  via two triangular solves on (C P)' = P C'
    K = solve_psd(L, CP).T  # [nLin, ny]
    xl_new = xl + K @ e
    if joseph:
        n = P.shape[-1]
        IKC = jnp.eye(n, dtype=P.dtype) - K @ C
        P_new = IKC @ P @ IKC.T + K @ R @ K.T
    else:
        S = CP @ C.T + R
        P_new = P - K @ S @ K.T
    return xl_new, symmetrize(P_new), logw, retried


def _mask_system(e, S, mask):
    """Neutralize masked observation rows/cols exactly.

    mask: [ny] float (1 = observed). Masked entries get e=0 and unit
    diagonal in S with zero couplings, so they contribute nothing to the
    Cholesky log-det, the whitened residual, or the gain.
    """
    m = mask
    e_m = e * m
    outer = m[:, None] * m[None, :]
    S_m = S * outer + jnp.diag(1.0 - m)
    return e_m, S_m


def masked_log_weights(yhat, H, P, y, R, mask, jitter: float):
    """Sparse/EKF innovation log-likelihood with visibility masking.

    One particle: yhat,H from the linearized model, mask from ~isnan(y)
    (src/particleFilter.m:134-136). Returns (logw, e_m, L, Hm, retried).
    """
    Hm = H * mask[:, None]
    e = jnp.nan_to_num(y) - yhat
    S = Hm @ P @ Hm.T + R * (mask[:, None] * mask[None, :])
    e_m, S_m = _mask_system(e, S, mask)
    L, retried = psd_cholesky(S_m, jitter)
    n_obs = jnp.sum(mask)
    logw = gaussian_logpdf_chol(e_m, L, n_obs=n_obs)
    return logw, e_m, L, Hm, retried


def kalman_update_dense_batched(C, P, xl, y, R, jitter: float,
                                joseph: bool = False):
    """Whole-ensemble dense KF update: C [N,ny,nl], P [N,nl,nl], xl [N,nl].

    Same math as :func:`kalman_update_dense` but with one *batched*
    Cholesky whose jitter retry is a single `lax.cond` outside any vmap —
    the common path costs one factorization (under vmap the cond would
    lower to a select that always runs both).
    Returns (xl', P', logw [N], retried [N]).
    """
    # P may arrive in a reduced-precision storage dtype (bf16 covariance
    # carry); all contractions accumulate in f32
    cdtype = C.dtype
    e = y[None, :] - jnp.einsum("pij,pj->pi", C, xl)
    CP = jnp.einsum(
        "pij,pjk->pik", C, P, preferred_element_type=jnp.float32
    )
    S = jnp.einsum(
        "pik,pjk->pij", CP, C, preferred_element_type=jnp.float32
    ) + R
    L, retried = psd_cholesky(S, jitter)
    logw = gaussian_logpdf_chol(e, L)
    K = jnp.swapaxes(solve_psd(L, CP), -1, -2)          # [N, nl, ny]
    xl_new = xl + jnp.einsum("pij,pj->pi", K, e)
    if joseph:
        n = P.shape[-1]
        IKC = jnp.eye(n, dtype=cdtype) - K @ C
        P_new = jnp.einsum(
            "pij,pjk,plk->pil", IKC, P.astype(cdtype), IKC,
            preferred_element_type=jnp.float32,
        ) + K @ R @ jnp.swapaxes(K, -1, -2)
    else:
        P_new = P.astype(jnp.float32) - jnp.einsum(
            "pij,pjk,plk->pil", K, S, K,
            preferred_element_type=jnp.float32,
        )
    return xl_new, symmetrize(P_new).astype(P.dtype), logw, retried


def kalman_update_masked_batched(yhat, H, P, xl, y, R, mask, jitter: float):
    """Whole-ensemble masked (sparse/EKF) update; see
    :func:`kalman_update_masked`. yhat [N,ny], H [N,ny,nl]."""
    m = mask
    Hm = H * m[None, :, None]
    e = (jnp.nan_to_num(y)[None, :] - yhat) * m[None, :]
    R_m = R * (m[:, None] * m[None, :])
    PHt = P @ jnp.swapaxes(Hm, -1, -2)                  # [N, nl, ny]
    S = jnp.einsum("pij,pjk->pik", Hm, PHt) + R_m + jnp.diag(1.0 - m)
    L, retried = psd_cholesky(S, jitter)
    n_obs = jnp.sum(m)
    logw = gaussian_logpdf_chol(e, L, n_obs=n_obs)
    K = jnp.swapaxes(solve_psd(L, jnp.swapaxes(PHt, -1, -2)), -1, -2)
    xl_new = xl + jnp.einsum("pij,pj->pi", K, e)
    P_new = P - K @ S @ jnp.swapaxes(K, -1, -2)
    return xl_new, symmetrize(P_new), logw, retried


def kalman_update_masked(yhat, H, P, xl, y, R, mask, jitter: float):
    """Sparse/EKF masked measurement update; returns (xl', P', logw, retried)."""
    logw, e_m, L, Hm, retried = masked_log_weights(
        yhat, H, P, y, R, mask, jitter
    )
    PHt = P @ Hm.T                     # [nLin, ny]; masked cols are zero
    K = solve_psd(L, PHt.T).T          # block structure keeps them zero
    xl_new = xl + K @ e_m
    S_m = Hm @ PHt + R * (mask[:, None] * mask[None, :]) + jnp.diag(1.0 - mask)
    P_new = P - K @ S_m @ K.T
    return xl_new, symmetrize(P_new), logw, retried
