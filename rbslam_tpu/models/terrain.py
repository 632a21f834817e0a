"""Terrain-matching localization model: fixed GP map, no linear state.

Reference semantics (examples/mag-localization-mapping/run_localization.m,
particleFilterLocalization.m):

- state xn = [p (3), q (4)];
- dynamics (:274-281):
      p' = p + u[:3] + sqrt(dt*Q_pos) xi_p
      q' = (u_q ⊗ q) ⊗ expq(sqrt(dt*Q_ori) xi_q)
  (note the composition order differs from the mag3D SLAM model: the
  odometry increment left-multiplies, qRight(q)*dq = dq ⊗ q);
- weights (:241-272): the GP posterior predictive at the particle
  position, rotated to the body frame; the reference computes
      w_i = sum_axis normpdf(y_axis; (R' mu)_axis, sqrt(var + sigma2))
  in the *linear* domain — a SUM of per-axis pdfs with a divergence
  warning when all weights underflow (particleFilterLocalization.m:110-115).
  Here the default is the correct log-domain joint density
  (mode="product"); mode="sum" reproduces the reference's
  sum-of-pdfs semantics via logsumexp. Two reference quirks are fixed
  (and documented): predictive *variance* is evaluated at the particle
  positions (run_localization.m:264-266 evaluates it on the test grid
  and indexes it by particle number), and weights never leave log space.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..basis.potential import ScalarPotentialBasis
from ..math.quaternions import expq, qmul, quat_to_rmat

_LOG2PI = float(jnp.log(2.0 * jnp.pi))


class TerrainModel(NamedTuple):
    dynamics: Callable       # (key, xn, u, dt, Q) -> xn'
    log_weight: Callable     # (y_t [3], xn) -> scalar log weight
    predict_field: Callable  # (x [.., 3]) -> (mean [.., 3], var [.., 3])
    n_nonlin: int


def make_terrain_model(
    potential: ScalarPotentialBasis,
    posterior_mean_weights,   # [n_lin] "foo" (run_localization.m:150-151)
    posterior_chol,           # [n_lin, n_lin] lower chol of (Phi'Phi + diag(sigma2/k))
    sigma2: float,
    mode: str = "product",
) -> TerrainModel:
    if mode not in ("product", "sum"):
        raise ValueError(f"mode must be 'product' or 'sum', got {mode!r}")
    w_map = jnp.asarray(posterior_mean_weights)
    Lpost = jnp.asarray(posterior_chol)

    def predict_field(x):
        C = potential.grad_blocks(x)                 # [.., 3, n_lin]
        mean = C @ w_map
        # var = sigma2 * row_i (C A^{-1} C')_ii with A = L L'
        flat = C.reshape(-1, C.shape[-1])
        V = jax.scipy.linalg.solve_triangular(Lpost, flat.T, lower=True)
        var = (sigma2 * jnp.sum(V * V, axis=0)).reshape(C.shape[:-1])
        return mean, var

    def log_weight(y_t, xn):
        mean_nav, var = predict_field(xn[:3])
        Rnb = quat_to_rmat(xn[3:7])
        mean_body = Rnb.T @ mean_nav
        s2 = var + sigma2
        log_pdfs = -0.5 * (
            (y_t - mean_body) ** 2 / s2 + jnp.log(s2) + _LOG2PI
        )
        if mode == "product":
            return jnp.sum(log_pdfs)
        return jax.nn.logsumexp(log_pdfs)

    def dynamics(key, xn, u, dt, Q):
        kp, kq = jax.random.split(key)
        p, q = xn[:3], xn[3:7]
        Lp = jnp.linalg.cholesky(dt * Q[:3, :3])
        Lq = jnp.linalg.cholesky(dt * Q[3:6, 3:6])
        p_new = p + u[:3] + Lp @ jax.random.normal(kp, (3,), dtype=xn.dtype)
        q_new = qmul(
            qmul(u[3:7], q),
            expq(Lq @ jax.random.normal(kq, (3,), dtype=xn.dtype)),
        )
        return jnp.concatenate([p_new, q_new])

    return TerrainModel(
        dynamics=dynamics,
        log_weight=log_weight,
        predict_field=predict_field,
        n_nonlin=7,
    )


def make_gridded_terrain_model(
    mean_grid,      # [nx, ny_, 3] posterior mean field on a regular grid
    var_grid,       # [nx, ny_, 3] posterior per-axis variance
    lo,             # [2] grid origin (x, y)
    spacing,        # [2] grid spacing
    sigma2: float,
    dynamics=None,
    mode: str = "product",
) -> TerrainModel:
    """Terrain model with the GP posterior pre-evaluated on a grid and
    bilinearly interpolated at particle positions.

    The exact model (:func:`make_terrain_model`) solves an
    n_lin-triangular system per particle for the predictive variance —
    fine at N_P=1000 (the reference scale) but the wrong trade at
    10^5–10^6 particles. Precomputing the posterior on a grid makes the
    weight a pure gather+lerp: this is the classic terrain-matching
    formulation and the 1M-particle scaling path (BASELINE.json north
    star). Grid resolution should be << length scale for negligible
    interpolation bias.
    """
    if mode not in ("product", "sum"):
        raise ValueError(f"mode must be 'product' or 'sum', got {mode!r}")
    mean_grid = jnp.asarray(mean_grid)
    var_grid = jnp.asarray(var_grid)
    lo = jnp.asarray(lo)
    spacing = jnp.asarray(spacing)
    nx, ny_ = mean_grid.shape[0], mean_grid.shape[1]

    # pack all four bilinear corners of (mean, var) into one row so a
    # particle's lookup is a SINGLE 24-float gather instead of eight
    # random-index gathers — random gathers are the dominant per-step
    # cost at 10^6 particles
    mv = jnp.concatenate([mean_grid, var_grid], axis=-1)   # [nx, ny_, 6]
    packed = jnp.concatenate(
        [mv[:-1, :-1], mv[1:, :-1], mv[:-1, 1:], mv[1:, 1:]], axis=-1
    ).reshape((nx - 1) * (ny_ - 1), 24)

    def _corners(p):
        """(packed row [4, 6], tx, ty) at position p [2]."""
        f = (p - lo) / spacing
        i0 = jnp.clip(jnp.floor(f[0]).astype(jnp.int32), 0, nx - 2)
        j0 = jnp.clip(jnp.floor(f[1]).astype(jnp.int32), 0, ny_ - 2)
        tx = jnp.clip(f[0] - i0, 0.0, 1.0)
        ty = jnp.clip(f[1] - j0, 0.0, 1.0)
        row = packed[i0 * (ny_ - 1) + j0].reshape(4, 6)
        return row, tx, ty

    def _interp_both(p):
        """Bilinear (mean [3], var [3]) at p [2] — one gather."""
        row, tx, ty = _corners(p)
        wgt = jnp.stack([
            (1 - tx) * (1 - ty), tx * (1 - ty), (1 - tx) * ty, tx * ty,
        ])
        out = wgt @ row                                     # [6]
        return out[:3], out[3:]

    def predict_field(x):
        x = jnp.asarray(x)
        if x.ndim == 1:
            return _interp_both(x[:2])
        return jax.vmap(lambda p: _interp_both(p[:2]))(x)

    def log_weight(y_t, xn):
        mean_nav, var = _interp_both(xn[:2])
        Rnb = quat_to_rmat(xn[3:7])
        mean_body = Rnb.T @ mean_nav
        s2 = var + sigma2
        log_pdfs = -0.5 * (
            (y_t - mean_body) ** 2 / s2 + jnp.log(s2) + _LOG2PI
        )
        if mode == "product":
            return jnp.sum(log_pdfs)
        return jax.nn.logsumexp(log_pdfs)

    def default_dynamics(key, xn, u, dt, Q):
        kp, kq = jax.random.split(key)
        p, q = xn[:3], xn[3:7]
        Lp = jnp.sqrt(dt) * jnp.sqrt(jnp.diagonal(Q[:3, :3]))
        Lq = jnp.sqrt(dt) * jnp.sqrt(jnp.diagonal(Q[3:6, 3:6]))
        p_new = p + u[:3] + Lp * jax.random.normal(kp, (3,), dtype=xn.dtype)
        q_new = qmul(
            qmul(u[3:7], q),
            expq(Lq * jax.random.normal(kq, (3,), dtype=xn.dtype)),
        )
        return jnp.concatenate([p_new, q_new])

    return TerrainModel(
        dynamics=dynamics or default_dynamics,
        log_weight=log_weight,
        predict_field=predict_field,
        n_nonlin=7,
    )


def gridify_gp(gp, lo, hi, n=(256, 256), z: float = 0.0):
    """Evaluate a fitted ReducedRankGP's mean/var on a regular grid for
    :func:`make_gridded_terrain_model`. Returns (mean, var, lo, spacing)."""
    import numpy as np

    xs = np.linspace(lo[0], hi[0], n[0])
    ys = np.linspace(lo[1], hi[1], n[1])
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    pts = jnp.asarray(
        np.stack([X.ravel(), Y.ravel(), np.full(X.size, z)], -1),
        jnp.float32,
    )
    mean, var = gp.predict_gradient(pts)
    spacing = jnp.asarray(
        [xs[1] - xs[0], ys[1] - ys[0]], jnp.float32
    )
    return (
        mean.reshape(n[0], n[1], 3),
        var.reshape(n[0], n[1], 3),
        jnp.asarray([xs[0], ys[0]], jnp.float32),
        spacing,
    )
