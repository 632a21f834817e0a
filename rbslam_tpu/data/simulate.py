"""Dense-workload dataset simulation (the generateData_dense.m pipeline).

Steps (examples/slam-dense-radio/generateData_dense.m):

1. ground-truth trajectory (:67-214, via data/trajectories.py);
2. domain LL = trajectory bounds padded by nLL * lengthScale (:226-231,
   :259-262);
3. GP field draw with m_sim (default 2000) basis functions at the
   trajectory points and a visualization grid (:216-290); 6D trajectories
   get the curl-free 3D field rotated per-step to the body frame
   (:252-257), planar ones a scalar SE field;
4. odometry corruption (:294-323): run the *model's own* sampled dynamics
   forward from the initial state, then rebuild the increment sequence the
   way the reference does per trajectory family —
     - 6D: position increments from differencing the noisy path, plus the
       noisy quaternion increments actually applied (:303-309);
     - heading families (line_3D/square_3D): clean position increments +
       differenced noisy heading (:317-319);
     - planar families: fully differenced noisy path (:320-321).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..math.quaternions import quat_to_rmat
from .fields import (
    PotentialFieldDraw,
    ScalarFieldDraw,
    draw_scalar_field,
    draw_scalar_potential_field,
)
from .trajectories import Trajectory, generate_trajectory


@dataclass
class DenseDataset:
    dx: jnp.ndarray            # noisy odometry [T-1, n_u]
    init_state: jnp.ndarray    # [n_nonlin]
    y: jnp.ndarray             # measurements [T, ny]
    pos: np.ndarray            # ground-truth positions [T, 2|3]
    quat: Optional[np.ndarray]  # ground-truth quaternions [T, 4] (6D only)
    LL: np.ndarray             # domain bounds [2, d]
    Q: jnp.ndarray             # process noise used [T-1, nw, nw]
    odometry_path: np.ndarray  # noisy integrated path [T, n_nonlin]
    grid: Optional[dict]       # visualization grid + true field values
    field_weights: jnp.ndarray  # true field basis weights (m_sim basis)


def _expand_Q(Q, T):
    Q = jnp.asarray(Q)
    if Q.ndim == 2:
        Q = jnp.broadcast_to(Q, (T - 1,) + Q.shape)
    return Q


def _domain_bounds(pos, length_scale, n_ll, three_d: bool):
    lo = pos.min(0) - n_ll * length_scale
    hi = pos.max(0) + n_ll * length_scale
    if three_d:
        return np.stack(
            [
                [lo[0], lo[1], -n_ll * length_scale],
                [hi[0], hi[1], n_ll * length_scale],
            ]
        )
    return np.stack([lo[:2], hi[:2]])


def _vis_grid(LL, n=100):
    x1t = np.linspace(LL[0, 0], LL[1, 0], n)
    x2t = np.linspace(LL[0, 1], LL[1, 1], n)
    X1, X2 = np.meshgrid(x1t, x2t)
    cols = [X1.ravel(), X2.ravel()]
    if LL.shape[1] == 3:
        cols.append(np.zeros_like(cols[0]))
    return x1t, x2t, np.stack(cols, axis=-1)


def simulate_dense_dataset(
    key,
    traj_type: str,
    theta,
    Q,
    dt: float,
    dynamics: Callable,
    m_sim: int = 2000,
    n_ll: float = 2.0,
    traj_kwargs: Optional[dict] = None,
    field_weights=None,
    with_grid: bool = True,
    dtype=jnp.float32,
) -> DenseDataset:
    """Simulate one dense dataset.

    ``dynamics(key, xn, u, dt, Q) -> xn'`` for planar/heading families, or
    ``-> (xn', dq)`` for 6D families (models.mag3d.dynamics_with_increment).
    ``field_weights`` reuses a previously drawn field (new measurement and
    odometry noise only — the nMC>1 path, run_dense2D_withHeading.m:156-161,
    generateData_dense.m:284-287).
    """
    traj = generate_trajectory(traj_type, **(traj_kwargs or {}))
    is_6d = traj.quat is not None
    T = traj.n_steps
    pos = traj.pos
    key_field, key_meas, key_odo = jax.random.split(key, 3)

    if is_6d:
        length_scale = float(theta[1])
        LL = _domain_bounds(pos, length_scale, n_ll, three_d=True)
    else:
        length_scale = float(theta[0])
        LL = _domain_bounds(pos, length_scale, n_ll, three_d=False)

    grid = None
    if with_grid:
        x1t, x2t, xt = _vis_grid(LL)
    else:
        xt = np.zeros((0, LL.shape[1]))

    pts = jnp.asarray(np.concatenate([pos, xt], axis=0), dtype)

    if is_6d:
        draw: PotentialFieldDraw = draw_scalar_potential_field(
            key_field, pts, m_sim, LL, theta
        )
        y_nav = draw.y[:T]                      # noisy gradient, nav frame
        Rn = quat_to_rmat(jnp.asarray(traj.quat, dtype))
        y = jnp.einsum("tij,tj->ti", jnp.swapaxes(Rn, -1, -2), y_nav)
        if with_grid:
            grid = {
                "x1t": x1t, "x2t": x2t,
                "f": np.asarray(draw.f[T:]),
                "df": np.asarray(draw.df[T:]),
            }
        weights = draw.weights
    else:
        if field_weights is not None:
            # keep the same field, redraw measurement noise
            from ..basis.laplace import hypercube_basis, domain_center
            basis = hypercube_basis(m_sim, LL)
            centered = pts[:T] - jnp.asarray(domain_center(LL), dtype)
            f = basis.phi(centered) @ jnp.asarray(field_weights, dtype)
            sigma2 = jnp.asarray(theta[2], dtype)
            y = (
                f
                + jnp.sqrt(sigma2)
                * jax.random.normal(key_meas, f.shape, dtype=dtype)
            )[:, None]
            weights = jnp.asarray(field_weights, dtype)
        else:
            draw_s: ScalarFieldDraw = draw_scalar_field(
                key_field, pts, m_sim, LL, theta
            )
            y = draw_s.y[:T][:, None]
            if with_grid:
                grid = {
                    "x1t": x1t, "x2t": x2t,
                    "f": np.asarray(draw_s.f[T:]),
                }
            weights = draw_s.weights

    # --- odometry corruption via the model's own dynamics ---
    Qt = _expand_Q(Q, T).astype(dtype)
    dx_clean = jnp.asarray(traj.dx, dtype)
    init = jnp.asarray(traj.init_state, dtype)
    keys = jax.random.split(key_odo, T - 1)

    if is_6d:
        def step(x, inp):
            k, u, Qi = inp
            x_new, dq = dynamics(k, x, u, dt, Qi)
            return x_new, (x_new, dq)

        _, (xs, dqs) = jax.lax.scan(step, init, (keys, dx_clean, Qt))
        path = jnp.concatenate([init[None], xs], axis=0)
        dpos = jnp.diff(path[:, :3], axis=0)
        dx = jnp.concatenate([dpos, dqs], axis=-1)
    else:
        def step(x, inp):
            k, u, Qi = inp
            x_new = dynamics(k, x, u, dt, Qi)
            return x_new, x_new

        _, xs = jax.lax.scan(step, init, (keys, dx_clean, Qt))
        path = jnp.concatenate([init[None], xs], axis=0)
        if traj_type in ("line_3D", "square_3D", "line_3D_withPos"):
            dheading = jnp.diff(path[:, 2], axis=0)[:, None]
            dx = jnp.concatenate([dx_clean[:, :2], dheading], axis=-1)
        else:
            dx = jnp.diff(path, axis=0)

    return DenseDataset(
        dx=dx,
        init_state=init,
        y=jnp.asarray(y, dtype),
        pos=pos,
        quat=traj.quat,
        LL=LL,
        Q=Qt,
        odometry_path=np.asarray(path),
        grid=grid,
        field_weights=weights,
    )
