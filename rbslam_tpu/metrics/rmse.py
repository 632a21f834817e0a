"""Evaluation metrics: Procrustes-aligned RMSE, orientation error.

References: per-axis RMS after Procrustes alignment
(run_dense3D_magfield.m:155-160), quaternion-error Euler RMSE (:163-176),
and the sparse-visual path/map RMSE where the alignment is estimated on
one point set and applied to the others (calc_rmses.m:35-55).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..math.procrustes import procrustes, procrustes_transform
from ..math.quaternions import qinv, qmul, quat_to_euler


def rms(x, axis=0):
    """Root-mean-square along an axis (MATLAB `rms`)."""
    return jnp.sqrt(jnp.mean(jnp.asarray(x) ** 2, axis=axis))


def aligned_position_rmse(truth, estimate, per_axis: bool = False):
    """Procrustes-align `estimate` [T, d] onto `truth`, then RMS error.

    Returns the scalar RMSE of the pointwise distance by default;
    ``per_axis=True`` returns the per-axis RMS vector the reference
    prints (run_dense3D_magfield.m:159-160).
    """
    Z, _ = procrustes(jnp.asarray(truth), jnp.asarray(estimate))
    err = jnp.asarray(truth) - Z
    if per_axis:
        return rms(err, axis=0)
    d = jnp.sqrt(jnp.sum(err**2, axis=-1))
    return jnp.sqrt(jnp.mean(d**2))


def orientation_rmse_deg(truth_quat, est_quat):
    """Per-axis RMS of the quaternion-error Euler angles in degrees
    (run_dense3D_magfield.m:163-176)."""
    q_err = qmul(jnp.asarray(est_quat), qinv(jnp.asarray(truth_quat)))
    return rms(quat_to_euler(q_err), axis=0)


def map_and_path_rmse(map_truth, map_est, traj_truth, traj_est):
    """Sparse-visual metrics (calc_rmses.m): estimate the similarity
    transform from the map correspondence, apply it to both the map and
    the 2D path. Returns (rmse_path, rmse_map)."""
    _, tf = procrustes(jnp.asarray(map_truth), jnp.asarray(map_est))
    Z_path = procrustes_transform(jnp.asarray(traj_est)[:, :2], tf)
    Z_map = procrustes_transform(jnp.asarray(map_est), tf)
    d_path = jnp.sqrt(
        jnp.sum((jnp.asarray(traj_truth)[:, :2] - Z_path) ** 2, axis=-1)
    )
    d_map = jnp.sqrt(jnp.sum((jnp.asarray(map_truth) - Z_map) ** 2, axis=-1))
    return (
        jnp.sqrt(jnp.mean(d_path**2)),
        jnp.sqrt(jnp.mean(d_map**2)),
    )
