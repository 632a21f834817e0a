"""Sparse visual-SLAM model: 2D pose + heading, pinhole landmark camera.

Reference semantics (examples/slam-sparse-visual/):

- state xn = [p1, p2, theta]; linear state xl = flattened landmark
  positions [2 M] (pfslam.m:90-92);
- dynamics: random walk driven by odometry, xn' = xn + u + sqrt(dt*Q) xi
  (pfslam.m:81);
- measurement (measurement.m:44-79): 1D pinhole projection of each
  landmark,
      u = K [R' | -R' p] [m; 1],   y_j = u1_j / u2_j
  with analytic derivatives wrt the landmark coordinates (onlyLin=True
  path, dy(:,4:2:end)/dy(:,5:2:end) diagonal blocks);
- visibility: behind-camera or out-of-field landmarks are NaN in the
  data; the engines mask on ~isnan(y_t) (src/particleFilter.m:134-136).
  `not_visible` from the predicted geometry is also returned for
  data simulation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .base import SparseModel


class PinholeCamera(NamedTuple):
    f: float   # focal length (load_data.m:62)
    fp: float  # principal point
    fw: float  # image half-width (field of view bound)


def project(camera: PinholeCamera, xn, landmarks):
    """Project landmarks [M, 2] through the camera at pose xn = [p, theta].

    Returns (y [M], not_visible [M] bool).
    """
    p, th = xn[:2], xn[2]
    c, s = jnp.cos(th), jnp.sin(th)
    # rows of K [R' | -R' p]: with R = [[c, -s], [s, c]]
    rel = landmarks - p                       # [M, 2]
    cam = jnp.stack(
        [c * rel[:, 0] + s * rel[:, 1], -s * rel[:, 0] + c * rel[:, 1]],
        axis=-1,
    )
    u1 = camera.f * cam[:, 0] + camera.fp * cam[:, 1]
    u2 = cam[:, 1]
    y = u1 / u2
    not_visible = (u2 < 0) | (jnp.abs(y) > camera.fw)
    return y, not_visible


def landmark_jacobian(camera: PinholeCamera, xn, landmarks):
    """d y_j / d m_j: [M, 2] (measurement.m:72-79); block-diagonal over
    landmarks when scattered into the [M, 2M] measurement matrix."""
    p, th = xn[:2], xn[2]
    m1, m2 = landmarks[:, 0], landmarks[:, 1]
    div = (
        m2 * jnp.cos(th) - p[1] * jnp.cos(th)
        - m1 * jnp.sin(th) + p[0] * jnp.sin(th)
    ) ** 2
    dym1 = camera.f * (m2 - p[1]) / div
    dym2 = -camera.f * (m1 - p[0]) / div
    return jnp.stack([dym1, dym2], axis=-1)


def make_pinhole2d_model(camera: PinholeCamera, n_landmarks: int) -> SparseModel:
    M = n_landmarks

    def dynamics(key, xn, u, dt, Q):
        L = jnp.sqrt(dt) * jnp.sqrt(jnp.diag(Q))
        xi = jax.random.normal(key, xn.shape, dtype=xn.dtype)
        return xn + u + L * xi

    def measure(xn, xl):
        landmarks = xl.reshape(M, 2)
        yhat, _ = project(camera, xn, landmarks)
        dm = landmark_jacobian(camera, xn, landmarks)   # [M, 2]
        # scatter the per-landmark 2-vectors into the block-diagonal
        # [M, 2M] matrix: H[j, 2j] = dm[j,0], H[j, 2j+1] = dm[j,1]
        rows = jnp.arange(M)
        H = jnp.zeros((M, 2 * M), dtype=xl.dtype)
        H = H.at[rows, 2 * rows].set(dm[:, 0])
        H = H.at[rows, 2 * rows + 1].set(dm[:, 1])
        return yhat, H

    return SparseModel(
        dynamics=dynamics,
        dyn_residual=None,  # Euclidean default (psslam.m:118)
        measure=measure,
        n_nonlin=3,
        n_lin=2 * M,
        ny=M,
    )
