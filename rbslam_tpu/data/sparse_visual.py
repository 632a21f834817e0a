"""Sparse visual-SLAM dataset: 20-landmark bean curve with a 1D pinhole
camera (examples/slam-sparse-visual/load_data.m).

The trajectory/observation fixture `curve-x2.mat` ships with the
reference repository (examples/slam-sparse-visual/curve-x2.mat) and is
vendored unmodified under data/assets/. The loader reproduces the
reference's corruption pipeline: odometry noise + position-drift bias
(:80-87), fresh observation noise (:90), and optional observation
shuffling (:109-129).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.pinhole2d import PinholeCamera

_ASSET = os.path.join(os.path.dirname(__file__), "assets", "curve-x2.mat")


class SparseVisualData(NamedTuple):
    y: jnp.ndarray          # [T, M] noisy projections (NaN = not visible)
    u: jnp.ndarray          # [T-1, 3] noisy odometry (dPos, dTheta)
    landmarks: np.ndarray   # [M, 2] true map
    ground_truth: np.ndarray  # [T, 3] true (p1, p2, theta)
    init_pos: np.ndarray    # [2]
    init_theta: float
    camera: PinholeCamera


def load_sparse_visual(
    key,
    pos_var: float = 0.04**2,
    pos_bias: float = 0.01,
    angle_var: float = (0.001**2) ** 2,
    obs_noise_std: float = 0.01,
    n_shuffle: int = 0,
    path: Optional[str] = None,
) -> SparseVisualData:
    import scipy.io as sio

    d = sio.loadmat(path or _ASSET)
    p = d["p"]              # [2, T]
    th = d["th"].ravel()    # [T]
    Yclean = d["Yclean"]    # [M, T]
    landmarks = d["map"].T  # [M, 2]

    dpos = np.diff(p, axis=1).T                  # [T-1, 2]
    dth = np.diff(np.unwrap(th))[:, None]        # [T-1, 1]
    u = np.concatenate([dpos, dth], axis=-1)

    k_u, k_th, k_y, k_s = jax.random.split(key, 4)
    u = u + np.concatenate(
        [
            np.sqrt(pos_var)
            * np.asarray(jax.random.normal(k_u, dpos.shape))
            + pos_bias,
            np.sqrt(angle_var) * np.asarray(jax.random.normal(k_th, dth.shape)),
        ],
        axis=-1,
    )
    y = Yclean.T + obs_noise_std * np.asarray(
        jax.random.normal(k_y, Yclean.T.shape)
    )

    if n_shuffle > 0:
        # corrupt some observations by swapping adjacent landmark ids
        # (:109-129)
        M, T = Yclean.shape
        t_rand = np.sort(
            np.asarray(
                jax.random.randint(k_s, (n_shuffle,), 0, T)
            )
        )
        sw_keys = jax.random.split(jax.random.fold_in(k_s, 1), n_shuffle)
        for i, t in enumerate(t_rand):
            j = int(jax.random.randint(sw_keys[i], (), 0, M // 2 - 1))
            y[t, [j, j + 1]] = y[t, [j + 1, j]]

    camera = PinholeCamera(f=1.5, fp=0.0, fw=1.0)  # load_data.m:60-64
    return SparseVisualData(
        y=jnp.asarray(y, jnp.float32),
        u=jnp.asarray(u, jnp.float32),
        landmarks=landmarks,
        ground_truth=np.concatenate([p.T, th[:, None]], axis=-1),
        init_pos=p[:, 0].copy(),
        init_theta=float(th[0]),
        camera=camera,
    )
