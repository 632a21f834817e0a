"""Magnetic mapping + terrain-matching localization workload
(examples/mag-localization-mapping/).

Reference pipeline (main.m, run_localization.m): train a scalar-potential
GP magnetic map (m=1000 basis functions) from mapping-phase data, then
run a plain particle filter (N_P=1000) that localizes a test path on the
fixed map; particles start uniformly over the domain (:156-161);
dynamics compose odometry increments with noise (:274-281).

The reference uses the external AaltoML/magnetic-data robot dataset
(README.md:66-71), which requires a network download; when a local copy
is not provided this workload generates an equivalent synthetic
environment (a drawn curl-free field, a lawnmower mapping path, and a
loop test path) — clearly labeled in the output.
"""

from __future__ import annotations

import argparse
import os
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.fields import draw_scalar_potential_field
from ..engines import PFConfig, run_pf_localization
from ..gp import fit_scalar_potential_gp
from ..math.quaternions import qinv, qmul, quat_to_rmat, rmat_to_quat
from ..models import make_terrain_model
from .common import Timer, report


@dataclass(frozen=True)
class MagLocalizationConfig:
    # run_localization.m:30 hyperparameters fitted to the real robot data;
    # used verbatim with --data. The synthetic fallback overrides the
    # length scale (0.1178 m cannot be resolved by any practical basis
    # size over the synthetic domain — the drawn field would be
    # unlearnable and localization meaningless).
    theta: tuple = (500.0, 0.1178, 384.659, 3.5859)
    # synthetic environment uses a resolvable length scale and a moderate
    # field-to-noise ratio so the mapping phase is well posed (map RMSE
    # reaches the noise floor at m~256)
    synthetic_theta: tuple = (10.0, 1.0, 25.0, 4.0)
    n_particles: int = 1000
    m_basis: int = 1000
    m_sim: int = 2000
    dt: float = 0.1
    # the reference ML-II-optimizes the hyperparameters by default
    # (main.m:117 calls gp_scalar_potential_fast with optimization on)
    optimize_hyperparams: bool = True
    weight_mode: str = "product"      # "sum" reproduces the reference quirk
    resampling: str = "systematic"
    ess_threshold: float = 0.5
    data_path: Optional[str] = None   # AaltoML magnetic-data .mat, if present
    seed: int = 1
    extent: float = 4.0               # synthetic domain half-size [m]
    n_map_lines: int = 11             # lawnmower passes
    n_test_steps: int = 160


def default_Q():
    """run_localization.m:28: blkdiag(4^2 (0.01)^2 I3, (1e-2 deg)^2 I3)."""
    qpos = 4.0**2 * 0.01**2 * np.ones(3)
    qori = (1e-2 * np.pi / 180.0) ** 2 * np.ones(3)
    return jnp.asarray(np.diag(np.concatenate([qpos, qori])), jnp.float32)


def _lawnmower(extent, n_lines, pts_per_line=40):
    xs = np.linspace(-extent, extent, n_lines)
    rows = []
    for i, x in enumerate(xs):
        ys = np.linspace(-extent, extent, pts_per_line)
        if i % 2:
            ys = ys[::-1]
        rows.append(np.stack([np.full_like(ys, x), ys], -1))
    path = np.concatenate(rows, 0)
    return np.concatenate([path, np.zeros((len(path), 1))], -1)


def _test_loop(extent, n_steps):
    t = np.linspace(0, 2 * np.pi, n_steps)
    r = 0.6 * extent
    path = np.stack([r * np.cos(t), 0.7 * r * np.sin(2 * t) , np.zeros_like(t)], -1)
    return path


def _heading_quats(path):
    d = np.diff(path[:, :2], axis=0)
    psi = np.arctan2(d[:, 1], d[:, 0])
    psi = np.append(psi, psi[-1])
    N = len(psi)
    R = np.zeros((N, 3, 3))
    R[:, 0, 0] = np.cos(psi)
    R[:, 0, 1] = np.sin(psi)
    R[:, 1, 0] = -np.sin(psi)
    R[:, 1, 1] = np.cos(psi)
    R[:, 2, 2] = 1.0
    return np.asarray(rmat_to_quat(jnp.asarray(R))), R


def _load_real_data(path, sensor="invensense"):
    """Load the AaltoML magnetic-data robot dataset.

    Accepts either
    - the cloned dataset REPOSITORY root (the layout main.m:27-60 reads:
      ``<root>/data/<sensor>/{i}-loc.csv / {i}-mag.csv / {i}-time.csv``
      for segments i = 1..9; loc = [n, 2] positions, mag = [n, 3] field),
      concatenated exactly as the reference does with segment ids, or
    - a ``.mat`` file with pre-concatenated ``x [n,2], y [n,3], s [n]``.

    Returns (x [n, 2], y [n, 3], s [n] int segment ids). A tiny
    synthetically-generated fixture in the repository layout is vendored
    at ``rbslam_tpu/data/assets/aaltoml_fixture`` for tests
    (scripts/make_aaltoml_fixture.py).
    """
    if os.path.isdir(path):
        base = os.path.join(path, "data", sensor)
        xs, ys, ss = [], [], []
        for i in range(1, 10):
            loc = np.loadtxt(os.path.join(base, f"{i}-loc.csv"),
                             delimiter=",")
            mag = np.loadtxt(os.path.join(base, f"{i}-mag.csv"),
                             delimiter=",")
            xs.append(np.atleast_2d(loc)[:, :2])
            ys.append(np.atleast_2d(mag)[:, :3])
            ss.append(np.full(len(xs[-1]), i))
        return (np.concatenate(xs), np.concatenate(ys),
                np.concatenate(ss))
    import scipy.io as sio

    d = sio.loadmat(path)
    return d["x"], d["y"], d["s"].ravel()


def run(cfg: MagLocalizationConfig, video=None) -> dict:
    key = jax.random.PRNGKey(cfg.seed)
    key, k_field, k_pf, k_init = jax.random.split(key, 4)
    out = {"workload": "mag-localization-mapping"}

    use_real = cfg.data_path and os.path.exists(cfg.data_path)
    if not use_real:
        cfg = MagLocalizationConfig(
            **{**cfg.__dict__, "theta": cfg.synthetic_theta}
        )

    if use_real:
        x_all, y_all, s = _load_real_data(cfg.data_path)
        train = (s < 3) | (s == 4)
        x_train = np.concatenate(
            [x_all[train], np.zeros((train.sum(), 1))], -1
        )[::10]
        y_train = y_all[train][::10]
        test = s == 3
        x_test = np.concatenate([x_all[test], np.zeros((test.sum(), 1))], -1)[::50]
        y_test_nav = y_all[test][::50]
        out["data"] = "aaltoml-magnetic-data"
    else:
        x_train = _lawnmower(cfg.extent, cfg.n_map_lines)
        x_test = _test_loop(cfg.extent, cfg.n_test_steps)
        pad = 0.5
        LL_sim = np.stack(
            [
                [-cfg.extent - pad, -cfg.extent - pad, -1.0],
                [cfg.extent + pad, cfg.extent + pad, 1.0],
            ]
        )
        draw = draw_scalar_potential_field(
            k_field,
            jnp.asarray(np.concatenate([x_train, x_test]), jnp.float32),
            cfg.m_sim, LL_sim, cfg.theta,
        )
        y_train = np.asarray(draw.y[: len(x_train)])
        y_test_nav = np.asarray(draw.y[len(x_train):])
        out["data"] = "synthetic"

    # --- mapping phase: fit the GP magnetic map ---
    pm = 0.2 * 2 * cfg.extent if out["data"] == "synthetic" else None
    lo = x_train.min(0)
    hi = x_train.max(0)
    rng = hi - lo
    pad = 0.2 * np.min(rng[rng > 0])
    LL = np.stack([lo - pad, hi + pad])
    with Timer() as t_fit:
        gp = fit_scalar_potential_gp(
            x_train, y_train, cfg.m_basis, LL, cfg.theta,
            optimize=cfg.optimize_hyperparams,
        )
    out["gp"] = {
        "nll": gp.nll,
        "theta": [float(v) for v in gp.theta],
        "fit_s": t_fit.elapsed,
    }

    # map quality: predictive error on the (held-out) test path
    mean_test, var_test = gp.predict_gradient(
        jnp.asarray(x_test, jnp.float32)
    )
    out["gp"]["test_rmse"] = float(
        jnp.sqrt(jnp.mean((mean_test - jnp.asarray(y_test_nav)) ** 2))
    )

    # --- localization phase ---
    quat, R = _heading_quats(x_test)
    # R is body-from-nav; the model predicts quat_to_rmat(q)^T @ mean_nav,
    # so q must represent nav-from-body = R^T (same convention as the
    # dense-mag pipeline, generateData_dense.m:252-257)
    quat = np.asarray(rmat_to_quat(jnp.asarray(R.transpose(0, 2, 1))))
    y_body = np.einsum("tij,tj->ti", R, y_test_nav)
    dpos = np.diff(x_test, axis=0)
    dquat = np.asarray(
        qmul(qinv(jnp.asarray(quat[:-1])), jnp.asarray(quat[1:]))
    )
    u = jnp.asarray(np.concatenate([dpos, dquat], -1), jnp.float32)

    model = make_terrain_model(
        gp.potential,
        gp.mean_weights,
        gp.chol,
        float(gp.theta[3]),
        mode=cfg.weight_mode,
    )

    # wrap dynamics/log_weight to work in the GP's centered frame
    center = jnp.asarray(gp.center, jnp.float32)

    def log_weight(y_t, xn):
        xc = jnp.concatenate([xn[:3] - center, xn[3:7]])
        return model.log_weight(y_t, xc)

    # particles spread uniformly over the training area (:156-161)
    n_p = cfg.n_particles
    k1, k2 = jax.random.split(k_init)
    init = np.tile(
        np.concatenate([x_test[0], quat[0]]), (n_p, 1)
    ).astype(np.float32)
    init[:, 0] = np.asarray(
        jax.random.uniform(k1, (n_p,), minval=lo[0], maxval=hi[0])
    )
    init[:, 1] = np.asarray(
        jax.random.uniform(k2, (n_p,), minval=lo[1], maxval=hi[1])
    )

    with Timer() as t_pf:
        res = run_pf_localization(
            k_pf, model.dynamics, log_weight,
            u, jnp.asarray(y_body, jnp.float32), jnp.asarray(init),
            default_Q(), cfg.dt,
            PFConfig(
                n_particles=n_p,
                resampling=cfg.resampling,
                ess_threshold=cfg.ess_threshold,
                store_trajectories=video is not None,
            ),
        )
        jax.block_until_ready(res.traj_mean)
    T = y_body.shape[0]
    err = np.linalg.norm(
        np.asarray(res.traj_mean[:, :2]) - x_test[:, :2], axis=-1
    )
    burn = T // 3
    out["pf"] = {
        "n_particles": n_p,
        "mean_err_after_burnin": float(err[burn:].mean()),
        "final_err": float(err[-5:].mean()),
        "ess_min": float(res.ess.min()),
        "time_s": t_pf.elapsed,
        "particle_steps_per_s": n_p * T / t_pf.elapsed,
    }
    if video is not None:
        # robot-pf.mp4 analog: global localization converging on the GP
        # magnetic map — offline render from the scan's stored cloud
        from ..viz.animation import animate_particle_cloud

        n_grid = 60
        gx = np.linspace(lo[0], hi[0], n_grid)
        gy = np.linspace(lo[1], hi[1], n_grid)
        GX, GY = np.meshgrid(gx, gy)
        pts = np.stack([GX.ravel(), GY.ravel(), np.zeros(GX.size)], -1)
        mean_g, _ = gp.predict_gradient(jnp.asarray(pts, jnp.float32))
        img = np.linalg.norm(np.asarray(mean_g), axis=-1).reshape(
            n_grid, n_grid
        )
        n_frames = animate_particle_cloud(
            video,
            np.asarray(res.xn_hist),
            traj_mean=np.asarray(res.traj_mean[:, :2]),
            truth=x_test[:, :2],
            background=((lo[0], hi[0], lo[1], hi[1]), img),
            title="magnetic terrain localization — PF",
        )
        out["pf"]["video"] = {"path": video, "frames": n_frames}
    return out


def main(argv=None):
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--particles", type=int, default=1000)
    ap.add_argument("--basis", type=int, default=1000)
    ap.add_argument("--no-optimize", action="store_true",
                    help="skip ML-II hyperparameter optimization (the "
                         "reference optimizes by default, main.m:117)")
    ap.add_argument("--weight-mode", default="product",
                    choices=["product", "sum"])
    ap.add_argument("--data", default=None,
                    help="AaltoML magnetic-data: path to the cloned "
                         "dataset repository root (data/<sensor>/*.csv "
                         "layout) or a pre-converted .mat")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--video", default=None, metavar="GIF",
                    help="write a localization animation "
                         "(robot-pf.mp4 analog) to this .gif path")
    args = ap.parse_args(argv)
    cfg = MagLocalizationConfig(
        n_particles=200 if args.quick else args.particles,
        m_basis=256 if args.quick else args.basis,
        m_sim=512 if args.quick else 2000,
        n_test_steps=60 if args.quick else 160,
        optimize_hyperparams=not (args.no_optimize or args.quick),
        weight_mode=args.weight_mode,
        data_path=args.data,
        seed=args.seed,
    )
    report(run(cfg, video=args.video))


if __name__ == "__main__":
    main()
