"""Dense radio-SLAM workload (examples/slam-dense-radio/).

Reference configs: line_3D (N_T=32, heading-noise spike 0.3^2 at t=N/2)
and square_3D degeneracy demo (N_T=48, 0.1^2 spikes at the three corners)
(run_dense2D_withHeading.m:64-91); theta=[0.25;2;0.01], m=128 estimation
basis (:108), N_P=100 (:165), N_K sweeps of the smoother, nMC Monte Carlo
repetitions reusing the same field with fresh odometry/measurement noise
(main.m:24-27, :156-161).
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..basis import hypercube_basis, se_spectral_density
from ..basis.laplace import domain_center
from ..data import simulate_dense_dataset
from ..engines import (
    RBPFConfig,
    RBPSConfig,
    run_rbpf,
    run_rbps,
    run_rbps_information_form,
)
from ..metrics import aligned_position_rmse
from ..models import make_radio2d_model
from .common import Timer, report


@dataclass(frozen=True)
class DenseRadioConfig:
    traj_type: str = "line_3D"      # or "square_3D" (degeneracy demo)
    theta: tuple = (0.25, 2.0, 0.01)
    n_steps: int = 32               # 48 for square_3D
    n_particles: int = 100
    n_sweeps: int = 20
    n_mc: int = 1
    m_basis: int = 128
    m_sim: int = 2000
    resampling: str = "multinomial"
    smoother: str = "cpf_as"        # or "info_form"
    seed: int = 1
    dtype: str = "float32"
    with_grid: bool = False


def _process_noise(cfg: DenseRadioConfig):
    """Heading process-noise spikes (run_dense2D_withHeading.m:65-91)."""
    n = cfg.n_steps
    Qvec = 1e-6 * np.ones(n)
    if cfg.traj_type == "line_3D":
        Qvec[n // 2 - 1] = 0.3**2
    elif cfg.traj_type == "square_3D":
        for j in range(3):
            Qvec[n // 4 * (j + 1) - 1] = 0.1**2
    else:
        raise ValueError(f"unsupported traj_type {cfg.traj_type!r}")
    return jnp.asarray(Qvec[: n - 1].reshape(-1, 1, 1), jnp.float32)


def build_problem(cfg: DenseRadioConfig, key, field_weights=None):
    Q = _process_noise(cfg)
    gen_model = make_radio2d_model(hypercube_basis(4, np.array([1.0, 1.0])))
    data = simulate_dense_dataset(
        key, cfg.traj_type, cfg.theta, Q, 1.0, gen_model.dynamics,
        m_sim=cfg.m_sim,
        traj_kwargs={"n": cfg.n_steps},
        field_weights=field_weights,
        with_grid=cfg.with_grid,
    )
    basis = hypercube_basis(cfg.m_basis, data.LL)
    center = jnp.asarray(domain_center(data.LL), jnp.float32)
    model = make_radio2d_model(basis, center=center)
    k = se_spectral_density(
        jnp.asarray(np.sqrt(basis.eigenvalues), jnp.float32),
        cfg.theta[0], cfg.theta[1], 2,
    )
    R = jnp.array([[cfg.theta[2]]], jnp.float32)
    return data, model, basis, k, Q, R


def _make_plots(plot_dir, cfg, data, basis, res, res_s):
    """Figure-family analogs of the reference's committed PNGs
    (line-odometry / line-filter-{max,mean} / line-smoother /
    degeneracy-*; README.md:85-119)."""
    import os

    import numpy as np

    from ..basis.laplace import domain_center
    from ..viz import plot_degeneracy, plot_dense_map, plot_trajectories

    os.makedirs(plot_dir, exist_ok=True)
    tag = cfg.traj_type
    plot_trajectories(
        os.path.join(plot_dir, f"{tag}-odometry.png"),
        truth=data.pos,
        estimates=[np.asarray(data.odometry_path[:, :2])],
        labels=["odometry (dead reckoning)"],
        title="True trajectory vs odometry",
    )
    plot_trajectories(
        os.path.join(plot_dir, f"{tag}-filter.png"),
        truth=data.pos,
        estimates=[np.asarray(res.traj_max[:, :2]),
                   np.asarray(res.traj_mean[:, :2])],
        labels=["filter max-weight", "filter weighted mean"],
        title="Filter trajectories",
    )
    if data.grid is not None:
        center = domain_center(data.LL)
        x1t, x2t = data.grid["x1t"], data.grid["x2t"]
        X1, X2 = np.meshgrid(x1t, x2t)
        pts = np.stack([X1.ravel(), X2.ravel()], -1) - center[None, :2]
        import jax.numpy as jnp

        Phi = basis.phi(jnp.asarray(pts, jnp.float32))
        est = np.asarray(Phi @ res.xl_mean)
        var = np.asarray(
            jnp.einsum("ni,ij,nj->n", Phi, res.P_mean, Phi)
        )
        plot_dense_map(
            os.path.join(plot_dir, f"{tag}-map.png"),
            x1t, x2t, est, traj=np.asarray(res.traj_mean[:, :2]),
            uncertainty=np.sqrt(np.maximum(var, 0.0)),
            title="Estimated field map (alpha = posterior std)",
        )
    if res_s is not None:
        plot_degeneracy(
            os.path.join(plot_dir, f"{tag}-degeneracy.png"),
            np.asarray(res.xn_traj[:, :, :2]),
            np.asarray(res_s.XNK[:, :, :2]),
            truth=data.pos,
        )


def run(cfg: DenseRadioConfig, plot_dir=None) -> dict:
    key = jax.random.PRNGKey(cfg.seed)
    rmse_filter, rmse_smoother, times = [], [], {}
    field_weights = None
    for i_mc in range(cfg.n_mc):
        key, k_data, k_f, k_s = jax.random.split(key, 4)
        data, model, basis, k, Q, R = build_problem(
            cfg, k_data, field_weights
        )
        field_weights = data.field_weights
        pos_true = jnp.asarray(data.pos)

        with Timer() as t_f:
            res = run_rbpf(
                k_f, model, data.dx, data.y, data.init_state,
                jnp.zeros(basis.m), jnp.diag(k), Q, R, 1.0,
                RBPFConfig(
                    n_particles=cfg.n_particles, resampling=cfg.resampling
                ),
            )
            jax.block_until_ready(res.traj_mean)
        rmse_filter.append(
            [
                float(aligned_position_rmse(pos_true, res.traj_max[:, :2])),
                float(aligned_position_rmse(pos_true, res.traj_mean[:, :2])),
            ]
        )
        times.setdefault("filter_s", []).append(t_f.elapsed)

        res_s = None
        if cfg.n_sweeps > 0:
            smoother = (
                run_rbps_information_form
                if cfg.smoother == "info_form"
                else run_rbps
            )
            with Timer() as t_s:
                res_s = smoother(
                    k_s, model, data.dx, data.y, data.init_state,
                    jnp.zeros(basis.m), jnp.diag(k), Q, R, 1.0,
                    RBPSConfig(
                        n_particles=cfg.n_particles,
                        n_sweeps=cfg.n_sweeps,
                        resampling=cfg.resampling,
                    ),
                )
                jax.block_until_ready(res_s.XNK)
            rmse_smoother.append(
                [
                    float(aligned_position_rmse(pos_true, res_s.XNK[s, :, :2]))
                    for s in range(cfg.n_sweeps)
                ]
            )
            times.setdefault("smoother_s", []).append(t_s.elapsed)

        if plot_dir is not None and i_mc == 0:
            _make_plots(plot_dir, cfg, data, basis, res, res_s)

    rf = np.asarray(rmse_filter)
    out = {
        "workload": "slam-dense-radio",
        "traj_type": cfg.traj_type,
        "n_mc": cfg.n_mc,
        "rmse_filter_max_mean": rf.mean(0).tolist(),
        "rmse_filter_all": rf.tolist(),
        "times_s": {k_: float(np.mean(v)) for k_, v in times.items()},
    }
    if rmse_smoother:
        rs = np.asarray(rmse_smoother)
        out["rmse_smoother_per_sweep"] = rs.mean(0).tolist()
        out["rmse_smoother_final"] = float(rs[:, -1].mean())
    return out


def main(argv=None):
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--traj", default="line_3D",
                    choices=["line_3D", "square_3D"])
    ap.add_argument("--particles", type=int, default=100)
    ap.add_argument("--sweeps", type=int, default=20)
    ap.add_argument("--mc", type=int, default=1)
    ap.add_argument("--basis", type=int, default=128)
    ap.add_argument("--resampling", default="multinomial")
    ap.add_argument("--smoother", default="cpf_as",
                    choices=["cpf_as", "info_form"])
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--quick", action="store_true",
                    help="reduced config for smoke runs")
    ap.add_argument("--plots", default=None, metavar="DIR",
                    help="write figure PNGs (maps, trajectories, degeneracy)")
    args = ap.parse_args(argv)
    cfg = DenseRadioConfig(
        with_grid=args.plots is not None,
        traj_type=args.traj,
        n_steps=48 if args.traj == "square_3D" else 32,
        n_particles=20 if args.quick else args.particles,
        n_sweeps=3 if args.quick else args.sweeps,
        n_mc=args.mc,
        m_basis=32 if args.quick else args.basis,
        m_sim=256 if args.quick else 2000,
        resampling=args.resampling,
        smoother=args.smoother,
        seed=args.seed,
    )
    report(run(cfg, plot_dir=args.plots))


if __name__ == "__main__":
    main()
