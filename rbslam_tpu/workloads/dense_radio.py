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
        with_grid=False,
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


def run(cfg: DenseRadioConfig) -> dict:
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
    args = ap.parse_args(argv)
    cfg = DenseRadioConfig(
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
    report(run(cfg))


if __name__ == "__main__":
    main()
