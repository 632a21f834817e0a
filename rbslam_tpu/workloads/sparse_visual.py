"""Sparse visual-SLAM workload (examples/slam-sparse-visual/).

Reference config (main.m, pfslam.m, psslam.m): 20 landmarks, 197-step
bean curve, pinhole camera (f=1.5, fp=0, fw=1); PF with N_P=100; PS with
N_K=10, N_P=10; initMapVar=4^2, noiseVar=.1^2, guessMapVar=1^2,
Q=blkdiag(.1^2 I2, .001^2), seed 42; per-particle randomized initial maps
(pfslam.m:91); metrics: Procrustes path/map RMSE from the map
correspondence (calc_rmses.m).
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..data.sparse_visual import load_sparse_visual
from ..engines import RBPFConfig, RBPSConfig, run_rbpf, run_rbps
from ..metrics import map_and_path_rmse
from ..models import make_pinhole2d_model
from .common import Timer, report


@dataclass(frozen=True)
class SparseVisualConfig:
    n_particles_pf: int = 100
    n_particles_ps: int = 10
    n_sweeps: int = 10
    init_map_var: float = 4.0**2
    noise_var: float = 0.1**2
    guess_map_var: float = 1.0**2
    n_shuffle: int = 0
    resampling: str = "multinomial"
    run_filter: bool = True
    run_smoother: bool = True
    seed: int = 42


def build_problem(cfg: SparseVisualConfig, key):
    data = load_sparse_visual(key, n_shuffle=cfg.n_shuffle)
    M = data.landmarks.shape[0]
    model = make_pinhole2d_model(data.camera, M)
    Q = jnp.asarray(
        np.diag([0.1**2, 0.1**2, 0.001**2]), jnp.float32
    )  # pfslam.m:93
    R = cfg.noise_var * jnp.eye(M)
    x0_nonlin = jnp.asarray(
        np.concatenate([data.init_pos, [data.init_theta]]), jnp.float32
    )
    return data, model, Q, R, x0_nonlin


def _init_maps(key, landmarks, n_particles, guess_var):
    """Per-particle randomized initial maps (pfslam.m:91)."""
    flat = jnp.asarray(landmarks.reshape(-1), jnp.float32)
    noise = jax.random.normal(key, (n_particles, flat.shape[0]))
    return flat[None, :] + jnp.sqrt(guess_var) * noise


def run(cfg: SparseVisualConfig, plot_dir=None, video=None,
        ps_video=None) -> dict:
    key = jax.random.PRNGKey(cfg.seed)
    key, k_data, k_map_f, k_map_s, k_f, k_s = jax.random.split(key, 6)
    data, model, Q, R, x0 = build_problem(cfg, k_data)
    truth_map = data.landmarks
    truth_traj = data.ground_truth
    out = {
        "workload": "slam-sparse-visual",
        "n_landmarks": int(truth_map.shape[0]),
        "n_steps": int(data.y.shape[0]),
    }

    if cfg.run_filter:
        x0_lin = _init_maps(
            k_map_f, truth_map, cfg.n_particles_pf, cfg.guess_map_var
        )
        with Timer() as t_f:
            res = run_rbpf(
                k_f, model, data.u, data.y, x0,
                x0_lin, cfg.init_map_var * jnp.eye(x0_lin.shape[1]),
                Q, R, 1.0,
                RBPFConfig(
                    n_particles=cfg.n_particles_pf,
                    resampling=cfg.resampling,
                ),
            )
            jax.block_until_ready(res.traj_mean)
        rmse_path, rmse_map = map_and_path_rmse(
            truth_map, np.asarray(res.xl_mean).reshape(-1, 2),
            truth_traj, np.asarray(res.traj_mean),
        )
        out["pf"] = {
            "rmse_path": float(rmse_path),
            "rmse_map": float(rmse_map),
            "ess_min": float(res.ess.min()),
            "time_s": t_f.elapsed,
        }
        if plot_dir is not None:
            import os

            from ..viz import plot_landmark_map

            os.makedirs(plot_dir, exist_ok=True)
            plot_landmark_map(
                os.path.join(plot_dir, "sparse-visual-pf-map.png"),
                truth_map, np.asarray(res.xl_mean).reshape(-1, 2),
                traj=np.asarray(res.traj_mean[:, :2]),
                title="PF landmark map + mean trajectory",
            )
        if video is not None:
            # loop-pf.mp4 analog (plot_visual_slam_progress.m): offline
            # pass over the scan's stored per-step cloud — the filter
            # never blocked on the renderer
            from ..viz.animation import animate_particle_cloud

            n_frames = animate_particle_cloud(
                video,
                np.asarray(res.xn_hist),
                traj_mean=np.asarray(res.traj_mean[:, :2]),
                truth=np.asarray(truth_traj),
                landmarks_true=np.asarray(truth_map),
                landmarks_est=np.asarray(res.xl_mean).reshape(-1, 2),
                title="sparse visual SLAM — PF progress",
            )
            out["pf"]["video"] = {"path": video, "frames": n_frames}

    if cfg.run_smoother:
        x0_lin = _init_maps(
            k_map_s, truth_map, cfg.n_particles_ps, cfg.guess_map_var
        )
        with Timer() as t_s:
            res_s = run_rbps(
                k_s, model, data.u, data.y, x0,
                x0_lin, cfg.init_map_var * jnp.eye(x0_lin.shape[1]),
                Q, R, 1.0,
                RBPSConfig(
                    n_particles=cfg.n_particles_ps,
                    n_sweeps=cfg.n_sweeps,
                    resampling=cfg.resampling,
                ),
            )
            jax.block_until_ready(res_s.XNK)
        # mean path and map over sweeps 2..K (psslam.m:126-128)
        xnk = jnp.mean(res_s.XNK[1:], axis=0)
        xlk = jnp.mean(res_s.XLK[1:], axis=0)
        rmse_path, rmse_map = map_and_path_rmse(
            truth_map, np.asarray(xlk).reshape(-1, 2),
            truth_traj, np.asarray(xnk),
        )
        out["ps"] = {
            "rmse_path": float(rmse_path),
            "rmse_map": float(rmse_map),
            "time_s": t_s.elapsed,
        }
        if ps_video is not None:
            # loop-ps.mp4 analog: one frame per CPF-AS sweep showing the
            # sampled trajectory + landmark map (psslam.m:126-136)
            from ..viz.animation import animate_smoother_sweeps

            n_frames = animate_smoother_sweeps(
                ps_video,
                np.asarray(res_s.XNK[:, :, :2]),
                XLK=np.asarray(res_s.XLK),
                truth=np.asarray(truth_traj),
                landmarks_true=np.asarray(truth_map),
                title="sparse visual SLAM — smoother",
            )
            out["ps"]["video"] = {"path": ps_video, "frames": n_frames}
    return out


def main(argv=None):
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--particles", type=int, default=100)
    ap.add_argument("--ps-particles", type=int, default=10)
    ap.add_argument("--sweeps", type=int, default=10)
    ap.add_argument("--shuffle", type=int, default=0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--plots", default=None, metavar="DIR")
    ap.add_argument("--video", default=None, metavar="GIF",
                    help="write a PF progress animation "
                         "(loop-pf.mp4 analog) to this .gif path")
    ap.add_argument("--ps-video", default=None, metavar="GIF",
                    help="write a smoother per-sweep animation "
                         "(loop-ps.mp4 analog) to this .gif path")
    args = ap.parse_args(argv)
    cfg = SparseVisualConfig(
        n_particles_pf=20 if args.quick else args.particles,
        n_particles_ps=5 if args.quick else args.ps_particles,
        n_sweeps=2 if args.quick else args.sweeps,
        n_shuffle=args.shuffle,
        seed=args.seed,
    )
    report(run(cfg, plot_dir=args.plots, video=args.video,
               ps_video=args.ps_video))


if __name__ == "__main__":
    main()
