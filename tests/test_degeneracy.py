"""Path-degeneracy demo (the reference's square_3D qualitative check,
degeneracy-{filter,smoother}.png): filter trajectory histories collapse
to few unique ancestral paths at early times, while CPF-AS smoother
samples stay diverse across sweeps."""

import jax
import jax.numpy as jnp
import numpy as np

from rbslam_tpu.engines import RBPFConfig, RBPSConfig, run_rbpf, run_rbps
from rbslam_tpu.workloads.dense_radio import DenseRadioConfig, build_problem


def _square_cfg():
    return DenseRadioConfig(
        traj_type="square_3D", n_steps=48, n_particles=50,
        n_sweeps=5, m_basis=32, m_sim=256,
    )


def test_filter_path_degeneracy_and_smoother_diversity():
    cfg = _square_cfg()
    key = jax.random.PRNGKey(0)
    data, model, basis, k, Q, R = build_problem(cfg, key)

    res = run_rbpf(
        jax.random.PRNGKey(1), model, data.dx, data.y, data.init_state,
        jnp.zeros(basis.m), jnp.diag(k), Q, R, 1.0,
        RBPFConfig(n_particles=cfg.n_particles),
    )
    # reconstructed histories at an early step: multinomial resampling
    # every step collapses ancestry (src/particleFilter.m:117-118 demo)
    early = np.asarray(res.xn_traj[5])            # [N_P, 3]
    n_unique_early = len(np.unique(early.round(6), axis=0))
    late = np.asarray(res.xn_traj[-1])
    n_unique_late = len(np.unique(late.round(6), axis=0))
    assert n_unique_early < cfg.n_particles // 5, n_unique_early
    assert n_unique_late == cfg.n_particles

    res_s = run_rbps(
        jax.random.PRNGKey(2), model, data.dx, data.y, data.init_state,
        jnp.zeros(basis.m), jnp.diag(k), Q, R, 1.0,
        RBPSConfig(n_particles=cfg.n_particles, n_sweeps=cfg.n_sweeps),
    )
    # smoother samples differ between sweeps (not stuck on one path)
    paths = np.asarray(res_s.XNK)[:, :, :2]       # [K, T, 2]
    dists = [
        np.linalg.norm(paths[i] - paths[j], axis=-1).mean()
        for i in range(cfg.n_sweeps)
        for j in range(i + 1, cfg.n_sweeps)
    ]
    assert max(dists) > 1e-3, dists
    assert np.all(np.isfinite(paths))
