"""Localization PF, dense EKF, sparse RBPF/RBPS, GP regression tests."""

import jax
import jax.numpy as jnp
import numpy as np

from rbslam_tpu.engines import (
    PFConfig,
    RBPFConfig,
    RBPSConfig,
    run_pf_localization,
    run_rbpf,
    run_rbps,
)


def test_pf_localization_tracks_1d_map():
    """PF on a toy scalar terrain: particles converge to the true path."""
    T, n_p = 40, 400

    def field(p):  # smooth informative scalar field over 2D
        return jnp.sin(2.0 * p[0]) + jnp.cos(3.0 * p[1]) + 0.5 * p[0]

    truth = jnp.stack(
        [jnp.linspace(-1, 1, T), jnp.sin(jnp.linspace(0, 3, T))], -1
    )
    y = jax.vmap(field)(truth) + 0.05 * jax.random.normal(
        jax.random.PRNGKey(0), (T,)
    )
    u = jnp.diff(truth, axis=0)

    def dynamics(key, xn, u_t, dt, Q):
        return xn + u_t + 0.02 * jax.random.normal(key, xn.shape)

    def log_weight(y_t, xn):
        return -0.5 * jnp.sum(((y_t - field(xn)) / 0.1) ** 2)

    init = jax.random.uniform(
        jax.random.PRNGKey(1), (n_p, 2), minval=-1.5, maxval=1.5
    )
    res = run_pf_localization(
        jax.random.PRNGKey(2), dynamics, log_weight, u, y[:, None], init,
        jnp.eye(2), 1.0,
        PFConfig(n_particles=n_p, resampling="systematic",
                 ess_threshold=0.5),
    )
    err = jnp.linalg.norm(res.traj_mean - truth, axis=-1)
    assert float(err[T // 2:].mean()) < 0.3, np.asarray(err)


def test_pf_every_step_resampling_mode():
    """ess_threshold=1.0 resamples every step (reference semantics)."""

    def dynamics(key, xn, u_t, dt, Q):
        return xn + 0.1 * jax.random.normal(key, xn.shape)

    def log_weight(y_t, xn):
        return -0.5 * jnp.sum((xn - y_t) ** 2)

    T, n_p = 10, 64
    y = jnp.zeros((T, 2))
    res = run_pf_localization(
        jax.random.PRNGKey(0), dynamics, log_weight,
        jnp.zeros((T - 1, 2)), y,
        jnp.ones((n_p, 2)), jnp.eye(2), 1.0,
        PFConfig(n_particles=n_p, ess_threshold=1.0),
    )
    assert bool(jnp.all(jnp.isfinite(res.logw)))


def _sparse_toy(key, n_landmarks=6, T=30):
    """Tiny pinhole SLAM problem."""
    from rbslam_tpu.models import PinholeCamera, make_pinhole2d_model
    from rbslam_tpu.models.pinhole2d import project

    cam = PinholeCamera(f=1.5, fp=0.0, fw=1.0)
    model = make_pinhole2d_model(cam, n_landmarks)
    k1, k2, k3 = jax.random.split(key, 3)
    landmarks = jax.random.uniform(
        k1, (n_landmarks, 2), minval=-2.0, maxval=2.0
    )
    th = jnp.linspace(0, 2 * jnp.pi, T)
    pos = 3.0 * jnp.stack([jnp.cos(th), jnp.sin(th)], -1)
    heading = th + jnp.pi  # face the center
    truth = jnp.concatenate([pos, heading[:, None]], -1)

    def obs(xn):
        y, nv = project(cam, xn, landmarks)
        return jnp.where(nv, jnp.nan, y)

    y = jax.vmap(obs)(truth) + 0.01 * jax.random.normal(
        k2, (T, n_landmarks)
    )
    u = jnp.diff(truth, axis=0)
    return model, landmarks, truth, y, u


def test_sparse_rbpf_and_rbps():
    key = jax.random.PRNGKey(3)
    model, landmarks, truth, y, u = _sparse_toy(key)
    n_p = 30
    M = landmarks.shape[0]
    x0_lin = landmarks.reshape(-1)[None, :] + 0.3 * jax.random.normal(
        jax.random.PRNGKey(4), (n_p, 2 * M)
    )
    Q = jnp.diag(jnp.asarray([0.05**2, 0.05**2, 0.01**2]))
    R = 0.01 * jnp.eye(M)
    res = run_rbpf(
        jax.random.PRNGKey(5), model, u, y, truth[0],
        x0_lin, 0.5 * jnp.eye(2 * M), Q, R, 1.0,
        RBPFConfig(n_particles=n_p),
    )
    assert bool(jnp.all(jnp.isfinite(res.logw)))
    err_map = jnp.linalg.norm(
        res.xl_mean.reshape(M, 2) - landmarks, axis=-1
    )
    assert float(err_map.mean()) < 0.5, np.asarray(err_map)

    cfg = RBPSConfig(n_particles=10, n_sweeps=2)
    res_s = run_rbps(
        jax.random.PRNGKey(6), model, u, y, truth[0],
        x0_lin[:10], 0.5 * jnp.eye(2 * M), Q, R, 1.0, cfg,
    )
    assert np.all(np.isfinite(np.asarray(res_s.XNK)))


def test_ekf_dense_runs_and_tracks():
    from rbslam_tpu.basis import ScalarPotentialBasis, hypercube_basis
    from rbslam_tpu.basis.spectral import linear_plus_se_spectral
    from rbslam_tpu.data import simulate_dense_dataset
    from rbslam_tpu.engines import run_ekf_dense
    from rbslam_tpu.metrics import aligned_position_rmse
    from rbslam_tpu.models.mag3d import dynamics_with_increment
    from rbslam_tpu.workloads.dense_mag import default_Q

    theta = (650.0, 1.2, 200.0, 10.0)
    data = simulate_dense_dataset(
        jax.random.PRNGKey(0), "bean_6D", theta, default_Q(), 0.01,
        dynamics_with_increment, m_sim=128,
        traj_kwargs={"n_laps": 1, "n_per_lap": 48}, with_grid=False,
    )
    potential = ScalarPotentialBasis(hypercube_basis(48, data.LL))
    k = linear_plus_se_spectral(
        jnp.asarray(np.sqrt(potential.basis.eigenvalues), jnp.float32),
        *theta[:3], 3,
    )
    n = 6 + potential.n_lin
    x0 = jnp.concatenate([data.init_state[:3], jnp.zeros(3),
                          jnp.zeros(potential.n_lin)])
    P0 = jnp.zeros((n, n)).at[6:, 6:].set(jnp.diag(k))
    res = run_ekf_dense(
        potential, data.dx, data.y, x0, data.init_state[3:7], P0,
        default_Q(), theta[3] * jnp.eye(3), 0.01,
    )
    assert np.all(np.isfinite(np.asarray(res.x_traj)))
    rmse = float(
        aligned_position_rmse(jnp.asarray(data.pos), res.x_traj[:, :3])
    )
    assert rmse < 2.0, rmse


def test_gp_regression_recovers_field():
    from rbslam_tpu.data.fields import draw_scalar_potential_field
    from rbslam_tpu.gp import fit_scalar_potential_gp

    LL = np.array([[-2.0, -2.0, -0.5], [2.0, 2.0, 0.5]])
    key = jax.random.PRNGKey(0)
    xs = jax.random.uniform(key, (300, 3), minval=-1.8, maxval=1.8)
    xs = xs.at[:, 2].multiply(0.2)
    theta = (5.0, 0.8, 20.0, 0.5)
    d = draw_scalar_potential_field(key, xs, 256, LL, theta)
    gp = fit_scalar_potential_gp(
        np.asarray(xs), np.asarray(d.y), 128, LL, theta, optimize=False
    )
    mean, var = gp.predict_gradient(xs)
    rmse = float(jnp.sqrt(jnp.mean((mean - d.df) ** 2)))
    assert rmse < 3.0, rmse
    assert np.isfinite(gp.nll)


def test_gp_hyperparameter_optimization_improves_nll():
    from rbslam_tpu.data.fields import draw_scalar_potential_field
    from rbslam_tpu.gp import fit_scalar_potential_gp

    LL = np.array([[-2.0, -2.0, -0.5], [2.0, 2.0, 0.5]])
    key = jax.random.PRNGKey(1)
    xs = jax.random.uniform(key, (200, 3), minval=-1.8, maxval=1.8)
    theta_true = (5.0, 0.8, 20.0, 0.5)
    d = draw_scalar_potential_field(key, xs, 256, LL, theta_true)
    theta_bad = (5.0, 0.3, 5.0, 2.0)
    gp0 = fit_scalar_potential_gp(
        np.asarray(xs), np.asarray(d.y), 64, LL, theta_bad, optimize=False
    )
    gp1 = fit_scalar_potential_gp(
        np.asarray(xs), np.asarray(d.y), 64, LL, theta_bad,
        optimize=True, maxiter=30,
    )
    assert gp1.nll < gp0.nll - 1.0, (gp0.nll, gp1.nll)


def test_gridded_terrain_matches_exact_and_localizes():
    """Grid-interpolated terrain model tracks like the exact GP model."""
    import numpy as np
    import rbslam_tpu.workloads.mag_localization as ML
    from rbslam_tpu.data.fields import draw_scalar_potential_field
    from rbslam_tpu.gp import fit_scalar_potential_gp
    from rbslam_tpu.math.quaternions import qinv, qmul, rmat_to_quat
    from rbslam_tpu.models import (
        gridify_gp, make_gridded_terrain_model, make_terrain_model,
    )

    theta = (10.0, 1.0, 25.0, 4.0)
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 4)
    x_train = ML._lawnmower(4.0, 11)
    x_test = ML._test_loop(4.0, 80)
    LLs = np.stack([[-4.5, -4.5, -1.0], [4.5, 4.5, 1.0]])
    d = draw_scalar_potential_field(
        ks[1], jnp.asarray(np.concatenate([x_train, x_test]), jnp.float32),
        512, LLs, theta,
    )
    ytr = np.asarray(d.y[: len(x_train)])
    yte = np.asarray(d.y[len(x_train):])
    lo, hi = x_train.min(0), x_train.max(0)
    rng = hi - lo
    pad = 0.2 * np.min(rng[rng > 0])
    LL = np.stack([lo - pad, hi + pad])
    gp = fit_scalar_potential_gp(x_train, ytr, 128, LL, theta,
                                 optimize=False)

    mean_g, var_g, glo, gsp = gridify_gp(gp, LL[0], LL[1], n=(128, 128))
    model_g = make_gridded_terrain_model(
        mean_g, var_g, glo, gsp, float(gp.theta[3])
    )
    # interp vs exact at test points (in the GP's centered frame)
    pts_c = jnp.asarray(x_test[:20], jnp.float32) - jnp.asarray(
        gp.center, jnp.float32
    )
    m_exact, v_exact = gp.predict_gradient(jnp.asarray(x_test[:20]))
    m_grid, v_grid = model_g.predict_field(pts_c)
    np.testing.assert_allclose(np.asarray(m_grid), np.asarray(m_exact),
                               atol=0.3)

    # PF localization on the gridded map
    from rbslam_tpu.engines import PFConfig, run_pf_localization

    quat, R = ML._heading_quats(x_test)
    quat = np.asarray(rmat_to_quat(jnp.asarray(R.transpose(0, 2, 1))))
    y_body = np.einsum("tij,tj->ti", R, yte)
    dpos = np.diff(x_test, axis=0)
    dquat = np.asarray(
        qmul(qinv(jnp.asarray(quat[:-1])), jnp.asarray(quat[1:]))
    )
    u = jnp.asarray(np.concatenate([dpos, dquat], -1), jnp.float32)
    center = jnp.asarray(gp.center, jnp.float32)

    def log_weight(y_t, xn):
        return model_g.log_weight(
            y_t, jnp.concatenate([xn[:3] - center, xn[3:7]])
        )

    n_p = 300
    k1, k2 = jax.random.split(ks[3])
    init = np.tile(np.concatenate([x_test[0], quat[0]]), (n_p, 1)).astype(
        np.float32
    )
    init[:, 0] = np.asarray(
        jax.random.uniform(k1, (n_p,), minval=lo[0], maxval=hi[0])
    )
    init[:, 1] = np.asarray(
        jax.random.uniform(k2, (n_p,), minval=lo[1], maxval=hi[1])
    )
    res = run_pf_localization(
        ks[2], model_g.dynamics, log_weight, u,
        jnp.asarray(y_body, jnp.float32), jnp.asarray(init),
        ML.default_Q(), 0.1,
        PFConfig(n_particles=n_p, resampling="systematic",
                 ess_threshold=0.5),
    )
    err = np.linalg.norm(
        np.asarray(res.traj_mean[:, :2]) - x_test[:, :2], axis=-1
    )
    assert float(err[-10:].mean()) < 1.0, err[-10:]


def test_ekf_dense_batched_matches_sequential():
    """run_ekf_dense_batched (one vmapped scan over MC runs — the
    batched engine behind the --compare sweep, main.m:37-60) equals the
    sequential EKF run-for-run."""
    from rbslam_tpu.engines import run_ekf_dense, run_ekf_dense_batched
    from rbslam_tpu.workloads.dense_mag import DenseMagConfig, build_problem

    cfg = DenseMagConfig(m_basis=32, m_sim=64, n_laps=1, n_per_lap=24)
    builds = []
    for i in range(3):
        k = jax.random.split(jax.random.PRNGKey(1 + i), 4)[1]
        builds.append(
            build_problem(DenseMagConfig(**{**cfg.__dict__, "seed": 1 + i}), k)
        )
    data0, _, _, potential, center, k_sd, Q, R = builds[0]
    n = 6 + potential.n_lin
    x0 = jnp.concatenate([
        data0.init_state[:3] - center, jnp.zeros(3),
        jnp.zeros(potential.n_lin),
    ])
    q0 = data0.init_state[3:7]
    P0 = jnp.zeros((n, n)).at[6:, 6:].set(jnp.diag(k_sd))
    seq = [
        run_ekf_dense(potential, b[0].dx, b[1], x0, q0, P0, Q, R, 0.01)
        for b in builds
    ]
    bat = run_ekf_dense_batched(
        potential,
        jnp.stack([b[0].dx for b in builds]),
        jnp.stack([b[1] for b in builds]),
        x0, q0, P0, Q, R, 0.01,
    )
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(bat.x_traj[i]), np.asarray(seq[i].x_traj), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(bat.q_traj[i]), np.asarray(seq[i].q_traj), atol=1e-5
        )


def test_dense_mag_comparison_quick():
    """run_comparison end-to-end (batched EKF + PF + PS) at a tiny
    config: finite RMSEs for every engine at every disturbance."""
    from rbslam_tpu.workloads.dense_mag import DenseMagConfig, run_comparison

    out = run_comparison(
        DenseMagConfig(n_particles=8, n_sweeps=1, m_basis=32, m_sim=64,
                       n_laps=1, n_per_lap=24),
        disturbances=(0.0, 5.0), n_sim=2,
    )
    for o, row in out["rmse_by_disturbance"].items():
        for eng in ("ekf", "pf", "ps"):
            assert np.isfinite(row[eng]["mean"]), (o, eng)
            assert np.isfinite(row[eng]["median"])
    assert len(out["raw"]["0.0"]["ekf"]) == 2
