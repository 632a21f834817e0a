"""RBPF engine tests: KF-equivalence vs batch GP regression, and an
end-to-end dense-radio run with an RMSE gate (SURVEY §4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rbslam_tpu.basis import hypercube_basis, se_spectral_density
from rbslam_tpu.basis.laplace import domain_center
from rbslam_tpu.data import simulate_dense_dataset
from rbslam_tpu.engines import RBPFConfig, run_rbpf
from rbslam_tpu.metrics import aligned_position_rmse
from rbslam_tpu.models import make_radio2d_model

THETA = (0.25, 2.0, 0.01)


def _radio_setup(m_est=32):
    """Dense-radio line workload at test scale
    (run_dense2D_withHeading.m:65-77,108-128)."""
    n = 32
    Qvec = 1e-6 * np.ones(n)
    Qvec[n // 2 - 1] = 0.3**2          # heading spike at t = N/2
    Q = jnp.asarray(Qvec[: n - 1].reshape(-1, 1, 1))

    # a throwaway model for data generation (basis not needed there)
    basis0 = hypercube_basis(4, np.array([1.0, 1.0]))
    gen_model = make_radio2d_model(basis0)

    data = simulate_dense_dataset(
        jax.random.PRNGKey(1),
        "line_3D",
        THETA,
        Q,
        1.0,
        gen_model.dynamics,
        m_sim=256,
        with_grid=False,
    )

    basis = hypercube_basis(m_est, data.LL)
    center = jnp.asarray(domain_center(data.LL), jnp.float32)

    model = make_radio2d_model(basis, center=center)
    k = se_spectral_density(
        jnp.asarray(np.sqrt(basis.eigenvalues), jnp.float32),
        THETA[0], THETA[1], 2,
    )
    return data, model, basis, center, k, Q


def test_rbpf_single_particle_equals_batch_gp():
    """With 1 particle and zero process noise the trajectory is fixed, so
    the final (xl, P) must equal the batch reduced-rank GP posterior on
    that trajectory (SURVEY §4 gate (a))."""
    data, model, basis, center, k, _ = _radio_setup()
    T = data.y.shape[0]
    Q0 = jnp.full((T - 1, 1, 1), 1e-20)  # freeze heading noise

    cfg = RBPFConfig(n_particles=1)
    res = run_rbpf(
        jax.random.PRNGKey(0), model, data.dx, data.y,
        data.init_state, jnp.zeros(basis.m), jnp.diag(k),
        Q0, jnp.array([[THETA[2]]]), 1.0, cfg,
    )

    # batch posterior at the traversed positions
    path = res.xn_traj[:, 0, :2] - center
    Phi = basis.phi(path)
    sigma2 = THETA[2]
    A = Phi.T @ Phi / sigma2 + jnp.diag(1.0 / k)
    xl_batch = jnp.linalg.solve(A, Phi.T @ data.y[:, 0] / sigma2)
    P_batch = jnp.linalg.inv(A)

    np.testing.assert_allclose(
        np.asarray(res.xl), np.asarray(xl_batch)[None], atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(res.P[0]), np.asarray(P_batch), atol=5e-3
    )


@pytest.mark.parametrize("scheme", ["multinomial", "systematic"])
def test_rbpf_dense_radio_rmse_gate(scheme):
    """End-to-end filter on the line workload: Procrustes RMSE under a
    loose gate (odometry-only drift is much larger than the gate)."""
    data, model, basis, center, k, Q = _radio_setup()
    cfg = RBPFConfig(n_particles=100, resampling=scheme)
    res = run_rbpf(
        jax.random.PRNGKey(2), model, data.dx, data.y,
        data.init_state, jnp.zeros(basis.m), jnp.diag(k),
        Q, jnp.array([[THETA[2]]]), 1.0, cfg,
    )
    rmse = float(
        aligned_position_rmse(jnp.asarray(data.pos), res.traj_mean[:, :2])
    )
    assert np.isfinite(rmse)
    assert rmse < 0.5, rmse
    assert np.all(np.isfinite(np.asarray(res.logw)))
    assert float(res.ess.min()) > 0.5


def test_rbpf_outputs_shapes():
    data, model, basis, center, k, Q = _radio_setup()
    cfg = RBPFConfig(n_particles=8)
    res = run_rbpf(
        jax.random.PRNGKey(3), model, data.dx, data.y,
        data.init_state, jnp.zeros(basis.m), jnp.diag(k),
        Q, jnp.array([[THETA[2]]]), 1.0, cfg,
    )
    T = data.y.shape[0]
    assert res.traj_max.shape == (T, 3)
    assert res.xn_traj.shape == (T, 8, 3)
    assert res.ancestors.shape == (T - 1, 8)
    assert res.P_mean.shape == (basis.m, basis.m)
    # trajectory reconstruction consistency: last slice is the final xn
    np.testing.assert_allclose(res.xn_traj[-1], res.xn)


def test_rbpf_adaptive_resampling():
    """ESS-triggered resampling keeps accuracy at lower resampling rate."""
    data, model, basis, center, k, Q = _radio_setup()
    args = (
        model, data.dx, data.y, data.init_state,
        jnp.zeros(basis.m), jnp.diag(k), Q,
        jnp.array([[THETA[2]]]), 1.0,
    )
    res = run_rbpf(
        jax.random.PRNGKey(2), *args,
        RBPFConfig(n_particles=50, resampling="systematic",
                   ess_threshold=0.5),
    )
    rmse = float(
        aligned_position_rmse(jnp.asarray(data.pos), res.traj_mean[:, :2])
    )
    assert rmse < 0.5, rmse
    assert np.all(np.isfinite(np.asarray(res.logw)))


def test_rbpf_no_symmetrize_stays_stable():
    """symmetrize_cov=False (the reference filter's own semantics,
    src/particleFilter.m:198) must not drift: same RMSE ballpark, no
    jitter retries, and near-symmetric final covariances."""
    data, model, basis, center, k, Q = _radio_setup()
    args = (
        model, data.dx, data.y, data.init_state,
        jnp.zeros(basis.m), jnp.diag(k), Q,
        jnp.array([[THETA[2]]]), 1.0,
    )
    base = dict(n_particles=32, resampling="systematic")
    res_sym = run_rbpf(jax.random.PRNGKey(2), *args, RBPFConfig(**base))
    res_ns = run_rbpf(
        jax.random.PRNGKey(2), *args,
        RBPFConfig(**base, symmetrize_cov=False),
    )
    r_sym = float(
        aligned_position_rmse(jnp.asarray(data.pos), res_sym.traj_mean[:, :2])
    )
    r_ns = float(
        aligned_position_rmse(jnp.asarray(data.pos), res_ns.traj_mean[:, :2])
    )
    assert abs(r_sym - r_ns) < 0.1, (r_sym, r_ns)
    assert int(res_ns.chol_retries) == 0
    asym = np.max(np.abs(np.asarray(
        res_ns.P - np.swapaxes(np.asarray(res_ns.P), -1, -2)
    )))
    assert asym < 1e-4, asym


def test_bf16_cov_fenced_at_reference_scale():
    """bf16 covariance at n_lin=515 (the dense-mag reference scale) is a
    measured NaN source in the filter (RESULTS.md) — the engine must
    refuse it rather than silently diverge, and the override flag must
    lift the fence."""
    import pytest

    from rbslam_tpu.engines import RBPFConfig, run_rbpf
    from rbslam_tpu.models.base import DenseModel

    n_lin = 515
    T = 3

    def jac(xn):
        return jnp.zeros((3, n_lin))

    def dyn(key, xn, u, dt, Q):
        return xn

    model = DenseModel(dynamics=dyn, dyn_residual=None,
                       meas_jacobian=jac, n_nonlin=7, n_lin=n_lin, ny=3)
    args = (
        model, jnp.zeros((T - 1, 7)), jnp.zeros((T, 3)), jnp.zeros(7),
        jnp.zeros(n_lin), jnp.eye(n_lin), jnp.eye(6), jnp.eye(3), 0.01,
    )
    with pytest.raises(ValueError, match="bfloat16.*destabilizes"):
        run_rbpf(jax.random.PRNGKey(0), *args,
                 RBPFConfig(n_particles=2, cov_dtype="bfloat16"))
    # override flag lifts the fence; small n_lin never fences
    res = run_rbpf(jax.random.PRNGKey(0), *args,
                   RBPFConfig(n_particles=2, cov_dtype="bfloat16",
                              allow_bf16_large_nl=True))
    assert np.all(np.isfinite(np.asarray(res.logw)))


def test_rbpf_no_trajectory_storage():
    """store_trajectories=False skips the [T, N_P, dn] history tensors
    (the marginal memory cost at production ensemble sizes, e.g.
    N_P=131072) while leaving every summary output and the ancestor
    record identical to the full run."""
    data, model, basis, center, k, Q = _radio_setup()
    args = (
        model, data.dx, data.y, data.init_state,
        jnp.zeros(basis.m), jnp.diag(k), Q,
        jnp.array([[THETA[2]]]), 1.0,
    )
    key = jax.random.PRNGKey(3)
    res_full = run_rbpf(key, *args, RBPFConfig(n_particles=16))
    res_slim = run_rbpf(
        key, *args, RBPFConfig(n_particles=16, store_trajectories=False)
    )
    assert res_slim.xn_hist.size == 0
    assert res_slim.xn_traj.size == 0
    np.testing.assert_allclose(
        np.asarray(res_full.traj_mean), np.asarray(res_slim.traj_mean),
        atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(res_full.ancestors), np.asarray(res_slim.ancestors)
    )
    np.testing.assert_allclose(
        np.asarray(res_full.xl_mean), np.asarray(res_slim.xl_mean),
        atol=1e-6,
    )
