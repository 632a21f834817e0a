import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rbslam_tpu.data import (
    draw_scalar_field,
    draw_scalar_potential_field,
    generate_trajectory,
    simulate_dense_dataset,
    TRAJECTORY_TYPES,
)
from rbslam_tpu.data.sparse_visual import load_sparse_visual
from rbslam_tpu.math.quaternions import qmul, qinv


@pytest.mark.parametrize("name", sorted(TRAJECTORY_TYPES))
def test_trajectory_generators(name):
    traj = generate_trajectory(name)
    T = traj.n_steps
    assert traj.dx.shape[0] == T - 1
    assert np.all(np.isfinite(traj.pos))
    if traj.quat is not None:
        norms = np.linalg.norm(traj.quat, axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)
        # increments recompose the trajectory: q_{t+1} = q_t ⊗ dq_t
        q = jnp.asarray(traj.quat)
        dq = jnp.asarray(traj.dx[:, -4:])
        q_next = qmul(q[:-1], dq)
        flip = jnp.sign(jnp.sum(q_next * q[1:], axis=-1, keepdims=True))
        np.testing.assert_allclose(
            np.asarray(q_next * flip), np.asarray(q[1:]), atol=1e-4
        )


def test_scalar_field_moments():
    """Draw statistics match the prior: Var[f(x)] ≈ sum_j k_j phi_j(x)^2."""
    LL = np.array([[-2.0, -2.0], [2.0, 2.0]])
    x = jnp.zeros((1, 2))
    draws = []
    for i in range(200):
        d = draw_scalar_field(jax.random.PRNGKey(i), x, 64, LL,
                              (0.5, 2.0, 1e-6))
        draws.append(float(d.f[0]))
    var = np.var(draws)
    # expected variance from the spectral density at the origin
    from rbslam_tpu.basis import hypercube_basis, se_spectral_density
    basis = hypercube_basis(64, LL)
    k = se_spectral_density(
        jnp.asarray(np.sqrt(basis.eigenvalues), jnp.float32), 0.5, 2.0, 2
    )
    phi0 = basis.phi(jnp.zeros((1, 2)))[0]
    expected = float(jnp.sum(k * phi0**2))
    assert abs(var - expected) / expected < 0.5, (var, expected)


def test_potential_field_is_curl_free():
    """The drawn 3D field is a gradient field: numerically check
    dF_x/dy == dF_y/dx by autodiff through the draw weights."""
    LL = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    d = draw_scalar_potential_field(
        jax.random.PRNGKey(0), jnp.zeros((1, 3)), 32, LL,
        (1.0, 0.5, 1.0, 1e-6),
    )
    from rbslam_tpu.basis import hypercube_basis, ScalarPotentialBasis
    sp = ScalarPotentialBasis(hypercube_basis(32, LL))

    def field(x):
        return sp.grad_blocks(x) @ d.weights

    J = jax.jacfwd(field)(jnp.array([0.2, -0.1, 0.3]))
    np.testing.assert_allclose(np.asarray(J), np.asarray(J.T), atol=1e-4)


def test_simulate_dense_dataset_heading():
    from rbslam_tpu.models import make_radio2d_model
    from rbslam_tpu.basis import hypercube_basis

    model = make_radio2d_model(hypercube_basis(4, np.array([1.0, 1.0])))
    Q = jnp.full((31, 1, 1), 1e-4)
    data = simulate_dense_dataset(
        jax.random.PRNGKey(0), "line_3D", (0.25, 2.0, 0.01), Q, 1.0,
        model.dynamics, m_sim=64, with_grid=True,
    )
    assert data.y.shape == (32, 1)
    assert data.dx.shape == (31, 3)
    # heading families keep clean position odometry (generateData:317-319)
    np.testing.assert_allclose(
        np.asarray(data.dx[:, :2]),
        np.diff(data.pos, axis=0),
        atol=1e-6,
    )
    assert data.grid is not None and "f" in data.grid


def test_sparse_visual_loader():
    data = load_sparse_visual(jax.random.PRNGKey(0))
    assert data.y.shape == (197, 20)
    assert data.u.shape == (196, 3)
    assert data.landmarks.shape == (20, 2)
    # NaN fraction preserved from the fixture (~80% not visible)
    nanfrac = float(jnp.mean(~jnp.isfinite(data.y)))
    assert 0.7 < nanfrac < 0.9
    # odometry noise: reconstructed path drifts from ground truth
    path = np.cumsum(np.asarray(data.u[:, :2]), axis=0)
    drift = np.linalg.norm(
        path + data.init_pos - data.ground_truth[1:, :2], axis=-1
    )
    assert drift[-1] > 0.05
