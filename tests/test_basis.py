import jax
import jax.numpy as jnp
import numpy as np

from rbslam_tpu.basis import (
    LaplaceBasis, ScalarPotentialBasis, hypercube_basis,
    se_spectral_density,
)
from rbslam_tpu.basis.laplace import select_indices


def test_select_indices_smallest_eigenvalues():
    NN, lam = select_indices(16, np.array([2.0, 2.0]))
    assert NN.shape == (16, 2)
    assert np.all(np.diff(lam) >= -1e-12)
    # eigenvalue formula: sum (pi n / (2L))^2
    lam_check = np.sum((np.pi * NN / 4.0) ** 2, axis=-1)
    np.testing.assert_allclose(lam, lam_check)


def test_eigenfunctions_orthonormal():
    # integral over [-L, L]^2 of phi_i phi_j = delta_ij; trapezoid check
    L = np.array([1.5, 2.0])
    basis = hypercube_basis(9, L)
    n = 220
    x1 = np.linspace(-L[0], L[0], n)
    x2 = np.linspace(-L[1], L[1], n)
    X1, X2 = np.meshgrid(x1, x2, indexing="ij")
    pts = jnp.asarray(np.stack([X1.ravel(), X2.ravel()], -1), jnp.float32)
    Phi = np.asarray(basis.phi(pts)).reshape(n, n, -1)
    w1 = np.gradient(x1)
    w2 = np.gradient(x2)
    W = np.outer(w1, w2)
    G = np.einsum("abi,abj,ab->ij", Phi, Phi, W)
    np.testing.assert_allclose(G, np.eye(9), atol=2e-2)


def test_dphi_matches_autodiff():
    basis = hypercube_basis(32, np.array([2.0, 1.0, 1.5]))
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (5, 3), minval=-0.9, maxval=0.9)

    def phi_single(xi):
        return basis.phi(xi)

    J = jax.vmap(jax.jacfwd(phi_single))(x)  # [5, m, 3]
    for di in range(3):
        np.testing.assert_allclose(
            basis.dphi(x, di), J[..., di], atol=1e-4, rtol=1e-4
        )


def test_hess_matches_autodiff():
    basis = hypercube_basis(16, np.array([1.0, 1.2, 0.8]))
    x = jnp.asarray([[0.3, -0.2, 0.1], [0.0, 0.5, -0.4]], jnp.float32)

    H_auto = jax.vmap(jax.jacfwd(jax.jacfwd(basis.phi)))(x)  # [n, m, d, d]
    H = basis.hess_phi(x)  # [n, d, d, m]
    np.testing.assert_allclose(
        H, jnp.transpose(H_auto, (0, 2, 3, 1)), atol=1e-3, rtol=1e-3
    )


def test_scalar_potential_blocks_are_gradient():
    sp = ScalarPotentialBasis(hypercube_basis(24, np.array([1.0, 1.0, 1.0])))
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (4, 3), minval=-0.8, maxval=0.8)
    w = jax.random.normal(key, (sp.n_lin,))

    def potential(xi):
        return sp.potential_row(xi) @ w

    g_auto = jax.vmap(jax.grad(potential))(x)
    g = jnp.einsum("nij,j->ni", sp.grad_blocks(x), w)
    np.testing.assert_allclose(g, g_auto, atol=1e-4, rtol=1e-4)


def test_hess_blocks_are_jacobian_of_field():
    sp = ScalarPotentialBasis(hypercube_basis(8, np.array([1.0, 1.0, 1.0])))
    x = jnp.asarray([[0.2, -0.3, 0.4]], jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(2), (sp.n_lin,))

    def field(xi):
        return sp.grad_blocks(xi) @ w  # [3]

    J_auto = jax.vmap(jax.jacfwd(field))(x)  # [1, 3, 3]
    J = jnp.einsum("nijk,k->nij", sp.hess_blocks(x), w)
    np.testing.assert_allclose(J, J_auto, atol=1e-4, rtol=1e-4)


def test_se_spectral_density_shape_and_monotone():
    w = jnp.linspace(0.0, 10.0, 50)
    S = se_spectral_density(w, 0.5, 2.0, d=2)
    assert S.shape == (50,)
    assert np.all(np.diff(np.asarray(S)) <= 1e-12)
    np.testing.assert_allclose(
        float(S[0]), 2.0 * (2 * np.pi) ** 1 * 0.25, rtol=1e-5
    )


def test_grad_phi_matches_dphi_stack():
    """Fused closed-form grad_phi == per-dimension dphi (all d = 1..3)."""
    for d, L in [(1, np.array([1.5])), (2, np.array([2.0, 1.0])),
                 (3, np.array([2.0, 1.0, 1.5]))]:
        basis = hypercube_basis(16, L)
        key = jax.random.PRNGKey(d)
        x = jax.random.uniform(key, (7, d), minval=-0.9, maxval=0.9)
        ref = jnp.stack([basis.dphi(x, i) for i in range(d)], axis=-2)
        np.testing.assert_allclose(
            basis.grad_phi(x), ref, atol=1e-5, rtol=1e-5
        )
