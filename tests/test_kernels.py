"""Pallas basis-eval kernels match the jnp reference implementation
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from rbslam_tpu.basis import hypercube_basis
from rbslam_tpu.kernels import grad_basis_pallas, phi_basis_pallas


def test_phi_kernel_matches_reference():
    basis = hypercube_basis(50, np.array([2.0, 1.5, 1.0]))
    x = jax.random.uniform(
        jax.random.PRNGKey(0), (37, 3), minval=-0.9, maxval=0.9
    )
    ref = basis.phi(x)
    out = phi_basis_pallas(basis, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_grad_kernel_matches_reference():
    basis = hypercube_basis(40, np.array([1.0, 1.0, 0.5]))
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (19, 3), minval=-0.4, maxval=0.4
    )
    ref = basis.grad_phi(x)          # [N, d, m]
    out = grad_basis_pallas(basis, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_phi_kernel_2d():
    basis = hypercube_basis(16, np.array([3.0, 3.0]))
    x = jax.random.uniform(
        jax.random.PRNGKey(2), (300, 2), minval=-2.5, maxval=2.5
    )
    np.testing.assert_allclose(
        np.asarray(phi_basis_pallas(basis, x)),
        np.asarray(basis.phi(x)),
        atol=1e-4, rtol=1e-4,
    )


def test_chol_small_scale_aware_jitter():
    """A non-PD innovation at magnetic-field scale (diag ~1e3) must be
    repaired by the retry even though 1e-3 absolute jitter is below one
    bf16 ulp there (the retry scales by the mean diagonal)."""
    import jax.numpy as jnp
    import numpy as np

    from rbslam_tpu.ops.kalman import _chol_small_batched

    # rank-1 (singular) S at scale 1e3, slightly indefinite in bf16
    v = jnp.asarray([30.0, 20.0, 10.0])
    S = jnp.tile((jnp.outer(v, v)), (4, 1, 1))
    S = S - 1e-2 * jnp.eye(3)          # indefinite
    S16 = S.astype(jnp.bfloat16).astype(jnp.float32)
    L, bad = _chol_small_batched(S16, 1e-3)
    assert bool(jnp.all(bad))
    assert bool(jnp.all(jnp.isfinite(L))), np.asarray(L)
    # the repaired factor reproduces S up to the added jitter scale
    rec = L @ jnp.swapaxes(L, -1, -2)
    assert bool(jnp.all(jnp.isfinite(rec)))


def test_pallas_basis_cache_survives_multiple_jits():
    """The per-basis constant cache must hold host arrays, not arrays
    materialized inside one trace — two different jitted programs using
    the same basis previously leaked a tracer (UnexpectedTracerError)."""
    from rbslam_tpu.basis import hypercube_basis
    from rbslam_tpu.kernels import grad_basis_pallas

    basis = hypercube_basis(16, np.array([2.0, 2.0, 1.0]))
    x = jax.random.uniform(jax.random.PRNGKey(0), (8, 3), minval=-1,
                           maxval=1)

    @jax.jit
    def f1(x):
        return grad_basis_pallas(basis, x).sum()

    @jax.jit
    def f2(x):
        return grad_basis_pallas(basis, x).mean()

    a = float(f1(x))
    b = float(f2(x))
    assert np.isfinite(a) and np.isfinite(b)


def test_mag3d_jacobian_kernel_matches_reference():
    """The fully-fused transposed Jacobian kernel == the composed
    reference assembly R(q)^T [I3 | grad_phi] (run_dense3D_magfield.m:
    265-279), including the zero pad columns beyond 3 + m."""
    from rbslam_tpu.kernels import mag3d_jacobian_pallas
    from rbslam_tpu.math.quaternions import quat_to_rmat

    basis = hypercube_basis(61, np.array([2.0, 2.0, 1.0]))
    key = jax.random.PRNGKey(7)
    kp, kq = jax.random.split(key)
    n = 37
    pos = jax.random.uniform(kp, (n, 3), minval=-1.5, maxval=1.5)
    q = jax.random.normal(kq, (n, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)

    nl_pad = 128
    Ct = mag3d_jacobian_pallas(basis, pos, q, nl_pad)
    assert Ct.shape == (3, n, nl_pad)

    g = jax.vmap(basis.grad_phi)(pos)                   # [n, 3, m]
    eye = jnp.broadcast_to(jnp.eye(3), (n, 3, 3))
    C_nav = jnp.concatenate([eye, g], axis=-1)          # [n, 3, 3+m]
    Rnb = quat_to_rmat(q)
    ref = jnp.einsum("pji,pjk->pik", Rnb, C_nav)        # [n, 3, 3+m]

    np.testing.assert_allclose(
        np.asarray(Ct[:, :, : 3 + basis.m]),
        np.asarray(jnp.swapaxes(ref, 0, 1)),
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(Ct[:, :, 3 + basis.m:]), 0.0
    )

    # the ROWS-layout variant (the lowrank KF kernel's production input,
    # emitted directly in the storage dtype) matches element-for-element
    from rbslam_tpu.kernels.basis_eval import mag3d_jacobian_rows_pallas

    Cr = mag3d_jacobian_rows_pallas(basis, pos, q, nl_pad)
    assert Cr.shape == (n, 3, nl_pad)
    np.testing.assert_allclose(
        np.asarray(Cr), np.asarray(jnp.swapaxes(Ct, 0, 1)),
        rtol=1e-6, atol=1e-6,
    )
    Cr16 = mag3d_jacobian_rows_pallas(basis, pos, q, nl_pad, jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(Cr16).astype(np.float32), np.asarray(Cr),
        rtol=8e-3, atol=8e-3 * float(jnp.abs(Cr).max()),
    )
