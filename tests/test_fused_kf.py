"""Fused gather+KF Pallas kernels match the XLA path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rbslam_tpu.engines import RBPFConfig, run_rbpf
from rbslam_tpu.kernels import (
    fused_gather_kf_update,
    fused_gather_kf_update_2pass,
)
from rbslam_tpu.ops.kalman import kalman_update_dense_batched

from test_rbpf import _radio_setup, THETA


def _problem(N=16, ny=3, nl=40, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    A = jax.random.normal(k1, (N, nl, nl)) * 0.2
    P = jnp.einsum("pij,pkj->pik", A, A) + jnp.eye(nl)
    xl = jax.random.normal(k2, (N, nl))
    C = jax.random.normal(k3, (N, ny, nl)) * 0.5
    y = jax.random.normal(k4, (ny,))
    R = 0.5 * jnp.eye(ny)
    ai = jax.random.randint(k5, (N,), 0, N)
    return ai, C, P, xl, y, R


@pytest.mark.parametrize("ny", [1, 2, 3])
def test_single_kernel_matches_reference(ny):
    ai, C, P, xl, y, R = _problem(ny=ny)
    Pg = jnp.take(P, ai, axis=0)
    xlg = jnp.take(xl, ai, axis=0)
    ref = kalman_update_dense_batched(C, Pg, xlg, y, R, 1e-3)
    out = fused_gather_kf_update(ai, C, xlg, P, y, R)
    np.testing.assert_allclose(out[0], ref[0], atol=1e-5)
    np.testing.assert_allclose(out[1], ref[1], atol=1e-5)
    np.testing.assert_allclose(out[2], ref[2], atol=1e-5)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_one_pass_matches_reference(dtype):
    # nl must be lane-tile (128) aligned for the manual-DMA path
    ai, C, P, xl, y, R = _problem(nl=128)
    from rbslam_tpu.kernels.kf_update import fused_gather_kf_update_1pass

    P = P.astype(jnp.dtype(dtype))
    Pg = jnp.take(P, ai, axis=0)
    xlg = jnp.take(xl, ai, axis=0)
    ref = kalman_update_dense_batched(C, Pg, xlg, y, R, 1e-3)
    out = fused_gather_kf_update_1pass(ai, C, xlg, P, y, R)
    tol = 1e-5 if dtype == "float32" else 5e-2
    assert out[1].dtype == P.dtype
    np.testing.assert_allclose(out[0], ref[0], atol=10 * tol)
    np.testing.assert_allclose(
        out[1].astype(jnp.float32), ref[1].astype(jnp.float32), atol=tol
    )
    np.testing.assert_allclose(out[2], ref[2], atol=10 * tol)


def test_two_pass_matches_reference():
    ai, C, P, xl, y, R = _problem()
    Pg = jnp.take(P, ai, axis=0)
    xlg = jnp.take(xl, ai, axis=0)
    ref = kalman_update_dense_batched(C, Pg, xlg, y, R, 1e-3)
    out = fused_gather_kf_update_2pass(ai, C, xlg, P, y, R)
    np.testing.assert_allclose(out[0], ref[0], atol=1e-5)
    np.testing.assert_allclose(out[1], ref[1], atol=1e-5)
    np.testing.assert_allclose(out[2], ref[2], atol=1e-5)


def test_rbpf_with_fused_kf_unaligned_nlin():
    """n_lin not a multiple of 8 exercises the zero-padding path."""
    data, model, basis, center, k, Q = _radio_setup(m_est=30)
    base = dict(n_particles=12, resampling="systematic")
    args = (
        model, data.dx, data.y, data.init_state,
        jnp.zeros(basis.m), jnp.diag(k), Q,
        jnp.array([[THETA[2]]]), 1.0,
    )
    res_a = run_rbpf(jax.random.PRNGKey(1), *args, RBPFConfig(**base))
    res_b = run_rbpf(
        jax.random.PRNGKey(1), *args, RBPFConfig(**base, use_fused_kf=True)
    )
    assert res_b.xl.shape == res_a.xl.shape
    assert res_b.P.shape == res_a.P.shape
    np.testing.assert_allclose(
        np.asarray(res_a.traj_mean), np.asarray(res_b.traj_mean), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res_a.xl_mean), np.asarray(res_b.xl_mean), atol=1e-3
    )


def test_rbpf_with_fused_kf_equivalent():
    """Full filter run: fused path == XLA path on the radio workload."""
    data, model, basis, center, k, Q = _radio_setup()
    base = dict(n_particles=16, resampling="systematic")
    args = (
        model, data.dx, data.y, data.init_state,
        jnp.zeros(basis.m), jnp.diag(k), Q,
        jnp.array([[THETA[2]]]), 1.0,
    )
    res_a = run_rbpf(jax.random.PRNGKey(0), *args, RBPFConfig(**base))
    res_b = run_rbpf(
        jax.random.PRNGKey(0), *args,
        RBPFConfig(**base, use_fused_kf=True),
    )
    np.testing.assert_allclose(
        np.asarray(res_a.traj_mean), np.asarray(res_b.traj_mean), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res_a.xl_mean), np.asarray(res_b.xl_mean), atol=1e-3
    )


@pytest.mark.parametrize("ny", [1, 2, 3])
def test_block_kernel_matches_reference(ny):
    from rbslam_tpu.kernels.kf_update import kf_update_block

    ai, C, P, xl, y, R = _problem(ny=ny)
    Pg = jnp.take(P, ai, axis=0)
    xlg = jnp.take(xl, ai, axis=0)
    ref = kalman_update_dense_batched(C, Pg, xlg, y, R, 1e-3)
    out = kf_update_block(C, Pg, xlg, y, R)
    np.testing.assert_allclose(out[0], ref[0], atol=1e-5)
    np.testing.assert_allclose(out[1], ref[1], atol=1e-5)
    np.testing.assert_allclose(out[2], ref[2], atol=1e-5)


def test_block_kernel_bf16_storage():
    from rbslam_tpu.kernels.kf_update import kf_update_block

    ai, C, P, xl, y, R = _problem(nl=32)
    P = P.astype(jnp.bfloat16)
    Pg = jnp.take(P, ai, axis=0)
    xlg = jnp.take(xl, ai, axis=0)
    ref = kalman_update_dense_batched(C, Pg, xlg, y, R, 1e-3)
    out = kf_update_block(C, Pg, xlg, y, R)
    assert out[1].dtype == jnp.bfloat16
    np.testing.assert_allclose(out[0], ref[0], atol=5e-2)
    np.testing.assert_allclose(
        out[1].astype(jnp.float32), ref[1].astype(jnp.float32), atol=5e-2
    )
    np.testing.assert_allclose(out[2], ref[2], atol=5e-1)


def test_rbpf_block_kernel_equivalent():
    """Full filter run: kf_kernel='block' == XLA path on the radio workload."""
    data, model, basis, center, k, Q = _radio_setup()
    base = dict(n_particles=16, resampling="systematic",
                symmetrize_cov=False)
    args = (
        model, data.dx, data.y, data.init_state,
        jnp.zeros(basis.m), jnp.diag(k), Q,
        jnp.array([[THETA[2]]]), 1.0,
    )
    res_a = run_rbpf(jax.random.PRNGKey(0), *args, RBPFConfig(**base))
    res_b = run_rbpf(
        jax.random.PRNGKey(0), *args,
        RBPFConfig(**base, kf_kernel="block"),
    )
    np.testing.assert_allclose(
        np.asarray(res_a.traj_mean), np.asarray(res_b.traj_mean), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res_a.xl_mean), np.asarray(res_b.xl_mean), atol=1e-3
    )


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_block_gather_kernel_matches_reference(dtype):
    """Gather-fused blocked kernel == gather + XLA update (interpret)."""
    from rbslam_tpu.kernels.kf_update import kf_update_block_gather

    ai, C, P, xl, y, R = _problem(nl=128)
    P = P.astype(jnp.dtype(dtype))
    Pg = jnp.take(P, ai, axis=0)
    xlg = jnp.take(xl, ai, axis=0)
    ref = kalman_update_dense_batched(C, Pg, xlg, y, R, 1e-3)
    out = kf_update_block_gather(ai, C, xlg, P, y, R)
    tol = 1e-5 if dtype == "float32" else 5e-2
    assert out[1].dtype == P.dtype
    np.testing.assert_allclose(out[0], ref[0], atol=10 * tol)
    np.testing.assert_allclose(
        out[1].astype(jnp.float32), ref[1].astype(jnp.float32), atol=tol
    )
    np.testing.assert_allclose(out[2], ref[2], atol=10 * tol)


def test_rbpf_block_gather_equivalent():
    """Full filter run: kf_kernel='block_gather' == XLA path (the kernel
    pads n_lin up to 128 internally; results identical after unpad)."""
    data, model, basis, center, k, Q = _radio_setup()
    base = dict(n_particles=16, resampling="systematic",
                symmetrize_cov=False)
    args = (
        model, data.dx, data.y, data.init_state,
        jnp.zeros(basis.m), jnp.diag(k), Q,
        jnp.array([[THETA[2]]]), 1.0,
    )
    res_a = run_rbpf(jax.random.PRNGKey(0), *args, RBPFConfig(**base))
    res_b = run_rbpf(
        jax.random.PRNGKey(0), *args,
        RBPFConfig(**base, kf_kernel="block_gather"),
    )
    np.testing.assert_allclose(
        np.asarray(res_a.traj_mean), np.asarray(res_b.traj_mean), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res_a.xl_mean), np.asarray(res_b.xl_mean), atol=1e-3
    )


@pytest.mark.parametrize("ny", [1, 2, 3])
def test_lowrank_kernel_matches_reference(ny):
    """Factored update (P = P_base - Wt^T Wt) == XLA update on the
    materialized covariance, and kf_rebase reproduces the XLA P'."""
    from rbslam_tpu.kernels.kf_update import kf_rebase, kf_update_lowrank

    key = jax.random.PRNGKey(3)
    N, nl, rw = 32, 128, 8 * ny
    ks = jax.random.split(key, 6)
    A = jax.random.normal(ks[0], (N, nl, nl)) * 0.2
    P_base = jnp.einsum("pij,pkj->pik", A, A) + 2.0 * jnp.eye(nl)
    Wt = jnp.zeros((N, rw, nl)).at[:, :2 * ny].set(
        0.1 * jax.random.normal(ks[1], (N, 2 * ny, nl))
    )
    C = jax.random.normal(ks[2], (N, ny, nl)) * 0.3
    xl = jax.random.normal(ks[3], (N, nl))
    y = jax.random.normal(ks[4], (ny,))
    R = 0.5 * jnp.eye(ny)
    bidx = jax.random.randint(ks[5], (N,), 0, N)

    P_eff = jnp.take(P_base, bidx, 0) - jnp.einsum("pri,prj->pij", Wt, Wt)
    ref = kalman_update_dense_batched(C, P_eff, xl, y, R, 1e-3, False, False)
    xl_new, wnew, logw, bad = kf_update_lowrank(bidx, C, xl, Wt, P_base, y, R)
    np.testing.assert_allclose(xl_new, ref[0], atol=5e-2)
    np.testing.assert_allclose(logw, ref[2], atol=5e-2)
    assert not bool(bad.any())

    Wt2 = jax.lax.dynamic_update_slice(Wt, wnew, (0, 2 * ny, 0))
    P_new = kf_rebase(bidx, Wt2, P_base)
    np.testing.assert_allclose(
        np.asarray(P_new), np.asarray(ref[1]), atol=5e-2
    )


def test_lowrank_kernel_jitter_retry():
    """A non-PD effective S triggers the same scale-aware jitter repair
    and bad flag as the other kernels."""
    from rbslam_tpu.kernels.kf_update import kf_update_lowrank

    N, ny, nl, rw = 8, 3, 128, 24
    # P_base = 0 and R = 0 -> S = 0: every particle must be flagged
    P_base = jnp.zeros((N, nl, nl))
    Wt = jnp.zeros((N, rw, nl))
    C = jax.random.normal(jax.random.PRNGKey(0), (N, ny, nl)) * 0.3
    xl = jnp.zeros((N, nl))
    y = jnp.ones((ny,))
    R = jnp.zeros((ny, ny))
    xl_new, wnew, logw, bad = kf_update_lowrank(
        jnp.arange(N), C, xl, Wt, P_base, y, R
    )
    assert bool(bad.all())
    assert np.isfinite(np.asarray(logw)).all()


def test_rbpf_lowrank_equivalent():
    """Full filter run: kf_kernel='lowrank' == 'block_gather' (both pad
    n_lin to 128; the factored path materializes P only at rebases).
    T=12 spans one full rebase period (r=8) plus a remainder scan."""
    data, model, basis, center, k, Q = _radio_setup()
    base = dict(n_particles=16, resampling="systematic",
                symmetrize_cov=False)
    args = (
        model, data.dx, data.y, data.init_state,
        jnp.zeros(basis.m), jnp.diag(k), Q,
        jnp.array([[THETA[2]]]), 1.0,
    )
    res_a = run_rbpf(
        jax.random.PRNGKey(0), *args,
        RBPFConfig(**base, kf_kernel="block_gather"),
    )
    res_b = run_rbpf(
        jax.random.PRNGKey(0), *args,
        RBPFConfig(**base, kf_kernel="lowrank"),
    )
    np.testing.assert_allclose(
        np.asarray(res_a.traj_mean), np.asarray(res_b.traj_mean), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(res_a.xl_mean), np.asarray(res_b.xl_mean), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(res_a.P_mean), np.asarray(res_b.P_mean), atol=5e-3
    )
