"""Smoother tests: naive vs information-form ancestor-weight equivalence
(the two reference algorithms compute the same distribution,
src/particleSmoother.m:188-229 vs particleSmootherInformationForm.m:224-236)
and end-to-end sweeps on the dense-radio workload."""

import jax
import jax.numpy as jnp
import numpy as np

from rbslam_tpu.engines import RBPSConfig, run_rbps, run_rbps_information_form
from rbslam_tpu.engines.rbps import _dense_future_log_weights
from rbslam_tpu.engines.rbps_info import _info_future_log_weights
from rbslam_tpu.metrics import aligned_position_rmse

from test_rbpf import _radio_setup, THETA


def test_ancestor_weights_info_equals_naive():
    """For consistent (xl,P) <-> (ivec,Imat) state, the two ancestor
    measurement weights differ only by a particle-independent constant."""
    key = jax.random.PRNGKey(0)
    n_p, n_lin, ny, T = 5, 12, 2, 9
    t_idx = 3
    k1, k2, k3, k4 = jax.random.split(key, 4)

    # random PSD covariances and states per particle
    A = jax.random.normal(k1, (n_p, n_lin, n_lin)) * 0.3
    P = jnp.einsum("pij,pkj->pik", A, A) + 0.5 * jnp.eye(n_lin)
    xl = jax.random.normal(k2, (n_p, n_lin))
    C_ref = jax.random.normal(k3, (T, ny, n_lin)) * 0.7
    y = jax.random.normal(k4, (T, ny))
    R = 0.3 * jnp.eye(ny)
    Rinv = jnp.linalg.inv(R)

    # naive (time-masked stacked system)
    C_stack = C_ref.reshape(T * ny, n_lin)
    y_stack = y.reshape(T * ny)
    logw_naive, _ = _dense_future_log_weights(
        C_stack, y_stack, t_idx, xl, P, R, T, ny, 1e-9
    )

    # info form with exactly consistent information state
    Pinv = jnp.linalg.inv(P)
    ivec = jnp.einsum("pij,pj->pi", Pinv, xl)
    hldp = 0.5 * jnp.linalg.slogdet(P)[1]
    mask_t = (jnp.arange(T) >= t_idx).astype(jnp.float32)
    ivec_add = jnp.einsum("t,tik,ij,tj->k", mask_t, C_ref, Rinv, y)
    Imat_add = jnp.einsum("t,tki,kl,tlj->ij", mask_t, C_ref, Rinv, C_ref)
    logw_info, _ = _info_future_log_weights(
        ivec, Pinv, P, hldp, ivec_add, Imat_add, 1e-9
    )

    diff = np.asarray(logw_naive - logw_info)
    np.testing.assert_allclose(diff - diff[0], 0.0, atol=2e-2)


def test_rbps_dense_radio_end_to_end():
    data, model, basis, center, k, Q = _radio_setup()
    cfg = RBPSConfig(n_particles=30, n_sweeps=4)
    res = run_rbps(
        jax.random.PRNGKey(5), model, data.dx, data.y,
        data.init_state, jnp.zeros(basis.m), jnp.diag(k),
        Q, jnp.array([[THETA[2]]]), 1.0, cfg,
    )
    assert res.XNK.shape == (4, data.y.shape[0], 3)
    assert np.all(np.isfinite(np.asarray(res.XNK)))
    rmses = [
        float(aligned_position_rmse(jnp.asarray(data.pos), res.XNK[s, :, :2]))
        for s in range(4)
    ]
    assert all(np.isfinite(rmses))
    assert min(rmses[1:]) < 0.6, rmses


def test_rbps_info_bf16_covariance():
    """Info-form smoother with bf16 covariance/information storage stays
    close to the f32 run (same sampler, reduced-precision carry)."""
    data, model, basis, center, k, Q = _radio_setup()
    args = (
        model, data.dx, data.y, data.init_state,
        jnp.zeros(basis.m), jnp.diag(k), Q,
        jnp.array([[THETA[2]]]), 1.0,
    )
    cfg32 = RBPSConfig(n_particles=30, n_sweeps=3)
    cfg16 = cfg32._replace(cov_dtype="bfloat16")
    res32 = run_rbps_information_form(jax.random.PRNGKey(8), *args, cfg32)
    res16 = run_rbps_information_form(jax.random.PRNGKey(8), *args, cfg16)
    assert res16.PK.dtype == jnp.float32  # cast back on output
    r32 = float(
        aligned_position_rmse(jnp.asarray(data.pos), res32.XNK[-1, :, :2])
    )
    r16 = float(
        aligned_position_rmse(jnp.asarray(data.pos), res16.XNK[-1, :, :2])
    )
    assert np.isfinite(r16)
    assert abs(r32 - r16) < 0.5, (r32, r16)


def test_rbps_info_matches_naive_statistically():
    """Both smoothers on the same workload produce sampled trajectories
    with comparable RMSE (they implement the same sampler)."""
    data, model, basis, center, k, Q = _radio_setup()
    cfg = RBPSConfig(n_particles=30, n_sweeps=3)
    args = (
        model, data.dx, data.y, data.init_state,
        jnp.zeros(basis.m), jnp.diag(k), Q,
        jnp.array([[THETA[2]]]), 1.0, cfg,
    )
    res_naive = run_rbps(jax.random.PRNGKey(6), *args)
    res_info = run_rbps_information_form(jax.random.PRNGKey(6), *args)
    r_naive = float(
        aligned_position_rmse(jnp.asarray(data.pos), res_naive.XNK[-1, :, :2])
    )
    r_info = float(
        aligned_position_rmse(jnp.asarray(data.pos), res_info.XNK[-1, :, :2])
    )
    assert np.isfinite(r_naive) and np.isfinite(r_info)
    assert abs(r_naive - r_info) < 0.5, (r_naive, r_info)
