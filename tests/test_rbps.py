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
    r32, r16 = [], []
    for seed in (8, 18, 28, 38, 48):
        res32 = run_rbps_information_form(
            jax.random.PRNGKey(seed), *args, cfg32
        )
        res16 = run_rbps_information_form(
            jax.random.PRNGKey(seed), *args, cfg16
        )
        assert res16.PK.dtype == jnp.float32  # cast back on output
        r32.append(float(aligned_position_rmse(
            jnp.asarray(data.pos), res32.XNK[-1, :, :2])))
        r16.append(float(aligned_position_rmse(
            jnp.asarray(data.pos), res16.XNK[-1, :, :2])))
    assert np.all(np.isfinite(r16)), r16
    # distribution-level gate at signal scale (means ~0.05-0.2 m): the
    # 5-seed mean RMSEs must agree to 1/3 relative + 0.015 m — a 1.5x
    # regression of the bf16 carry fails this
    m32, m16 = np.mean(r32), np.mean(r16)
    assert abs(m32 - m16) < max(m32, m16) / 3.0 + 0.015, (r32, r16)
    assert min(r32) < max(r16) and min(r16) < max(r32), (r32, r16)


def test_woodbury_rank_ny_matches_fresh_inverse():
    """Chained rank-ny updates/downdates of (W, hldM) track the freshly
    inverted matrix and its log-det."""
    from rbslam_tpu.engines.rbps_info import _woodbury_rank_ny

    key = jax.random.PRNGKey(0)
    n_p, nl, ny = 4, 24, 3
    A = 0.2 * jax.random.normal(key, (n_p, nl, nl))
    M = jnp.einsum("pij,pkj->pik", A, A) + 3.0 * jnp.eye(nl)
    W = jnp.linalg.inv(M)
    hldM = 0.5 * jnp.linalg.slogdet(M)[1]
    for i in range(4):
        U = 0.5 * jax.random.normal(jax.random.fold_in(key, i), (n_p, nl, ny))
        sign = 1.0 if i % 2 == 0 else -1.0
        if sign < 0:
            U = 0.2 * U   # keep M - UU' SPD
        M = M + sign * jnp.einsum("pik,pjk->pij", U, U)
        W, hldM, retried = _woodbury_rank_ny(W, hldM, U, sign, 1e-9)
        assert not bool(jnp.any(retried))
    np.testing.assert_allclose(
        np.asarray(W), np.asarray(jnp.linalg.inv(M)), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(hldM), np.asarray(0.5 * jnp.linalg.slogdet(M)[1]),
        rtol=1e-4,
    )


def test_rbps_info_woodbury_matches_cholesky():
    """The Woodbury ancestor form samples trajectories of the same
    quality as the per-step-factorization form (same algorithm, the
    ancestor weights are mathematically identical)."""
    data, model, basis, center, k, Q = _radio_setup()
    args = (
        model, data.dx, data.y, data.init_state,
        jnp.zeros(basis.m), jnp.diag(k), Q,
        jnp.array([[THETA[2]]]), 1.0,
    )
    cfg_w = RBPSConfig(n_particles=30, n_sweeps=3)  # woodbury is default
    cfg_c = cfg_w._replace(ancestor_form="cholesky")
    r_c, r_w = [], []
    for seed in (9, 19, 29, 39, 49):
        res_c = run_rbps_information_form(
            jax.random.PRNGKey(seed), *args, cfg_c
        )
        res_w = run_rbps_information_form(
            jax.random.PRNGKey(seed), *args, cfg_w
        )
        r_c.append(float(aligned_position_rmse(
            jnp.asarray(data.pos), res_c.XNK[-1, :, :2])))
        r_w.append(float(aligned_position_rmse(
            jnp.asarray(data.pos), res_w.XNK[-1, :, :2])))
        if seed == 9:
            # sweep 1 is a plain RBPF in both forms: identical keys =>
            # identical sampled trajectory
            np.testing.assert_allclose(
                np.asarray(res_c.XNK[0]), np.asarray(res_w.XNK[0]),
                atol=1e-5,
            )
    assert np.all(np.isfinite(r_w)), r_w
    # multi-seed distribution gate: a 1.5x RMSE regression between the
    # ancestor forms fails this (5-seed means to 1/3 relative + 0.015 m)
    m_c, m_w = np.mean(r_c), np.mean(r_w)
    assert abs(m_c - m_w) < max(m_c, m_w) / 3.0 + 0.015, (r_c, r_w)
    # and the per-seed samples must interleave (not two separated
    # clusters): each form's best seed beats the other form's worst
    assert min(r_c) < max(r_w) and min(r_w) < max(r_c), (r_c, r_w)


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
    r_naive, r_info = [], []
    for seed in (6, 16, 26, 36, 46):
        res_naive = run_rbps(jax.random.PRNGKey(seed), *args)
        res_info = run_rbps_information_form(
            jax.random.PRNGKey(seed), *args
        )
        r_naive.append(float(aligned_position_rmse(
            jnp.asarray(data.pos), res_naive.XNK[-1, :, :2])))
        r_info.append(float(aligned_position_rmse(
            jnp.asarray(data.pos), res_info.XNK[-1, :, :2])))
    assert np.all(np.isfinite(r_naive)) and np.all(np.isfinite(r_info))
    m_n, m_i = np.mean(r_naive), np.mean(r_info)
    assert abs(m_n - m_i) < max(m_n, m_i) / 3.0 + 0.015, (r_naive, r_info)
    assert min(r_naive) < max(r_info) and min(r_info) < max(r_naive), (
        r_naive, r_info,
    )


def test_sparse_ancestor_weights_match_direct_stacked():
    """_sparse_future_log_weights (matrix-inversion-lemma rederivation of
    the reference's stacked future system, src/particleSmoother.m:194-218)
    == a direct O((ny(T-t))^3) stacked evaluation, particle-for-particle
    at several t."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_engines_more import _sparse_toy

    from rbslam_tpu.engines.rbps import _sparse_future_log_weights
    from rbslam_tpu.math.linalg import gaussian_logpdf_chol, psd_cholesky

    key = jax.random.PRNGKey(11)
    model, landmarks, truth, y, u = _sparse_toy(key, n_landmarks=5, T=12)
    T, ny = y.shape
    n_lin = 2 * landmarks.shape[0]
    n_p = 4
    mask = jnp.isfinite(y).astype(jnp.float32)

    k1, k2 = jax.random.split(key)
    xl = landmarks.reshape(-1)[None] + 0.3 * jax.random.normal(
        k1, (n_p, n_lin)
    )
    A = 0.1 * jax.random.normal(k2, (n_p, n_lin, n_lin))
    P = jnp.einsum("pij,pkj->pik", A, A) + 0.5 * jnp.eye(n_lin)
    R = 0.01 * jnp.eye(ny)
    r_diag = jnp.diagonal(R)
    xnk = truth  # reference trajectory

    def direct(t_idx, xl_i, P_i):
        """Reference-shaped stacked system with fixed-width time mask."""
        yhat_all, H_all = jax.vmap(
            lambda xr: model.measure(xr, xl_i)
        )(xnk)
        active = (jnp.arange(T) >= t_idx).astype(jnp.float32)
        m = (mask * active[:, None]).reshape(T * ny)
        H = H_all.reshape(T * ny, n_lin) * m[:, None]
        e = (jnp.nan_to_num(y) - yhat_all).reshape(T * ny) * m
        Rstack = jnp.tile(r_diag, T)
        S = H @ P_i @ H.T + jnp.diag(Rstack * m + (1.0 - m))
        L, _ = psd_cholesky(S, 1e-9)
        return gaussian_logpdf_chol(e, L, n_obs=jnp.sum(m))

    for t_idx in [0, 4, 9, 11]:
        ref = jax.vmap(lambda a, b: direct(t_idx, a, b))(xl, P)
        got, _ = _sparse_future_log_weights(
            model, xnk, y, mask, jnp.asarray(t_idx), xl, P, R, 1e-9
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-3
        )
