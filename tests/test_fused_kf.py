"""Pallas KF kernels (block_gather, lowrank) match the XLA path
(interpret mode on CPU; hardware validation via bench/profile scripts).

Superseded kernel variants (per-particle 1pass/2pass, post-gather block)
were removed in round 4 — NEGATIVE_RESULTS.md records their numbers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rbslam_tpu.engines import RBPFConfig, run_rbpf
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
def test_spd_inv_logdet_accuracy(ny):
    """The kernels' scalarized-Cholesky inverse/log-det matches LAPACK on
    PD inputs across conditioning (the Cayley-Hamilton det formula it
    replaced lost ~1e-2 of logdet accuracy even at cond ~3 and produced
    NaN at cond ~1e4 — ADVICE round 3)."""
    from rbslam_tpu.kernels.kf_update import _spd_inv_logdet

    rng = np.random.default_rng(0)
    Q, _ = np.linalg.qr(rng.normal(size=(64, ny, ny)))
    d = np.geomspace(1.0, 1e4, ny)[None, :] * np.ones((64, 1))
    S = np.einsum("bij,bj,bkj->bik", Q, d, Q).astype(np.float32)
    Sinv, logdet, bad, Linv = map(
        np.asarray, _spd_inv_logdet(jnp.asarray(S), ny, 1e-3)
    )
    assert not bad.any()
    ld_ref = np.linalg.slogdet(S.astype(np.float64))[1]
    np.testing.assert_allclose(logdet[:, 0, 0], ld_ref, atol=5e-3)
    inv_ref = np.linalg.inv(S.astype(np.float64))
    np.testing.assert_allclose(
        Sinv, inv_ref, atol=5e-3 * np.abs(inv_ref).max()
    )
    # the whitener the factored update consumes: S^-1 = Linv' Linv
    if ny == 1:
        LtL = Linv * Linv
    else:
        LtL = np.einsum("bki,bkj->bij", Linv, Linv)
    np.testing.assert_allclose(LtL, inv_ref, atol=5e-3 * np.abs(inv_ref).max())


@pytest.mark.parametrize("ny", [1, 2, 3])
def test_spd_inv_logdet_repairs_indefinite(ny):
    """Indefinite / zero S: flagged bad, Gershgorin-shifted, and ALWAYS
    finite (a single NaN particle would poison the ensemble logsumexp)."""
    from rbslam_tpu.kernels.kf_update import _spd_inv_logdet

    rng = np.random.default_rng(1)
    A = rng.normal(size=(32, ny, ny)).astype(np.float32)
    S_indef = A @ A.transpose(0, 2, 1) - 5.0 * np.eye(ny, dtype=np.float32)
    for S in (S_indef, np.zeros((8, ny, ny), np.float32)):
        Sinv, logdet, bad, Linv = map(
            np.asarray, _spd_inv_logdet(jnp.asarray(S), ny, 1e-3)
        )
        assert np.isfinite(Sinv).all()
        assert np.isfinite(logdet).all()
        assert np.isfinite(Linv).all()
        assert bad.any()


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


@pytest.mark.parametrize("ny", [1, 2])
def test_block_gather_small_ny(ny):
    from rbslam_tpu.kernels.kf_update import kf_update_block_gather

    ai, C, P, xl, y, R = _problem(ny=ny, nl=128)
    Pg = jnp.take(P, ai, axis=0)
    xlg = jnp.take(xl, ai, axis=0)
    ref = kalman_update_dense_batched(C, Pg, xlg, y, R, 1e-3)
    out = kf_update_block_gather(ai, C, xlg, P, y, R)
    np.testing.assert_allclose(out[0], ref[0], atol=1e-4)
    np.testing.assert_allclose(out[1], ref[1], atol=1e-5)
    np.testing.assert_allclose(out[2], ref[2], atol=1e-4)


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


def test_kernel_paths_reject_masked_y():
    """NaN-masked observations must be rejected on kernel paths (they
    have no mask support and would silently treat NaN as y=0 — ADVICE
    round 3); the xla path handles the same input via the masked
    update."""
    data, model, basis, center, k, Q = _radio_setup()
    y_nan = np.asarray(data.y).copy()
    y_nan[3, 0] = np.nan
    args = (
        model, data.dx, jnp.asarray(y_nan), data.init_state,
        jnp.zeros(basis.m), jnp.diag(k), Q,
        jnp.array([[THETA[2]]]), 1.0,
    )
    for kern in ("block_gather", "lowrank"):
        with pytest.raises(ValueError, match="NaN"):
            run_rbpf(
                jax.random.PRNGKey(0), *args,
                RBPFConfig(n_particles=8, kf_kernel=kern,
                           symmetrize_cov=False),
            )
    # explicit non-trivial mask is rejected too
    mask = jnp.ones_like(data.y).at[2, 0].set(0.0)
    with pytest.raises(ValueError, match="mask"):
        run_rbpf(
            jax.random.PRNGKey(0), model, data.dx, data.y,
            data.init_state, jnp.zeros(basis.m), jnp.diag(k), Q,
            jnp.array([[THETA[2]]]), 1.0,
            RBPFConfig(n_particles=8, kf_kernel="block_gather",
                       symmetrize_cov=False),
            mask=mask,
        )


def test_unknown_kf_kernel_rejected():
    data, model, basis, center, k, Q = _radio_setup()
    with pytest.raises(ValueError, match="kf_kernel"):
        run_rbpf(
            jax.random.PRNGKey(0), model, data.dx, data.y,
            data.init_state, jnp.zeros(basis.m), jnp.diag(k), Q,
            jnp.array([[THETA[2]]]), 1.0,
            RBPFConfig(n_particles=8, kf_kernel="block"),
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


def test_rbpf_lowrank_ess_adaptive_equivalent():
    """ESS-gated resampling on the factored path (VERDICT r4 #9): with
    ess_threshold < 1 a no-resample step keeps ai = identity (composing
    with the carried base indices) and accumulates log-weights; the run
    must match the block_gather path step-for-step (same keys, same
    resampling decisions) and actually skip some resampling steps."""
    data, model, basis, center, k, Q = _radio_setup()
    base = dict(n_particles=16, resampling="systematic",
                symmetrize_cov=False, ess_threshold=0.7)
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
    # identical resampling decisions and ancestors
    np.testing.assert_array_equal(
        np.asarray(res_a.ancestors), np.asarray(res_b.ancestors)
    )
    ident = np.arange(16)
    skipped = [
        (np.asarray(res_b.ancestors[t]) == ident).all()
        for t in range(res_b.ancestors.shape[0])
    ]
    assert any(skipped), "expected at least one ESS-skipped step"
    assert not all(skipped), "expected at least one resampling step"
    np.testing.assert_allclose(
        np.asarray(res_a.traj_mean), np.asarray(res_b.traj_mean), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(res_a.logw), np.asarray(res_b.logw), atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(res_a.xl_mean), np.asarray(res_b.xl_mean), atol=5e-3
    )


def test_rbpf_lowrank_T1_falls_back():
    """T == 1 (zero scan steps) used to crash the lowrank path on an
    empty outs concat (ADVICE round 3); it now routes through the
    generic scan and matches the XLA path."""
    data, model, basis, center, k, Q = _radio_setup()
    base = dict(n_particles=8, resampling="systematic",
                symmetrize_cov=False)
    Q1 = Q[:0] if jnp.asarray(Q).ndim == 3 else Q
    args = (
        model, data.dx[:0], data.y[:1], data.init_state,
        jnp.zeros(basis.m), jnp.diag(k), Q1,
        jnp.array([[THETA[2]]]), 1.0,
    )
    res_a = run_rbpf(jax.random.PRNGKey(0), *args, RBPFConfig(**base))
    res_b = run_rbpf(
        jax.random.PRNGKey(0), *args, RBPFConfig(**base, kf_kernel="lowrank")
    )
    np.testing.assert_allclose(
        np.asarray(res_a.xl_mean), np.asarray(res_b.xl_mean), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(res_a.logw), np.asarray(res_b.logw), atol=1e-5
    )
