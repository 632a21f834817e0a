"""Fused-KF smoother sweep equals the XLA-path sweep."""

import jax
import jax.numpy as jnp
import numpy as np

from rbslam_tpu.engines import RBPSConfig, run_rbps

from test_rbpf import _radio_setup, THETA


def test_rbps_fused_equivalent():
    data, model, basis, center, k, Q = _radio_setup(m_est=30)  # unaligned
    args = (
        model, data.dx, data.y, data.init_state,
        jnp.zeros(basis.m), jnp.diag(k), Q,
        jnp.array([[THETA[2]]]), 1.0,
    )
    base = dict(n_particles=12, n_sweeps=3)
    res_a = run_rbps(jax.random.PRNGKey(4), *args, RBPSConfig(**base))
    res_b = run_rbps(
        jax.random.PRNGKey(4), *args,
        RBPSConfig(**base, use_fused_kf=True),
    )
    assert res_b.XLK.shape == res_a.XLK.shape
    np.testing.assert_allclose(
        np.asarray(res_a.XNK), np.asarray(res_b.XNK), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res_a.XLK), np.asarray(res_b.XLK), atol=1e-3
    )
