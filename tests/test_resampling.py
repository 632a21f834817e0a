import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rbslam_tpu.ops import (
    multinomial_resample,
    sample_categorical,
    stratified_resample,
    systematic_resample,
)


@pytest.mark.parametrize(
    "fn", [multinomial_resample, systematic_resample, stratified_resample]
)
def test_resampling_unbiased(fn):
    """Empirical ancestor frequencies match the weights — the statistical
    self-test the reference left commented out (tools/sample.m:36-63)."""
    w = jnp.array([0.05, 0.1, 0.15, 0.3, 0.4])
    n = 20000
    idx = fn(jax.random.PRNGKey(0), w, n)
    freq = np.bincount(np.asarray(idx), minlength=5) / n
    np.testing.assert_allclose(freq, np.asarray(w), atol=0.02)


def test_systematic_low_variance():
    """Systematic resampling keeps per-index counts within 1 of n*w."""
    w = jnp.array([0.25, 0.25, 0.25, 0.25])
    idx = systematic_resample(jax.random.PRNGKey(1), w, 16)
    counts = np.bincount(np.asarray(idx), minlength=4)
    np.testing.assert_array_equal(counts, [4, 4, 4, 4])


def test_sample_categorical_distribution():
    w = jnp.array([0.2, 0.8])
    keys = jax.random.split(jax.random.PRNGKey(2), 5000)
    draws = jax.vmap(lambda k: sample_categorical(k, w))(keys)
    freq = float(jnp.mean(draws))
    assert abs(freq - 0.8) < 0.03


def test_zero_weight_never_sampled():
    w = jnp.array([0.0, 1.0, 0.0])
    idx = multinomial_resample(jax.random.PRNGKey(3), w, 1000)
    assert np.all(np.asarray(idx) == 1)
