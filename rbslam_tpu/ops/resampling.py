"""Resampling schemes for the particle ensemble — log-domain, key-driven.

The reference resamples **every step** with independent inverse-CDF draws
per particle (multinomial; tools/sample.m:30-33 called from
src/particleFilter.m:104-109). That semantics is kept as
:func:`multinomial_resample`; :func:`systematic_resample` (single uniform,
stratified comb) is the lower-variance default the BASELINE.json north
star asks for. All schemes consume *normalized* weights and return
ancestor indices; gathering particle state is the caller's `jnp.take`,
which XLA turns into the appropriate (possibly cross-device) gather.

TPU notes: inverse-CDF lookups use `jnp.searchsorted` on the cumulative
weight vector — O(N log N) vectorized compare/select rather than the
reference's per-particle `sum(cumsum(w) < rand)` scan. No data-dependent
shapes; everything jits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _inverse_cdf(w, u):
    """Map uniforms u in [0,1) to categorical indices via the CDF of w."""
    cdf = jnp.cumsum(w)
    # guard rounding: force the final CDF entry to cover 1.0
    cdf = cdf / cdf[-1]
    # binary-search lowering ('scan') costs log2(n) strided gathers per
    # query; at large n the sort-based lowering is much faster on TPU
    method = "sort" if u.ndim and u.shape[0] >= 16384 else "scan"
    return jnp.clip(
        jnp.searchsorted(cdf, u, side="right", method=method),
        0, w.shape[0] - 1,
    ).astype(jnp.int32)


def sample_categorical(key, w):
    """One index ~ Categorical(w) (tools/sample.m:30-33)."""
    u = jax.random.uniform(key, ())
    return _inverse_cdf(w, u)


def multinomial_resample(key, w, n: int):
    """n iid Categorical(w) draws (the reference's per-step scheme)."""
    u = jax.random.uniform(key, (n,))
    return _inverse_cdf(w, u)


def systematic_resample(key, w, n: int):
    """Systematic (single-offset comb) resampling: u_i = (i + u0)/n.

    The comb is a uniform grid, so the inverse-CDF lookup inverts in
    closed form without any search: ancestor ai[j] = #{i : cdf_i <= u_j}
    and cdf_i <= (j + u0)/n  <=>  ceil(n cdf_i - u0) <= j, so bucketing
    b_i = ceil(n cdf_i - u0) and taking the cumulative histogram gives
    every ancestor in O(n) scatter+cumsum — measured 1.24x the sort-based
    searchsorted on TPU at n=16384, and identical to it up to f32
    knife-edge rounding (the two sides of the equivalence round
    differently when n*cdf_i - u0 sits within ~ulp of an integer — more
    likely at n ~ 1e6; either outcome is a valid systematic comb; a
    100-case fuzz at n=128 showed zero mismatches).
    """
    u0 = jax.random.uniform(key, ())
    cdf = _cumsum_1d(w)
    cdf = cdf / cdf[-1]
    b = jnp.clip(jnp.ceil(n * cdf - u0).astype(jnp.int32), 0, n)
    hist = jnp.zeros(n + 1, jnp.int32).at[b].add(1, mode="drop")
    ai = _cumsum_1d(hist[:n])
    return jnp.clip(ai, 0, w.shape[0] - 1).astype(jnp.int32)


def _cumsum_1d(x):
    """1-D inclusive cumsum; for large power-of-two lengths, computed as
    a 2-D row-cumsum + row-offset broadcast — the straight 1-D
    `jnp.cumsum` lowers to a ~log(n)-pass shifted-add chain that is
    latency-bound on TPU (~0.14 ms at n=16384 in the filter-step trace);
    the [rows, 128]-shaped form does the same work in a few wide passes.
    """
    n = x.shape[0]
    if n < 4096 or n % 128:
        return jnp.cumsum(x)
    rows = n // 128
    x2 = x.reshape(rows, 128)
    within = jnp.cumsum(x2, axis=1)
    offsets = jnp.cumsum(within[:, -1]) - within[:, -1]   # exclusive
    return (within + offsets[:, None]).reshape(n)


def stratified_resample(key, w, n: int):
    """Stratified resampling: u_i = (i + u_i')/n with iid u_i'."""
    us = jax.random.uniform(key, (n,))
    u = (jnp.arange(n, dtype=w.dtype) + us) / n
    return _inverse_cdf(w, u)


_SCHEMES = {
    "multinomial": multinomial_resample,
    "systematic": systematic_resample,
    "stratified": stratified_resample,
}


def resample_indices(key, w, n: int, scheme: str = "multinomial"):
    """Dispatch by scheme name (static)."""
    try:
        fn = _SCHEMES[scheme]
    except KeyError:
        raise ValueError(
            f"unknown resampling scheme {scheme!r}; options: {sorted(_SCHEMES)}"
        ) from None
    return fn(key, w, n)
