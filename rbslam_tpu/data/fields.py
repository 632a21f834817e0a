"""Random GP field draws for simulation (reduced-rank priors).

Reference: tools/gp_rnd_SE1D_fast.m (scalar SE field: f = Phi diag(sqrt k) z)
and tools/gp_rnd_scalar_potential_fast.m (curl-free 3D field: potential with
linear + SE kernels observed through its gradient).

Inputs are shifted to the centered domain here (the reference shifts inside
the tools, gp_rnd_SE1D_fast.m:47-49).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..basis.laplace import hypercube_basis, domain_center
from ..basis.potential import ScalarPotentialBasis
from ..basis.spectral import linear_plus_se_spectral, se_spectral_density


class ScalarFieldDraw(NamedTuple):
    f: jnp.ndarray        # [n] field values
    y: jnp.ndarray        # [n] noisy observations
    weights: jnp.ndarray  # [m] basis weights of the drawn field


class PotentialFieldDraw(NamedTuple):
    f: jnp.ndarray        # [n] potential values
    df: jnp.ndarray       # [n, 3] gradient (the field)
    y: jnp.ndarray        # [n, 3] noisy gradient observations
    weights: jnp.ndarray  # [3 + m] weights (linear + basis)


def draw_scalar_field(key, x, m: int, LL, theta) -> ScalarFieldDraw:
    """Scalar SE-kernel GP draw at points x [n, d].

    theta = [lengthScale, magnSigma2, sigma2] (gp_rnd_SE1D_fast.m:73-85).
    """
    LL = np.asarray(LL, dtype=np.float64)
    x = jnp.asarray(x) - jnp.asarray(domain_center(LL), x.dtype)
    basis = hypercube_basis(m, LL)
    length_scale, magn_sigma2, sigma2 = [jnp.asarray(t) for t in theta]
    k = se_spectral_density(
        jnp.asarray(np.sqrt(basis.eigenvalues), x.dtype),
        length_scale, magn_sigma2, basis.d,
    )
    kw, kn = jax.random.split(key)
    w = jnp.sqrt(k) * jax.random.normal(kw, (m,), dtype=x.dtype)
    f = basis.phi(x) @ w
    y = f + jnp.sqrt(sigma2) * jax.random.normal(kn, f.shape, dtype=x.dtype)
    return ScalarFieldDraw(f=f, y=y, weights=w)


def draw_scalar_potential_field(key, x, m: int, LL, theta) -> PotentialFieldDraw:
    """Curl-free 3D field draw: y = grad f + noise, f ~ GP(0, k_lin + k_SE).

    theta = [linSigma2, lengthScale, magnSigma2, sigma2]
    (gp_rnd_scalar_potential_fast.m:84-102).
    """
    LL = np.asarray(LL, dtype=np.float64)
    x = jnp.asarray(x) - jnp.asarray(domain_center(LL), x.dtype)
    sp = ScalarPotentialBasis(hypercube_basis(m, LL))
    lin_sigma2, length_scale, magn_sigma2, sigma2 = [
        jnp.asarray(t) for t in theta
    ]
    k = linear_plus_se_spectral(
        jnp.asarray(np.sqrt(sp.basis.eigenvalues), x.dtype),
        lin_sigma2, length_scale, magn_sigma2, sp.basis.d,
    )
    kw, kn = jax.random.split(key)
    w = jnp.sqrt(k) * jax.random.normal(kw, (sp.n_lin,), dtype=x.dtype)
    f = sp.potential_row(x) @ w
    df = jnp.einsum("nij,j->ni", sp.grad_blocks(x), w)
    y = df + jnp.sqrt(sigma2) * jax.random.normal(kn, df.shape, dtype=x.dtype)
    return PotentialFieldDraw(f=f, df=df, y=y, weights=w)
