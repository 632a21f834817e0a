"""Spectral densities for the reduced-rank GP priors.

Reference: the squared-exponential spectral density used by every dense
workload (run_dense2D_withHeading.m:126-128, run_dense3D_magfield.m:103-107)
and the linear-kernel prepend for the scalar-potential model
(gp_rnd_scalar_potential_fast.m:63-68).
"""

from __future__ import annotations

import jax.numpy as jnp


def se_spectral_density(w, length_scale, magn_sigma2, d: int):
    """S_SE(w) = magnSigma2 (2 pi)^{d/2} l^d exp(-w^2 l^2 / 2).

    ``w`` is |omega| = sqrt(eigenvalue).
    """
    return (
        magn_sigma2
        * jnp.sqrt(2.0 * jnp.pi) ** d
        * length_scale**d
        * jnp.exp(-(w**2) * length_scale**2 / 2.0)
    )


def linear_plus_se_spectral(w, lin_sigma2, length_scale, magn_sigma2, d: int):
    """Prior variances for [3 linear-kernel states; m SE basis weights].

    Matches ``S = [linSigma2;linSigma2;linSigma2; Sse(w)]``
    (run_dense3D_magfield.m:105-107).
    """
    se = se_spectral_density(w, length_scale, magn_sigma2, d)
    lin = jnp.full((3,), lin_sigma2, dtype=se.dtype)
    return jnp.concatenate([lin, se])
