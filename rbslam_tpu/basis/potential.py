"""Curl-free (scalar-potential) field basis: gradient observations.

The magnetic-field model observes the *gradient* of a scalar potential
``f ~ GP(0, k_lin + k_SE)``: ``y = grad f + noise``. In reduced rank this
means the measurement matrix rows are the gradients of the basis
functions, with three prepended columns from the linear kernel
(gp_rnd_scalar_potential_fast.m:63-68, run_dense3D_magfield.m:265-279):

    dPhi_x = [1 0 0 | d phi/dx],  dPhi_y = [0 1 0 | d phi/dy],  ...

so the full per-point measurement matrix is ``C(x) [3, 3+m]`` and the map
state is ``xl = [bias-like linear weights (3); basis weights (m)]``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from .laplace import LaplaceBasis


@dataclass(frozen=True)
class ScalarPotentialBasis:
    """Gradient-observation basis with linear-kernel prepend (nLin = 3 + m)."""

    basis: LaplaceBasis

    @property
    def n_lin(self) -> int:
        return 3 + self.basis.m

    def grad_blocks(self, x):
        """C(x): [..., 3, 3+m] — rows are [I_3 | grad phi(x)].

        ``C(x) @ xl`` is the navigation-frame field at x.
        """
        g = self.basis.grad_phi(x)                      # [..., 3, m]
        eye = jnp.broadcast_to(
            jnp.eye(3, dtype=x.dtype), g.shape[:-1] + (3,)
        )
        return jnp.concatenate([eye, g], axis=-1)

    def potential_row(self, x):
        """[x | phi(x)] row of the potential itself: [..., 3+m]."""
        return jnp.concatenate([x, self.basis.phi(x)], axis=-1)

    def hess_blocks(self, x):
        """d C / d x: [..., 3, 3, 3+m] Hessian of the field wrt position.

        Zero for the three linear columns (constant gradient); equals the
        basis Hessian for the SE columns (tools/JacobianPhi3D.m usage at
        run_dense3D_magfield.m:292-296).
        """
        H = self.basis.hess_phi(x)                      # [..., 3, 3, m]
        zeros = jnp.zeros(H.shape[:-1] + (3,), dtype=x.dtype)
        return jnp.concatenate([zeros, H], axis=-1)
