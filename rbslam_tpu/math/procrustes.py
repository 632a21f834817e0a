"""Procrustes alignment (scale + rotation/reflection + translation).

Reproduces MATLAB ``procrustes(X, Y)`` as used for the reference's ATE
metrics (run_dense3D_magfield.m:155-160, calc_rmses.m:35-55): find scale
``b``, orthogonal ``T`` (reflections allowed) and translation ``c``
minimizing ``||X - b*Y*T - c||_F``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class ProcrustesTransform(NamedTuple):
    b: jnp.ndarray  # scalar scale
    T: jnp.ndarray  # [d, d] orthogonal (right-multiplies row vectors)
    c: jnp.ndarray  # [d] translation


def procrustes(X, Y):
    """Align Y (rows = points) onto X. Returns (Z, transform) with
    ``Z = b * Y @ T + c``."""
    muX = jnp.mean(X, axis=0)
    muY = jnp.mean(Y, axis=0)
    X0 = X - muX
    Y0 = Y - muY
    normX = jnp.linalg.norm(X0)
    normY = jnp.linalg.norm(Y0)
    X0n = X0 / normX
    Y0n = Y0 / normY
    A = X0n.T @ Y0n
    U, s, Vt = jnp.linalg.svd(A, full_matrices=False)
    T = Vt.T @ U.T
    traceTA = jnp.sum(s)
    b = traceTA * normX / normY
    c = muX - b * muY @ T
    Z = b * Y @ T + c
    return Z, ProcrustesTransform(b=b, T=T, c=c)


def procrustes_transform(points, tf: ProcrustesTransform):
    """Apply a previously computed transform to new points (calc_rmses.m:38-46)."""
    return tf.b * points @ tf.T + tf.c
