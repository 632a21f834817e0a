"""Map-axis (basis-block) model parallelism for the information-form
smoother's ancestor-weight machinery — the Schur-style block reduction
of SURVEY §2.4 row 2.

Why this exists: at mag-localization scale (m = 1000 basis functions,
nl = 3 + m ≈ 1003) the per-particle matrices W = (Imat + ImatAdd)^-1
and P are nl x nl each — ~4 MB/particle f32, ~4 GB for N_P = 1000, per
MATRIX. One chip cannot hold the ensemble; the `map` mesh axis shards
the ROW block of each matrix so per-device memory scales 1/S_map
(reference semantics: src/particleSmootherInformationForm.m:224-236,
the nLin x nLin ancestor-weight algebra).

These are EXPLICIT `shard_map` collectives (not GSPMD inference), so
the communication per Woodbury transition is known by construction:

- ``Bpos`` reduction: one psum of [N, ny, ny]       (tiny, ny <= 3)
- ``G`` row exchange: one all_gather of [N, nl, ny] (the Schur coupling
  term between row blocks; O(N nl ny) — a factor nl/ny less than the
  O(N nl^2) matrices that stay put)
- quadratic reduction: one psum of [N]              (per ancestor step)

The row-sharded Woodbury transition is algebraically identical to
engines/rbps_info._woodbury_rank_ny (tests/test_sharding.py asserts
element-for-element equality on the 8-device CPU mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_MAP = "map"
_PART = "particles"


def _row_slice(full, axis_name=_MAP):
    """This shard's row block of a replicated [..., nl, ...] tensor
    (axis -2 for U [N, nl, ny]; static local size)."""
    idx = jax.lax.axis_index(axis_name)
    n_shards = jax.lax.axis_size(axis_name)
    nl = full.shape[-2]
    r_loc = nl // n_shards
    return jax.lax.dynamic_slice_in_dim(full, idx * r_loc, r_loc, axis=-2)


def woodbury_rank_ny_rowsharded(mesh: Mesh):
    """Build the row-sharded Woodbury rank-ny transition.

    Returns ``f(W, hldM, U, sign) -> (W', hldM', retried)`` where
    W [N, nl, nl] is sharded (particles, map-rows), U [N, nl, ny] and
    hldM [N] are particle-sharded/replicated-over-map, and the update
    is  W' = W - sign * G Bpos^-1 G',  G = W U,
        Bpos = I + sign U' G,  hldM' = hldM + 0.5 log|Bpos|
    — exactly engines/rbps_info._woodbury_rank_ny, with the row blocks
    of W never leaving their device.
    """
    from ..ops.kalman import _chol_small_batched, _inv_from_chol_small_batched

    def inner(W_blk, hldM, U, sign, jitter):
        # W_blk [n_loc, r_loc, nl] — this device's row block
        ny = U.shape[-1]
        G_blk = jnp.einsum(
            "pij,pjk->pik", W_blk, U, preferred_element_type=jnp.float32
        )                                           # [n_loc, r_loc, ny]
        U_rows = _row_slice(U)                      # [n_loc, r_loc, ny]
        Bpos_part = jnp.einsum(
            "pji,pjk->pik", U_rows, G_blk, preferred_element_type=jnp.float32
        )
        Bpos = jnp.eye(ny, dtype=jnp.float32) + sign * jax.lax.psum(
            Bpos_part, _MAP
        )                                           # replicated [n_loc, ny, ny]
        L, retried = _chol_small_batched(Bpos, jitter)
        Binv = _inv_from_chol_small_batched(L)
        hldM_new = hldM + jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1
        )
        # Schur coupling: every row block needs ALL of G's rows for the
        # outer product — one all_gather of the thin [N, nl, ny] factor
        G_full = jax.lax.all_gather(
            G_blk, _MAP, axis=1, tiled=True
        )                                           # [n_loc, nl, ny]
        GB = jnp.einsum("pik,pkl->pil", G_blk, Binv)
        corr = jnp.einsum(
            "pil,pjl->pij", GB, G_full, preferred_element_type=jnp.float32
        )                                           # [n_loc, r_loc, nl]
        W_new = W_blk - (sign * corr).astype(W_blk.dtype)
        return W_new, hldM_new, retried

    def f(W, hldM, U, sign, jitter=1e-9):
        return jax.shard_map(
            lambda w, h, u: inner(w, h, u, sign, jitter),
            mesh=mesh,
            in_specs=(P(_PART, _MAP, None), P(_PART), P(_PART, None, None)),
            out_specs=(P(_PART, _MAP, None), P(_PART), P(_PART)),
            check_vma=False,
        )(W, hldM, U)

    return f


def quad_form_rowsharded(mesh: Mesh):
    """Build ``q(v, W) -> v' W v`` per particle with W row-sharded.

    Each device contributes v[rows]' (W_blk v) and one scalar psum per
    particle reduces across the map axis — the ancestor-weight quadratic
    1/2 (ivec+ivecAdd)' W (ivec+ivecAdd) of
    src/particleSmootherInformationForm.m:224-236 without ever
    materializing W on one device.
    """

    def inner(v, W_blk):
        Wv = jnp.einsum(
            "pij,pj->pi", W_blk, v, preferred_element_type=jnp.float32
        )                                           # [n_loc, r_loc]
        v_rows = _row_slice(v[..., None])[..., 0]   # [n_loc, r_loc]
        part = jnp.sum(v_rows * Wv, axis=-1)
        return jax.lax.psum(part, _MAP)

    def q(v, W):
        return jax.shard_map(
            inner,
            mesh=mesh,
            in_specs=(P(_PART, None), P(_PART, _MAP, None)),
            out_specs=P(_PART),
            check_vma=False,
        )(v, W)

    return q
