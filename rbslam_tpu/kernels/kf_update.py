"""Pallas TPU kernel: fused ancestor-gather + dense Kalman measurement
update.

The RBPF hot loop moves the per-particle covariance tensor
P [N, nl, nl] through HBM three times per step on the XLA path: the
resampling gather (jnp.take), the innovation/gain contraction, and the
covariance downdate (SURVEY §3.1 dominant cost; src/particleFilter.m:
104-113,163-204). This kernel does the whole thing in ONE pass: each
grid step DMAs the *ancestor's* covariance P[ai[i]] straight into VMEM
(ancestor indices arrive via scalar prefetch), runs the small-ny update
entirely on-chip, and writes the updated covariance once:

    U  = P a C_i^T                  [nl, ny]
    S  = C_i U + R                  [ny, ny]   (+ jitter if not PD)
    L  = chol(S)  (closed form, ny <= 3)
    logw_i = -sum log diag L - 1/2 |L^-1 e|^2 - ny/2 log 2pi
    K  = U S^-1
    xl' = xl + K e,   P' = P - U S^-1 U^T

HBM traffic: one read + one write of P per particle (the information-
theoretic minimum for a resampled update), ~3x less than the XLA path.
ny is restricted to 1..3 (covers every reference workload: radio ny=1,
magnetic ny=3); larger ny falls back to ops/kalman.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2PI = float(np.log(2.0 * np.pi))


def _chol_small(S, ny: int, jitter: float):
    """Closed-form lower Cholesky of a tiny SPD matrix with a jitter
    fallback folded in (scalar ops; S is [ny, ny])."""
    # detect non-PD via the pivots; add jitter when any pivot would fail
    def pivots_ok(Sm):
        s11 = Sm[0, 0]
        ok = s11 > 0
        if ny >= 2:
            l21 = Sm[1, 0] / jnp.where(s11 > 0, jnp.sqrt(jnp.abs(s11)), 1.0)
            p2 = Sm[1, 1] - l21 * l21
            ok = ok & (p2 > 0)
        if ny >= 3:
            l11 = jnp.sqrt(jnp.abs(s11))
            l21 = Sm[1, 0] / jnp.where(l11 > 0, l11, 1.0)
            l31 = Sm[2, 0] / jnp.where(l11 > 0, l11, 1.0)
            p2 = Sm[1, 1] - l21 * l21
            l22 = jnp.sqrt(jnp.abs(p2))
            l32 = (Sm[2, 1] - l31 * l21) / jnp.where(l22 > 0, l22, 1.0)
            p3 = Sm[2, 2] - l31 * l31 - l32 * l32
            ok = ok & (p3 > 0)
        return ok

    ok = pivots_ok(S)
    S = jnp.where(ok, S, S + jitter * jnp.eye(ny, dtype=S.dtype))

    L = jnp.zeros_like(S)
    l11 = jnp.sqrt(S[0, 0])
    L = L.at[0, 0].set(l11)
    if ny >= 2:
        l21 = S[1, 0] / l11
        l22 = jnp.sqrt(S[1, 1] - l21 * l21)
        L = L.at[1, 0].set(l21).at[1, 1].set(l22)
    if ny >= 3:
        l31 = S[2, 0] / l11
        l32 = (S[2, 1] - L[1, 0] * l31) / L[1, 1]
        l33 = jnp.sqrt(S[2, 2] - l31 * l31 - l32 * l32)
        L = L.at[2, 0].set(l31).at[2, 1].set(l32).at[2, 2].set(l33)
    return L, ~ok


def _tri_solve_small(L, b, ny: int):
    """Forward-substitute L v = b for tiny ny (unrolled scalars)."""
    v0 = b[0] / L[0, 0]
    vs = [v0]
    if ny >= 2:
        vs.append((b[1] - L[1, 0] * v0) / L[1, 1])
    if ny >= 3:
        vs.append((b[2] - L[2, 0] * vs[0] - L[2, 1] * vs[1]) / L[2, 2])
    return jnp.stack(vs)


def _inv_from_chol_small(L, ny: int):
    """S^-1 = L^-T L^-1 for tiny ny, explicit."""
    # invert L (lower triangular)
    Li = jnp.zeros_like(L)
    Li = Li.at[0, 0].set(1.0 / L[0, 0])
    if ny >= 2:
        Li = Li.at[1, 1].set(1.0 / L[1, 1])
        Li = Li.at[1, 0].set(-L[1, 0] * Li[0, 0] / L[1, 1])
    if ny >= 3:
        Li = Li.at[2, 2].set(1.0 / L[2, 2])
        Li = Li.at[2, 1].set(-L[2, 1] * Li[1, 1] / L[2, 2])
        Li = Li.at[2, 0].set(
            -(L[2, 0] * Li[0, 0] + L[2, 1] * Li[1, 0]) / L[2, 2]
        )
    return Li.T @ Li


def _kernel(ny: int, nl: int, block: int, jitter: float,
            ai_ref, C_ref, xl_ref, e_in_ref, yR_ref,
            P_hbm, P_out_ref, xl_out_ref, logw_ref,
            p_scratch, sem):
    """Grid step: `block` particles. ai_ref is scalar-prefetched."""
    i0 = pl.program_id(0) * block

    # start all ancestor DMAs up front (overlap)
    for b in range(block):
        pltpu.make_async_copy(
            P_hbm.at[ai_ref[i0 + b]], p_scratch.at[b], sem.at[b]
        ).start()

    R = yR_ref[0:ny, :ny]

    for b in range(block):
        pltpu.make_async_copy(
            P_hbm.at[ai_ref[i0 + b]], p_scratch.at[b], sem.at[b]
        ).wait()
        P = p_scratch[b]                       # [nl, nl]
        C = C_ref[b]                           # [ny, nl]
        e = e_in_ref[b, 0:ny]                  # innovation y - C xl (precomp)
        U = jax.lax.dot_general(
            P, C, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                      # [nl, ny]
        S = jax.lax.dot_general(
            C, U, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + R                                  # [ny, ny]
        L, _bad = _chol_small(S, ny, jitter)
        v = _tri_solve_small(L, e, ny)
        logdiag = jnp.log(jnp.diagonal(L))
        logw = (
            -jnp.sum(logdiag)
            - 0.5 * jnp.sum(v * v)
            - 0.5 * ny * _LOG2PI
        )
        Sinv = _inv_from_chol_small(L, ny)
        K = jax.lax.dot_general(
            U, Sinv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                      # [nl, ny]
        xl_out_ref[b, :] = xl_ref[b, :] + jnp.sum(
            K * e[None, :], axis=1
        )
        P_out_ref[b] = P - jax.lax.dot_general(
            K, U, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logw_ref[b, 0] = logw


@functools.partial(
    jax.jit, static_argnames=("ny", "nl", "block", "jitter", "interpret")
)
def _fused_call(ai, C, xl_g, e, yR, P_all, ny, nl, block, jitter,
                interpret):
    n = C.shape[0]
    grid = (n // block,)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, ny, nl), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, nl), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, ny), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ny, ny), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # P_all stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((block, nl, nl), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, nl), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((block, nl, nl), jnp.float32),
            pltpu.SemaphoreType.DMA((block,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, ny, nl, block, jitter),
        out_shape=[
            jax.ShapeDtypeStruct((n, nl, nl), jnp.float32),
            jax.ShapeDtypeStruct((n, nl), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(ai, C, xl_g, e, yR, P_all)


def _chol_scalars(S, ny: int, jitter: float):
    """Scalar-form lower-Cholesky of a tiny SPD matrix (ny <= 3) with the
    jitter fallback folded in. Mosaic has no scatter, so no `.at[].set`:
    everything stays individual scalars. Returns (entries, bad)."""
    s11, s21, s22, s31, s32, s33 = (S[0, 0], None, None, None, None, None)
    if ny >= 2:
        s21, s22 = S[1, 0], S[1, 1]
    if ny >= 3:
        s31, s32, s33 = S[2, 0], S[2, 1], S[2, 2]

    def pivots(s11, s21, s22, s31, s32, s33):
        ok = s11 > 0
        safe = lambda x: jnp.where(x > 0, x, 1.0)
        if ny >= 2:
            l11 = jnp.sqrt(jnp.abs(s11))
            l21 = s21 / safe(l11)
            p2 = s22 - l21 * l21
            ok = ok & (p2 > 0)
        if ny >= 3:
            l31 = s31 / safe(l11)
            l22 = jnp.sqrt(jnp.abs(p2))
            l32 = (s32 - l31 * l21) / safe(l22)
            p3 = s33 - l31 * l31 - l32 * l32
            ok = ok & (p3 > 0)
        return ok

    ok = pivots(s11, s21, s22, s31, s32, s33)
    bad = ~ok
    # scale-aware retry jitter (see ops/kalman._chol_small_batched)
    diag_mean = s11
    if ny == 2:
        diag_mean = 0.5 * (s11 + s22)
    if ny == 3:
        diag_mean = (s11 + s22 + s33) / 3.0
    jit_eff = jitter * jnp.maximum(1.0, diag_mean)
    s11 = jnp.where(ok, s11, s11 + jit_eff)
    if ny >= 2:
        s22 = jnp.where(ok, s22, s22 + jit_eff)
    if ny >= 3:
        s33 = jnp.where(ok, s33, s33 + jit_eff)

    l11 = jnp.sqrt(s11)
    l21 = l22 = l31 = l32 = l33 = None
    if ny >= 2:
        l21 = s21 / l11
        l22 = jnp.sqrt(s22 - l21 * l21)
    if ny >= 3:
        l31 = s31 / l11
        l32 = (s32 - l31 * l21) / l22
        l33 = jnp.sqrt(s33 - l31 * l31 - l32 * l32)
    return (l11, l21, l22, l31, l32, l33), bad


def _solve_logw_scalars(ls, e, ny: int):
    """Whitened residual + Gaussian log-density from scalar Cholesky."""
    l11, l21, l22, l31, l32, l33 = ls
    v1 = e[0] / l11
    vv = v1 * v1
    logdiag = jnp.log(l11)
    if ny >= 2:
        v2 = (e[1] - l21 * v1) / l22
        vv = vv + v2 * v2
        logdiag = logdiag + jnp.log(l22)
    if ny >= 3:
        v3 = (e[2] - l31 * v1 - l32 * v2) / l33
        vv = vv + v3 * v3
        logdiag = logdiag + jnp.log(l33)
    return -logdiag - 0.5 * vv - 0.5 * ny * _LOG2PI


def _sinv_scalars(ls, ny: int):
    """S^-1 entries from the scalar Cholesky: Sinv = Li' Li."""
    l11, l21, l22, l31, l32, l33 = ls
    i11 = 1.0 / l11
    if ny == 1:
        return ((i11 * i11,),)
    i22 = 1.0 / l22
    i21 = -l21 * i11 * i22
    if ny == 2:
        return (
            (i11 * i11 + i21 * i21, i21 * i22),
            (i21 * i22, i22 * i22),
        )
    i33 = 1.0 / l33
    i32 = -l32 * i22 * i33
    i31 = -(l31 * i11 + l32 * i21) * i33
    return (
        (i11 * i11 + i21 * i21 + i31 * i31,
         i21 * i22 + i31 * i32, i31 * i33),
        (i21 * i22 + i31 * i32, i22 * i22 + i32 * i32, i32 * i33),
        (i31 * i33, i32 * i33, i33 * i33),
    )


def _kernel_1pass(ny: int, nl: int, block: int, jitter: float,
                  ai_ref, C_ref, e_ref, xl_ref, R_ref,
                  P_hbm,
                  P_out_ref, xl_out_ref, logw_ref, bad_ref,
                  pbuf, sems):
    """One-pass fused gather + KF update, double-buffered across grid
    steps: while block i computes, block i+1's ancestor rows are already
    in flight (B row-DMAs per step, issued one grid step ahead), so the
    gather latency hides behind the small-matrix compute. P is read once
    and written once — the information-theoretic minimum for a resampled
    covariance update."""
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    def issue(block_idx, slot):
        base = block_idx * block
        for b in range(block):
            pltpu.make_async_copy(
                P_hbm.at[ai_ref[base + b]], pbuf.at[slot, b],
                sems.at[slot, b],
            ).start()

    @pl.when(i == 0)
    def _():
        issue(0, 0)

    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    @pl.when(i + 1 < n_blocks)
    def _():
        issue(i + 1, nxt)

    R = R_ref[0:ny, 0:ny]
    for b in range(block):
        pltpu.make_async_copy(
            P_hbm.at[ai_ref[i * block + b]], pbuf.at[slot, b],
            sems.at[slot, b],
        ).wait()
        P = pbuf[slot, b].astype(jnp.float32)      # [nl, nl]
        C = C_ref[b]                               # [ny, nl]
        e = e_ref[b, 0:ny]
        U = jax.lax.dot_general(                   # P C' : [nl, ny]
            P, C, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        S = jax.lax.dot_general(
            C, U, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + R
        ls, bad = _chol_scalars(S, ny, jitter)
        logw = _solve_logw_scalars(ls, e, ny)
        Sinv = _sinv_scalars(ls, ny)
        # K columns as scalar-weighted sums of U's columns (no small
        # matmuls, no scatter): K[:, j] = sum_i U[:, i] Sinv[i][j]
        ucols = [U[:, m:m + 1] for m in range(ny)]
        kcols = [
            sum(ucols[m] * Sinv[m][j] for m in range(ny))
            for j in range(ny)
        ]
        xl_new = xl_ref[b, :]
        for j in range(ny):
            xl_new = xl_new + kcols[j][:, 0] * e[j]
        xl_out_ref[b, :] = xl_new
        K = kcols[0] if ny == 1 else jnp.concatenate(kcols, axis=1)
        down = jax.lax.dot_general(                # K U' : [nl, nl]
            K, U, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        P_out_ref[b] = (P - down).astype(P_out_ref.dtype)
        logw_ref[b, 0] = logw
        bad_ref[b, 0] = bad.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("ny", "nl", "block", "jitter", "interpret")
)
def _fused_1pass_call(ai, C, xl_g, e, R_pad, P_all, ny, nl, block, jitter,
                      interpret):
    n = C.shape[0]
    grid = (n // block,)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, ny, nl), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, ny), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, nl), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ny, ny), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # P_all stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((block, nl, nl), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, nl), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block, nl, nl), P_all.dtype),
            pltpu.SemaphoreType.DMA((2, block)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_1pass, ny, nl, block, jitter),
        out_shape=[
            jax.ShapeDtypeStruct((n, nl, nl), P_all.dtype),
            jax.ShapeDtypeStruct((n, nl), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(ai, C, e, xl_g, R_pad, P_all)


def fused_gather_kf_update_1pass(ai, C, xl_gathered, P_all, y, R,
                                 jitter: float = 1e-3, block: int = 16):
    """Single-HBM-pass fused resampling-gather + dense KF update.

    ai [N] ancestor indices (any order; systematic resampling emits them
    sorted, which makes the row fetches near-streaming); C [N, ny, nl]
    Jacobians at the propagated particles; xl_gathered [N, nl];
    P_all [N, nl, nl] pre-resampling covariances (f32 or bf16 storage);
    y [ny]; R [ny, ny]. Requires ny <= 3 and nl aligned to the sublane
    tile of P's dtype (8 f32 / 16 bf16; engines pad, rbpf.py).
    Returns (xl', P', logw, retried) — same contract as
    ops.kalman.kalman_update_dense_batched (no trailing symmetrize; the
    K U' downdate is symmetric up to fp rounding).
    """
    n, ny, nl = C.shape
    if ny > 3:
        raise ValueError("fused KF kernel supports ny <= 3")
    if nl % 128:
        # manual DMA row slices must be lane-tile (128) aligned. The lane
        # (last) axis pads to 128 for free in the physical layout, but the
        # sublane (second-to-last) axis only pads to 8 — so rounding nl up
        # to a 128 multiple DOES add real HBM traffic on that axis when nl
        # is far from one (e.g. 515 -> 640 is ~+24%); choose nl accordingly
        raise ValueError(f"nl={nl} must be a multiple of 128 (pad upstream)")
    # VMEM budget: two double-buffer slots + pipelined out blocks
    bytes_per_row = nl * nl * P_all.dtype.itemsize
    while block > 1 and (4 * block * bytes_per_row > 8 * 1024 * 1024
                         or n % block):
        block //= 2
    interpret = jax.default_backend() != "tpu"
    e = y[None, :] - jnp.einsum("pij,pj->pi", C, xl_gathered)
    P_new, xl_new, logw, bad = _fused_1pass_call(
        ai.astype(jnp.int32), C.astype(jnp.float32),
        xl_gathered.astype(jnp.float32), e.astype(jnp.float32),
        jnp.asarray(R, jnp.float32), P_all,
        ny, nl, block, jitter, interpret,
    )
    return xl_new, P_new, logw[:, 0], bad[:, 0].astype(bool)


def _gather_u_kernel(ai_ref, C_ref, P_ref, U_ref):
    """U = P[ai[i]] @ C[i]^T — the gather rides the Pallas input pipeline
    (P's BlockSpec index_map reads the scalar-prefetched ancestors).
    P may be stored bf16 (covariance carry); compute in f32."""
    P = P_ref[0].astype(jnp.float32)
    U_ref[0] = jax.lax.dot_general(
        P, C_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _gather_downdate_kernel(ai_ref, M_ref, U_ref, P_ref, P_out_ref):
    """P_new = P[ai[i]] - M[i] @ U[i]^T — second (final) P pass."""
    P = P_ref[0].astype(jnp.float32)
    P_new = P - jax.lax.dot_general(
        M_ref[0], U_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    P_out_ref[0] = P_new.astype(P_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_u_call(ai, C, P_all, interpret):
    n, ny, nl = C.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, ny, nl), lambda i, ai_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nl, nl), lambda i, ai_ref: (ai_ref[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nl, ny), lambda i, ai_ref: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _gather_u_kernel,
        out_shape=jax.ShapeDtypeStruct((n, nl, ny), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ai, C, P_all)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_downdate_call(ai, M, U, P_all, interpret):
    n, nl, ny = U.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, nl, ny), lambda i, ai_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nl, ny), lambda i, ai_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nl, nl), lambda i, ai_ref: (ai_ref[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nl, nl), lambda i, ai_ref: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _gather_downdate_kernel,
        out_shape=jax.ShapeDtypeStruct((n, nl, nl), P_all.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ai, M, U, P_all)


def fused_gather_kf_update_2pass(ai, C, xl_gathered, P_all, y, R,
                                 jitter: float = 1e-3, block: int = 8):
    """Two-kernel fused gather + KF update.

    Pass 1 (Pallas): U = P[ai] C^T (gather fused into the contraction).
    XLA: S = C U + R (ny x ny), batched Cholesky + log-weights, gain
    factor M = U S^-1, state update (all cheap, O(N nl ny)).
    Pass 2 (Pallas): P' = P[ai] - M U^T.

    Three total passes over the covariance tensor vs the XLA path's
    gather + multi-pass update; no small-matrix algebra inside Mosaic.
    """
    from ..math.linalg import gaussian_logpdf_chol, psd_cholesky, solve_psd
    from ..ops.kalman import (
        _LOG2PI,
        _chol_small_batched,
        _inv_from_chol_small_batched,
        _tri_solve_small_batched,
    )

    n, ny, nl = C.shape
    interpret = jax.default_backend() != "tpu"
    ai = ai.astype(jnp.int32)

    U = _gather_u_call(ai, C, P_all, interpret)              # [N, nl, ny]
    S = jnp.einsum("pij,pjk->pik", C, U) + R
    e = y[None, :] - jnp.einsum("pij,pj->pi", C, xl_gathered)
    if ny <= 3:
        L, retried = _chol_small_batched(S, jitter)
        v = _tri_solve_small_batched(L, e)
        logw = (
            -jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
            - 0.5 * jnp.sum(v * v, axis=-1)
            - 0.5 * ny * _LOG2PI
        )
        M = jnp.einsum("pij,pjk->pik", U, _inv_from_chol_small_batched(L))
    else:
        L, retried = psd_cholesky(S, jitter)
        logw = gaussian_logpdf_chol(e, L)
        M = jnp.swapaxes(solve_psd(L, jnp.swapaxes(U, -1, -2)), -1, -2)
    xl_new = xl_gathered + jnp.einsum("pij,pj->pi", M, e)
    P_new = _gather_downdate_call(ai, M, U, P_all, interpret)
    return xl_new, P_new, logw, retried


def _sum_all(M, ny):
    """sum_ij M[b, i, j] as [B, 1, 1] via two dot_generals against a ones
    vector — NOT jnp.sum(keepdims): on this toolchain keepdims reductions
    lower to rank-changing vector reshapes that abort Mosaic's layout
    inference, and sublane slicing (the other route to scalars) silently
    combines mismatched vreg offsets. dot_general is the one primitive
    verified correct here."""
    u = jnp.ones((ny, 1), dtype=M.dtype)
    Mu = jax.lax.dot_general(
        M, u, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # [B, ny, 1]
    return jax.lax.dot_general(
        Mu, u, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # [B, 1, 1]


def _trace(M, ny):
    """tr(M) per batch element as [B, 1, 1] (eye-masked _sum_all)."""
    eye = jax.lax.broadcasted_iota(jnp.int32, (1, ny, ny), 1) == \
        jax.lax.broadcasted_iota(jnp.int32, (1, ny, ny), 2)
    return _sum_all(M * eye.astype(M.dtype), ny)


def _spd_inv_logdet(S, ny: int, jitter: float):
    """Batched closed-form inverse + log-det of tiny SPD matrices via
    Cayley-Hamilton trace identities — matrix ops only, slice-free.

    For symmetric S with real eigenvalues, the characteristic-polynomial
    coefficients e1 = tr S, e2 = (tr^2 - ||S||_F^2)/2, e3 = det are all
    positive iff S is PD, which doubles as the jitter trigger (the
    scale-aware retry of ops/kalman). The jitter is folded in
    ALGEBRAICALLY — det(S + jI) = e3 + e2 j + e1 j^2 + j^3 and
    (S + jI)^2 = S^2 + 2jS + j^2 I — so the invariants are computed once
    and exactly one batched small matmul (S^2, ny == 3 only) runs per
    call. Returns (Sinv, logdet [B,1,1], bad [B,1,1] bool).
    """
    eye = (jax.lax.broadcasted_iota(jnp.int32, (1, ny, ny), 1) ==
           jax.lax.broadcasted_iota(jnp.int32, (1, ny, ny), 2)
           ).astype(S.dtype)

    t1 = _trace(S, ny)
    if ny == 1:
        bad = S <= 0
        j = jnp.where(bad, jitter * jnp.maximum(1.0, t1), 0.0)
        S = S + j
        return 1.0 / S, jnp.log(S), bad

    t2 = _sum_all(S * S, ny)          # tr(S^2) = ||S||_F^2 (S symmetric)
    e2 = 0.5 * (t1 * t1 - t2)
    if ny == 2:
        bad = (t1 <= 0) | (e2 <= 0)
        j = jnp.where(bad, jitter * jnp.maximum(1.0, 0.5 * t1), 0.0)
        det = e2 + j * t1 + j * j
        t1 = t1 + 2.0 * j
        S = S + j * eye
        return (t1 * eye - S) / det, jnp.log(det), bad

    S2 = jax.lax.dot_general(
        S, S, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    t3 = _sum_all(S2 * S, ny)         # tr(S^3), S symmetric
    e3 = (t1 * t1 * t1 - 3.0 * t1 * t2 + 2.0 * t3) / 6.0
    bad = (t1 <= 0) | (e2 <= 0) | (e3 <= 0)
    j = jnp.where(bad, jitter * jnp.maximum(1.0, t1 / 3.0), 0.0)
    det = e3 + e2 * j + t1 * j * j + j * j * j
    S2 = S2 + 2.0 * j * S + j * j * eye
    S = S + j * eye
    t1n = t1 + 3.0 * j
    t2n = t2 + 2.0 * j * (t1 + j) + j * j    # tr((S + jI)^2)
    e2n = 0.5 * (t1n * t1n - t2n)
    Sinv = (S2 - t1n * S + e2n * eye) / det
    return Sinv, jnp.log(det), bad


def _block_update_math(ny, jitter, C, P, e_ref, xl_ref, R_ref,
                       P_out_ref, xl_out_ref, logw_ref, bad_ref):
    # P arrives in its STORAGE dtype (bf16 or f32) and is never cast as a
    # full tensor: the MXU consumes bf16 operands natively with f32
    # accumulation (preferred_element_type), so the only extra rounding
    # vs an f32 pipeline is the final downdate subtract in storage dtype
    # — which the XLA path's output cast performs anyway.
    """Shared blocked KF-update algebra (one particle block).

    The two O(nl^2)-per-particle products (CP = C P and the rank-ny
    downdate) run as batch-dimension `dot_general`s on the MXU —
    measured at the P copy-bandwidth floor at nl=128. The small-ny
    algebra between them is SLICE-FREE by design: Cayley-Hamilton
    inverse/log-det (_spd_inv_logdet) on the full [B, ny, ny] tensor.
    Slicing the ny (sublane) axis is forbidden in this kernel — Mosaic
    gives each sliced [B, 1] vector a distinct sublane offset and (on
    this toolchain) combines mismatched offsets without relayout,
    producing silently wrong hardware results that interpret mode does
    not reproduce. In-kernel RESHAPES are also forbidden (the layout
    inferer aborts on rank-changing vector reshapes): e arrives [B,1,ny],
    xl [B,1,nl], and logw/bad leave as [B,1,1].
    """

    # CP[b] = C[b] @ P[b] — batched MXU matmul (the N*nl*nl MACs)
    CP3 = jax.lax.dot_general(
        C.astype(P.dtype), P, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                              # [B, ny, nl]

    # innovation covariance S = C P C' + R — batched [B, ny, ny]
    S = jax.lax.dot_general(
        CP3, C, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) + R_ref[...][None, :, :]

    Sinv, logdet, bad = _spd_inv_logdet(S, ny, jitter)

    # whitened quadratic + log-weight: e' S^-1 e via full-tensor products
    e_row = e_ref[...]                             # [B, 1, ny]
    eS = jax.lax.dot_general(
        e_row, Sinv, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                              # [B, 1, ny]
    quad = jax.lax.dot_general(
        eS, e_row, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                              # [B, 1, 1]
    logw_ref[...] = -0.5 * quad - 0.5 * logdet - 0.5 * ny * _LOG2PI
    bad_ref[...] = bad.astype(jnp.int32)

    # gain rows K3 = Sinv CP  (K = (CP)' Sinv, matching ops/kalman's
    # einsum("pji,pjk->pik", CP, Sinv) with Sinv symmetric)
    K3 = jax.lax.dot_general(
        Sinv, CP3, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                              # [B, ny, nl]
    xl_step = jax.lax.dot_general(
        e_row, K3, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                              # [B, 1, nl]
    xl_out_ref[...] = xl_ref[...] + xl_step

    # covariance downdate P'[b] = P[b] - CP[b]' K3[b] — second batched
    # MXU matmul (contract the ny axis). This is the only [nl, nl]-output
    # matmul in the kernel — the MXU streams nl rows per particle for it,
    # so it dominates the kernel's cycle count. Feed it operands in the
    # STORAGE dtype: with bf16 covariance the MXU runs native-bf16 passes
    # (f32 operands cost 3x passes via bf16x3), and the extra rounding is
    # below the bf16 quantization of the P' store that follows.
    dd = jax.lax.dot_general(
        CP3.astype(P.dtype), K3.astype(P.dtype), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                              # [B, nl, nl]
    P_out_ref[...] = P - dd.astype(P.dtype)


def _kernel_block(ny: int, jitter: float,
                  C_ref, e_ref, xl_ref, R_ref,
                  P_ref,
                  P_out_ref, xl_out_ref, logw_ref, bad_ref):
    """Single-pass blocked KF update over pre-gathered covariances.

    One grid step = `block` particles, streamed through the automatic
    Pallas input/output pipeline (P block in, P block out — one HBM read
    + one write of P total, vs read+materialized-f32-downdate+write on
    the XLA path).
    """
    _block_update_math(
        ny, jitter, C_ref[...], P_ref[...],
        e_ref, xl_ref, R_ref, P_out_ref, xl_out_ref, logw_ref, bad_ref,
    )


def _kernel_block_gather(ny: int, block: int, jitter: float,
                         ai_ref, C_ref, e_ref, xl_ref, R_ref,
                         P_hbm,
                         P_out_ref, xl_out_ref, logw_ref, bad_ref,
                         pbuf, sems):
    """Gather-fused blocked KF update: the resampling gather of P rides
    per-particle lookahead DMAs instead of a materialized `jnp.take`.

    While block i computes on the MXU/VPU, block i+1's ancestor
    covariances P[ai] are already in flight (issued one grid step ahead
    into the other half of a double buffer), so the gather costs only
    the HBM *read* of the ancestors — the XLA path additionally writes
    and re-reads the full gathered [N, nl, nl] tensor. Total P traffic
    per step drops from ~2 reads + 2 writes to 1 read + 1 write — the
    information-theoretic minimum for a resampled covariance update
    (reference semantics: src/particleFilter.m:104-113,163-204).
    """
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    def issue(block_idx, slot):
        base = block_idx * block
        for b in range(block):
            pltpu.make_async_copy(
                P_hbm.at[ai_ref[base + b]], pbuf.at[slot, b],
                sems.at[slot, b],
            ).start()

    @pl.when(i == 0)
    def _():
        issue(0, 0)

    slot = jax.lax.rem(i, 2)

    @pl.when(i + 1 < n_blocks)
    def _():
        issue(i + 1, jax.lax.rem(i + 1, 2))

    for b in range(block):
        pltpu.make_async_copy(
            P_hbm.at[ai_ref[i * block + b]], pbuf.at[slot, b],
            sems.at[slot, b],
        ).wait()

    P = pbuf[slot]                                 # [B, nl, nl]
    _block_update_math(
        ny, jitter, C_ref[...], P,
        e_ref, xl_ref, R_ref, P_out_ref, xl_out_ref, logw_ref, bad_ref,
    )


@functools.partial(
    jax.jit, static_argnames=("ny", "nl", "block", "jitter", "interpret")
)
def _block_gather_call(ai, C, e, xl, R, P_all, ny, nl, block, jitter,
                       interpret):
    n = e.shape[0]
    grid = (n // block,)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, ny, nl), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1, ny), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1, nl), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ny, ny), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # P_all stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((block, nl, nl), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1, nl), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block, nl, nl), P_all.dtype),
            pltpu.SemaphoreType.DMA((2, block)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_block_gather, ny, block, jitter),
        out_shape=[
            jax.ShapeDtypeStruct((n, nl, nl), P_all.dtype),
            jax.ShapeDtypeStruct((n, 1, nl), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, 1), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(ai, C, e[:, None, :], xl[:, None, :], R, P_all)


def kf_update_block_gather(ai, C, xl_gathered, P_all, y, R,
                           jitter: float = 1e-3, block: int = 32):
    """Gather-fused blocked dense KF update (ONE HBM read + write of P).

    ai [N] ancestor indices (systematic resampling emits them sorted —
    near-streaming fetch order); C [N, ny, nl] Jacobians at the
    propagated particles; xl_gathered [N, nl] (the xl gather is [N, nl]
    — negligible next to P — and stays in XLA); P_all [N, nl, nl]
    PRE-resampling covariances (f32 or bf16); y [ny]; R [ny, ny].
    Returns (xl', P', logw, retried) — identical contract (and algebra,
    up to fp ordering) to ops.kalman.kalman_update_dense_batched with
    symmetrize_out=False. ny <= 3; nl must be lane-aligned (pad upstream,
    see rbpf.py).
    """
    n, ny, nl = C.shape
    if ny > 3:
        raise ValueError("blocked KF kernel supports ny <= 3")
    if nl % 128:
        raise ValueError(f"nl={nl} must be a multiple of 128 (pad upstream)")
    while block > 1 and n % block:
        block //= 2
    # VMEM budget: 2-slot P double buffer + pipelined out blocks + f32
    # temporaries (P cast + downdate)
    bytes_blk = block * nl * nl
    while block > 1 and bytes_blk * (4 * P_all.dtype.itemsize + 12) \
            > 13 * 1024 * 1024:
        block //= 2
        bytes_blk //= 2
    interpret = jax.default_backend() != "tpu"
    C = C.astype(jnp.float32)
    e = y[None, :] - jnp.einsum("pij,pj->pi", C, xl_gathered)
    P_new, xl_new, logw, bad = _block_gather_call(
        ai.astype(jnp.int32), C, e.astype(jnp.float32),
        xl_gathered.astype(jnp.float32), jnp.asarray(R, jnp.float32),
        P_all, ny, nl, block, jitter, interpret,
    )
    return (xl_new[:, 0, :], P_new, logw[:, 0, 0],
            bad[:, 0, 0].astype(bool))


@functools.partial(
    jax.jit, static_argnames=("ny", "nl", "block", "jitter", "interpret")
)
def _block_call(C, e, xl, R, P_all, ny, nl, block, jitter, interpret):
    n = e.shape[0]
    grid = (n // block,)
    return pl.pallas_call(
        functools.partial(_kernel_block, ny, jitter),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, ny, nl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1, ny), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1, nl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ny, ny), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, nl, nl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, nl, nl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1, nl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, nl, nl), P_all.dtype),
            jax.ShapeDtypeStruct((n, 1, nl), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(C, e[:, None, :], xl[:, None, :], R, P_all)


def kf_update_block(C, P_gathered, xl_gathered, y, R,
                    jitter: float = 1e-3, block: int = 32):
    """Blocked single-HBM-pass dense KF update (post-gather).

    The resampling gather stays in XLA (`jnp.take` streams P once); this
    kernel then performs the innovation weighing + Kalman update with
    exactly one further read and one write of the covariance tensor —
    the XLA path instead materializes the [N, nl, nl] f32 downdate
    (src/particleFilter.m:163-204 semantics; ops/kalman.py math). ny <= 3.

    C [N, ny, nl] Jacobians at the propagated particles;
    P_gathered [N, nl, nl] (f32 or bf16 storage); xl_gathered [N, nl];
    y [ny]; R [ny, ny]. Returns (xl', P', logw, retried) — identical
    contract (and algebra, up to fp ordering) to
    ops.kalman.kalman_update_dense_batched with symmetrize_out=False.
    """
    n, ny, nl = C.shape
    if ny > 3:
        raise ValueError("blocked KF kernel supports ny <= 3")
    while block > 1 and n % block:
        block //= 2
    # VMEM budget: in/out P blocks (double-buffered) + f32 temporaries
    bytes_blk = block * nl * nl
    while block > 1 and bytes_blk * (2 * P_gathered.dtype.itemsize + 12) \
            > 12 * 1024 * 1024:
        block //= 2
        bytes_blk //= 2
    interpret = jax.default_backend() != "tpu"
    C = C.astype(jnp.float32)
    e = y[None, :] - jnp.einsum("pij,pj->pi", C, xl_gathered)
    P_new, xl_new, logw, bad = _block_call(
        C, e.astype(jnp.float32), xl_gathered.astype(jnp.float32),
        jnp.asarray(R, jnp.float32), P_gathered,
        ny, nl, block, jitter, interpret,
    )
    return (xl_new[:, 0, :], P_new, logw[:, 0, 0],
            bad[:, 0, 0].astype(bool))


def fused_gather_kf_update(ai, C, xl_gathered, P_all, y, R,
                           jitter: float = 1e-3, block: int = 8):
    """Fused resampling-gather + dense KF update.

    ai [N] int32 ancestor indices; C [N, ny, nl] Jacobians at the
    *propagated* particles; xl_gathered [N, nl] already-gathered maps
    (cheap); P_all [N, nl, nl] pre-resampling covariances; y [ny], R.
    Returns (xl', P', logw) matching ops.kalman.kalman_update_dense_batched
    up to fp ordering. Requires ny <= 3.
    """
    n, ny, nl = C.shape
    if ny > 3:
        raise ValueError("fused KF kernel supports ny <= 3")
    if n % block != 0:
        block = 1
    interpret = jax.default_backend() != "tpu"
    e = y[None, :] - jnp.einsum("pij,pj->pi", C, xl_gathered)
    yR = jnp.asarray(R, jnp.float32)
    P_new, xl_new, logw = _fused_call(
        ai.astype(jnp.int32), C, xl_gathered, e, yR, P_all,
        ny, nl, block, jitter, interpret,
    )
    return xl_new, P_new, logw[:, 0]


# ---------------------------------------------------------------------------
# Low-rank factored filter update: P = P_base - Wt^T Wt
#
# The blocked kernels above are bound by the [nl, nl] covariance
# downdate: the MXU streams nl rows per particle to produce dd and the
# pipeline writes nl x nl back to HBM every step (measured: the block
# kernel runs ~2x above the P copy floor, scripts/profile_kernel_scan.py).
# But the KF downdate is additive rank-ny per step
# (src/particleFilter.m:194-198):
#
#     P_t = P_base - sum_tau U_tau S_tau^-1 U_tau^T = P_base - Wt^T Wt,
#     Wt rows at step tau: Y_tau = L_tau^-1 C_tau P_tau   (S = L L^T)
#
# so the filter can carry the FACTOR Wt [rw, nl] (rw = ny * rebase
# period) instead of P, and materialize P ("rebase") only every r steps:
# per step the kernel reads the ancestor's P_base row (read-only between
# rebases -> gathered by composed base indices, never rewritten), reads
# the small factor, and writes ny new factor rows — ~2x less HBM traffic
# and no [nl, nl]-output matmul except at rebases. All small-ny algebra
# here is mask-assembled scalar math on [B, 1, 1] tensors (no sublane
# slicing, no reshapes — see _block_update_math's layout notes).
# ---------------------------------------------------------------------------


def _kernel_gather_cp(ny: int, block: int,
                      bidx_ref, C_ref,
                      P_base_hbm,
                      cp_ref,
                      pbuf, sems):
    """Gather-fused CP contraction: CP[b] = C[b] @ P_base[bidx[b]].

    The ONLY heavy op of the factored update — the per-particle ancestor
    row rides lookahead double-buffered DMAs (P_base is read-only between
    rebases, so nothing is ever written back), and the kernel emits just
    the [ny, nl] contraction. Measured at the P read-bandwidth floor
    (scripts/profile_gather_cp.py: 1.11 ms/step at N=16384, nl=128 —
    equal to XLA's batched matmul WITHOUT any gather, and bit-exact
    against it). All remaining small-ny algebra runs in XLA, where the
    batched [N, ny, *] ops fuse well — the earlier monolithic kernel
    that kept the full update in Mosaic ran 3x slower than this split.
    """
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    def issue(block_idx, slot):
        base = block_idx * block
        for b in range(block):
            pltpu.make_async_copy(
                P_base_hbm.at[bidx_ref[base + b]], pbuf.at[slot, b],
                sems.at[slot, b],
            ).start()

    @pl.when(i == 0)
    def _():
        issue(0, 0)

    slot = jax.lax.rem(i, 2)

    @pl.when(i + 1 < n_blocks)
    def _():
        issue(i + 1, jax.lax.rem(i + 1, 2))

    for b in range(block):
        pltpu.make_async_copy(
            P_base_hbm.at[bidx_ref[i * block + b]], pbuf.at[slot, b],
            sems.at[slot, b],
        ).wait()

    P = pbuf[slot]
    cp_ref[...] = jax.lax.dot_general(
        C_ref[...].astype(P.dtype), P, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


@functools.partial(
    jax.jit, static_argnames=("ny", "nl", "block", "interpret")
)
def _gather_cp_call(bidx, C, P_base, ny, nl, block, interpret):
    n = C.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((block, ny, nl), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # P_base stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((block, ny, nl), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block, nl, nl), P_base.dtype),
            pltpu.SemaphoreType.DMA((2, block)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_gather_cp, ny, block),
        out_shape=[jax.ShapeDtypeStruct((n, ny, nl), jnp.float32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(bidx, C, P_base)[0]


def kf_update_lowrank(bidx, C, xl_gathered, Wt_gathered, P_base, y, R,
                      jitter: float = 1e-3, block: int = 64):
    """Factored dense KF update: covariance P = P_base - Wt^T Wt.

    bidx [N] int32 ancestor-composed base indices into P_base; C
    [N, ny, nl] Jacobians at the propagated particles; xl_gathered
    [N, nl]; Wt_gathered [N, rw, nl] accumulated factor rows (already
    resampled; zero rows are inactive and contribute nothing); P_base
    [N, nl, nl] the last rebased covariances (read-only between rebases).
    Returns (xl', Wnew [N, ny, nl] f32, logw, retried) where
    Wnew = L^-1 C P are the step's whitened factor rows (Wnew^T Wnew is
    exactly the covariance downdate) to place into Wt — engines/rbpf.py
    does the dynamic_update_slice. Hybrid split: the Pallas kernel
    performs only the gather-fused CP contraction (read floor); the
    small-ny algebra (closed-form Cholesky, weights, gain) runs in XLA
    (ops/kalman.py helpers). Algebra identical to kf_update_block_gather
    up to fp ordering; nl must be lane-aligned, ny <= 3.
    """
    from ..ops.kalman import (
        _chol_small_batched,
        _Li_from_chol_small_batched,
        _tri_solve_small_batched,
    )

    n, ny, nl = C.shape
    if ny > 3:
        raise ValueError("lowrank KF kernel supports ny <= 3")
    if nl % 128:
        raise ValueError(f"nl={nl} must be a multiple of 128 (pad upstream)")
    while block > 1 and n % block:
        block //= 2
    bytes_blk = block * nl * nl
    while block > 1 and bytes_blk * 2 * P_base.dtype.itemsize \
            > 10 * 1024 * 1024:
        block //= 2
        bytes_blk //= 2
    interpret = jax.default_backend() != "tpu"
    C = C.astype(jnp.float32)
    CPb = _gather_cp_call(bidx.astype(jnp.int32), C, P_base, ny, nl,
                          block, interpret)
    Wf = Wt_gathered
    CWt = jnp.einsum("pij,prj->pir", C.astype(Wf.dtype), Wf,
                     preferred_element_type=jnp.float32)
    CP = CPb - jnp.einsum("pir,prj->pij", CWt.astype(Wf.dtype), Wf,
                          preferred_element_type=jnp.float32)
    S = jnp.einsum("pij,pkj->pik", CP, C,
                   preferred_element_type=jnp.float32) \
        + jnp.asarray(R, jnp.float32)[None]
    L, bad = _chol_small_batched(S, jitter)
    e = y[None, :].astype(jnp.float32) \
        - jnp.einsum("pij,pj->pi", C, xl_gathered.astype(jnp.float32))
    z = _tri_solve_small_batched(L, e)             # [N, ny]
    logw = (
        -0.5 * jnp.sum(z * z, axis=-1)
        - jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
        - 0.5 * ny * _LOG2PI
    )
    Li = _Li_from_chol_small_batched(L)
    Wnew = jnp.einsum("pij,pjk->pik", Li, CP,
                      preferred_element_type=jnp.float32)
    xl_new = xl_gathered.astype(jnp.float32) \
        + jnp.einsum("pi,pik->pk", z, Wnew,
                     preferred_element_type=jnp.float32)
    return xl_new, Wnew, logw, bad


def _kernel_rebase(block: int,
                   bidx_ref, Wt_ref,
                   P_base_hbm,
                   P_out_ref,
                   pbuf, sems):
    """Materialize P' = P_base[bidx] - Wt^T Wt (the once-per-r-steps
    rebase; the [nl, nl]-output matmul the per-step path avoids)."""
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    def issue(block_idx, slot):
        base = block_idx * block
        for b in range(block):
            pltpu.make_async_copy(
                P_base_hbm.at[bidx_ref[base + b]], pbuf.at[slot, b],
                sems.at[slot, b],
            ).start()

    @pl.when(i == 0)
    def _():
        issue(0, 0)

    slot = jax.lax.rem(i, 2)

    @pl.when(i + 1 < n_blocks)
    def _():
        issue(i + 1, jax.lax.rem(i + 1, 2))

    for b in range(block):
        pltpu.make_async_copy(
            P_base_hbm.at[bidx_ref[i * block + b]], pbuf.at[slot, b],
            sems.at[slot, b],
        ).wait()

    P = pbuf[slot]
    Wt = Wt_ref[...]
    dd = jax.lax.dot_general(
        Wt, Wt, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                              # [B, nl, nl]
    P_out_ref[...] = P - dd.astype(P.dtype)


@functools.partial(
    jax.jit, static_argnames=("nl", "rw", "block", "interpret")
)
def _rebase_call(bidx, Wt, P_base, nl, rw, block, interpret):
    n = Wt.shape[0]
    grid = (n // block,)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, rw, nl), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((block, nl, nl), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block, nl, nl), P_base.dtype),
            pltpu.SemaphoreType.DMA((2, block)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_rebase, block),
        out_shape=[jax.ShapeDtypeStruct((n, nl, nl), P_base.dtype)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(bidx, Wt, P_base)
    return out[0]


def kf_rebase(bidx, Wt, P_base, block: int = 32):
    """P' [N, nl, nl] = P_base[bidx] - Wt^T Wt (storage dtype)."""
    n, rw, nl = Wt.shape
    while block > 1 and n % block:
        block //= 2
    bytes_blk = block * nl * nl
    while block > 1 and bytes_blk * (4 * P_base.dtype.itemsize + 8) \
            > 13 * 1024 * 1024:
        block //= 2
        bytes_blk //= 2
    interpret = jax.default_backend() != "tpu"
    return _rebase_call(bidx.astype(jnp.int32), Wt, P_base, nl, rw,
                        block, interpret)
