"""Pallas TPU kernels: fused Laplacian-eigenbasis evaluation.

The dense measurement path evaluates sin/cos products of the eigenbasis
at every particle position every step (O(N_P * m * d) transcendentals —
the VPU-bound hot op identified in SURVEY §3.1). These kernels tile the
(points x basis) plane, keep the phase/trig intermediates entirely in
VMEM, and emit the gradient components for all d dimensions from ONE set
of sin/cos evaluations — the jnp path (basis/laplace.py) re-evaluates
the trig per output component, so the fused kernel does ~d x fewer
transcendentals for the gradient blocks.

Math (tools/domain_cartesian_dx.m:88-93,146-170):
    phi_n(x)        = prod_j L_j^{-1/2} sin(a_nj),
    d phi_n / d x_i = f_ni cos(a_ni) prod_{j != i} sin(a_nj) * scale,
    a_nj = freq_nj * x_j + phase_nj,
    freq_nj = pi n_j / (2 L_j), phase_nj = pi n_j / 2,
    f_ni = pi n_i / (2 L_i),  scale = prod_j L_j^{-1/2}.

Layouts: positions are passed transposed [d, N] so the point axis is the
128-lane dimension; per-basis constants pack as rows [freq; phase; fac]
of a [3d, m] matrix. Inputs are padded to tile multiples here;
`interpret=True` is selected automatically off-TPU so tests run on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TN = 256   # points per tile
_TM = 128   # basis functions per tile


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_axis(x, n, axis):
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _phi_kernel(d: int, xT_ref, nn_ref, scale_ref, out_ref):
    """One (TN, TM) tile of phi."""
    acc = jnp.full((_TN, _TM), scale_ref[0, 0], dtype=jnp.float32)
    for j in range(d):
        a = (
            xT_ref[j, :][:, None] * nn_ref[j, :][None, :]
            + nn_ref[d + j, :][None, :]
        )
        acc = acc * jnp.sin(a)
    out_ref[:, :] = acc


def _grad_kernel(d: int, xT_ref, nn_ref, scale_ref, out_ref):
    """One (d, TN, TM) tile of grad phi; trig shared across output dims."""
    sins = []
    coss = []
    for j in range(d):
        a = (
            xT_ref[j, :][:, None] * nn_ref[j, :][None, :]
            + nn_ref[d + j, :][None, :]
        )
        sins.append(jnp.sin(a))
        coss.append(jnp.cos(a))
    scale = scale_ref[0, 0]
    for i in range(d):
        prod = nn_ref[2 * d + i, :][None, :] * coss[i]
        for j in range(d):
            if j != i:
                prod = prod * sins[j]
        out_ref[i, :, :] = scale * prod


def _jac3d_kernel(xT_ref, nn_ref, scale_ref, out_ref):
    """One (3, TN, TM) tile of the FULL mag3d measurement Jacobian
    C = R(q)^T [I3 | grad_phi] (run_dense3D_magfield.m:265-279): the trig
    products, the prepended linear-kernel identity block, and the
    body-frame rotation all fused — one write of C, no intermediate
    [N, 3, m] HBM tensors, no transposes, no sublane-padded buffers.

    xT_ref [8, TN]: rows 0-2 centered position, rows 3-6 unit quaternion.
    nn_ref [12, TM]: rows 0-2 freq, 3-5 phase, 6-8 fac, 9-11 onehot (the
    identity columns; zero for trig columns — see _pack_jac_constants).
    out layout [3, N, nl]: k-th row block is output component k for all
    points — leading-axis writes only (the Mosaic-safe pattern; sublane
    slicing miscompiles on this toolchain, NEGATIVE_RESULTS.md).
    """
    sins = []
    coss = []
    for j in range(3):
        a = (
            xT_ref[j, :][:, None] * nn_ref[j, :][None, :]
            + nn_ref[3 + j, :][None, :]
        )
        sins.append(jnp.sin(a))
        coss.append(jnp.cos(a))
    scale = scale_ref[0, 0]
    g = []
    for i in range(3):
        prod = nn_ref[6 + i, :][None, :] * coss[i]
        for j in range(3):
            if j != i:
                prod = prod * sins[j]
        # onehot added unscaled: identity block of the linear kernel
        g.append(scale * prod + nn_ref[9 + i, :][None, :])
    q0 = xT_ref[3, :][:, None]
    q1 = xT_ref[4, :][:, None]
    q2 = xT_ref[5, :][:, None]
    q3 = xT_ref[6, :][:, None]
    # R rows (math/quaternions.py::quat_to_rmat); C_k = sum_i R[i,k] g_i
    R = (
        (q0 * q0 + q1 * q1 - q2 * q2 - q3 * q3,
         2.0 * (q1 * q2 - q0 * q3),
         2.0 * (q1 * q3 + q0 * q2)),
        (2.0 * (q1 * q2 + q0 * q3),
         q0 * q0 - q1 * q1 + q2 * q2 - q3 * q3,
         2.0 * (q2 * q3 - q0 * q1)),
        (2.0 * (q1 * q3 - q0 * q2),
         2.0 * (q2 * q3 + q0 * q1),
         q0 * q0 - q1 * q1 - q2 * q2 + q3 * q3),
    )
    for k in range(3):
        out_ref[k, :, :] = (
            R[0][k] * g[0] + R[1][k] * g[1] + R[2][k] * g[2]
        )


def _jac3d_rows_kernel(out_dtype, xT_ref, nn_ref, scale_ref, out_ref):
    """One (TN, 3, TM) tile of the mag3d Jacobian in ROWS layout
    C [N, 3, nl] — the exact layout the lowrank KF kernel's Mosaic
    batch-dim rules require, emitted directly in the covariance storage
    dtype (skips the XLA transpose + cast passes of the [3, N, nl]
    variant, ~0.2 ms/step at bench scale). The [TN, 3, TM] tile is
    assembled slice-free: each output component k contributes through a
    full-tensor iota mask times a sublane-broadcast of its [TN, TM]
    row — no sublane-axis writes (NEGATIVE_RESULTS.md layout rules).
    """
    sins = []
    coss = []
    for j in range(3):
        a = (
            xT_ref[j, :][:, None] * nn_ref[j, :][None, :]
            + nn_ref[3 + j, :][None, :]
        )
        sins.append(jnp.sin(a))
        coss.append(jnp.cos(a))
    scale = scale_ref[0, 0]
    g = []
    for i in range(3):
        prod = nn_ref[6 + i, :][None, :] * coss[i]
        for j in range(3):
            if j != i:
                prod = prod * sins[j]
        g.append(scale * prod + nn_ref[9 + i, :][None, :])
    q0 = xT_ref[3, :][:, None]
    q1 = xT_ref[4, :][:, None]
    q2 = xT_ref[5, :][:, None]
    q3 = xT_ref[6, :][:, None]
    R = (
        (q0 * q0 + q1 * q1 - q2 * q2 - q3 * q3,
         2.0 * (q1 * q2 - q0 * q3),
         2.0 * (q1 * q3 + q0 * q2)),
        (2.0 * (q1 * q2 + q0 * q3),
         q0 * q0 - q1 * q1 + q2 * q2 - q3 * q3,
         2.0 * (q2 * q3 - q0 * q1)),
        (2.0 * (q1 * q3 - q0 * q2),
         2.0 * (q2 * q3 + q0 * q1),
         q0 * q0 - q1 * q1 - q2 * q2 + q3 * q3),
    )
    acc = jnp.zeros((xT_ref.shape[1], 3, nn_ref.shape[1]), jnp.float32)
    row_id = jax.lax.broadcasted_iota(
        jnp.int32, (xT_ref.shape[1], 3, nn_ref.shape[1]), 1
    )
    for k in range(3):
        Ck = R[0][k] * g[0] + R[1][k] * g[1] + R[2][k] * g[2]
        acc = acc + jnp.where(row_id == k, Ck[:, None, :], 0.0)
    out_ref[...] = acc.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def _jac3d_rows_call(xT_pad, nn_pack, scale, out_dtype):
    n_pad = xT_pad.shape[1]
    m_pad = nn_pack.shape[1]
    grid = (n_pad // _TN, m_pad // _TM)
    return pl.pallas_call(
        functools.partial(_jac3d_rows_kernel, out_dtype),
        out_shape=jax.ShapeDtypeStruct((n_pad, 3, m_pad), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, _TN), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, _TM), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TN, 3, _TM), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(xT_pad, nn_pack, scale)


@jax.jit
def _jac3d_call(xT_pad, nn_pack, scale):
    n_pad = xT_pad.shape[1]
    m_pad = nn_pack.shape[1]
    grid = (n_pad // _TN, m_pad // _TM)
    return pl.pallas_call(
        _jac3d_kernel,
        out_shape=jax.ShapeDtypeStruct((3, n_pad, m_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, _TN), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, _TM), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((3, _TN, _TM), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(xT_pad, nn_pack, scale)


def _pack_jac_constants(NN, L, nl_pad):
    """[12, nl_pad]: columns 0-2 the linear/identity block (freq=phase=
    fac=0, onehot=I3), columns 3..3+m-1 the eigenbasis gradient constants,
    columns beyond 3+m zero everywhere (padding evaluates to 0)."""
    base = _pack_constants(NN, L)            # [9, m]
    m = base.shape[1]
    out = np.zeros((12, nl_pad), np.float32)
    out[:9, 3:3 + m] = base
    out[9:12, :3] = np.eye(3, dtype=np.float32)
    return out


def _pack_constants(NN, L):
    """Rows: freq [d, m], phase [d, m], fac [d, m] -> [3d, m] float32."""
    NN = np.asarray(NN, np.float64)
    L = np.asarray(L, np.float64).reshape(-1)
    freq = (np.pi * NN / (2.0 * L)).T
    phase = (np.pi * NN / 2.0).T
    fac = (np.pi * NN / (2.0 * L)).T
    return np.concatenate([freq, phase, fac], axis=0).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("d",))
def _phi_call(xT_pad, nn_pack, scale, d: int):
    n_pad = xT_pad.shape[1]
    m_pad = nn_pack.shape[1]
    grid = (n_pad // _TN, m_pad // _TM)
    return pl.pallas_call(
        functools.partial(_phi_kernel, d),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, _TN), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d, _TM), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TN, _TM), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(xT_pad, nn_pack, scale)


@functools.partial(jax.jit, static_argnames=("d",))
def _grad_call(xT_pad, nn_pack, scale, d: int):
    n_pad = xT_pad.shape[1]
    m_pad = nn_pack.shape[1]
    grid = (n_pad // _TN, m_pad // _TM)
    return pl.pallas_call(
        functools.partial(_grad_kernel, d),
        out_shape=jax.ShapeDtypeStruct((d, n_pad, m_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, _TN), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d, _TM), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((d, _TN, _TM), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(xT_pad, nn_pack, scale)


class _BasisKernels:
    """Per-basis cached packed constants.

    Stored as NUMPY arrays, never device/traced arrays: the cache is
    shared across jit traces, and a jnp array materialized inside one
    trace leaks its tracer into the next (UnexpectedTracerError when two
    different jitted programs use the same basis). jnp.asarray at use
    time makes a fresh constant per trace.
    """

    def __init__(self, basis):
        self.d = basis.d
        self.m = basis.m
        m_pad = -(-self.m // _TM) * _TM
        pack = np.asarray(_pack_constants(basis.NN, basis.L), np.float32)
        widths = [(0, 0)] * pack.ndim
        widths[1] = (0, m_pad - pack.shape[1])
        self.nn_pack = np.pad(pack, widths)
        L = np.asarray(basis.L, np.float64)
        self.scale = np.asarray(
            [[float(np.prod(1.0 / np.sqrt(L)))]], np.float32
        )


_CACHE: dict = {}


def _kernels_for(basis) -> _BasisKernels:
    # content-derived key (id() can be reused after garbage collection)
    key = (
        basis.m, basis.d,
        np.asarray(basis.L).tobytes(),
        np.asarray(basis.NN).tobytes(),
    )
    if key not in _CACHE:
        _CACHE[key] = _BasisKernels(basis)
    return _CACHE[key]


def _prep_x(basis, x):
    """Shift by +L (fold into phase? phase already includes pi n/2 which
    equals freq * L) and transpose/pad to [d, N_pad].

    a = pi n (x + L) / (2L) = freq * x + pi n / 2 — the +L shift is
    exactly the packed phase, so x is used as-is.
    """
    n = x.shape[0]
    n_pad = -(-n // _TN) * _TN
    xT = jnp.asarray(x, jnp.float32).T
    return _pad_axis(xT, n_pad, 1), n


def phi_basis_pallas(basis, x):
    """phi(x): [N, d] -> [N, m] via the fused Pallas kernel."""
    bk = _kernels_for(basis)
    xT_pad, n = _prep_x(basis, x)
    out = _phi_call(xT_pad, jnp.asarray(bk.nn_pack),
                    jnp.asarray(bk.scale), bk.d)
    return out[:n, : bk.m]


def grad_basis_pallas(basis, x):
    """grad phi(x): [N, d] -> [N, d, m] via the fused Pallas kernel."""
    bk = _kernels_for(basis)
    xT_pad, n = _prep_x(basis, x)
    out = _grad_call(xT_pad, jnp.asarray(bk.nn_pack),
                      jnp.asarray(bk.scale), bk.d)
    return jnp.transpose(out[:, :n, : bk.m], (1, 0, 2))


_JAC_CACHE: dict = {}


def _jac_constants_for(basis, nl_pad):
    key = (
        basis.m, nl_pad,
        np.asarray(basis.L).tobytes(),
        np.asarray(basis.NN).tobytes(),
    )
    if key not in _JAC_CACHE:
        _JAC_CACHE[key] = _pack_jac_constants(basis.NN, basis.L, nl_pad)
    return _JAC_CACHE[key]


def mag3d_jacobian_pallas(basis, pos, quat, nl_pad):
    """Fused mag3d measurement Jacobian, transposed layout.

    pos [N, 3] (already centered), quat [N, 4] unit quaternions ->
    Ct [3, N, nl_pad] f32 with Ct[k, p, :] = (R(q_p)^T [I3|grad_phi])_k.
    Requires basis.d == 3 and nl_pad a multiple of the 128-lane tile;
    columns beyond 3 + basis.m are zero. The [3, N, nl] layout tiles
    perfectly (no sublane padding of a size-3 axis) and is what the
    lowrank KF kernel consumes directly (kernels/kf_update.py).
    """
    if basis.d != 3:
        raise ValueError("mag3d_jacobian_pallas requires a 3-D basis")
    if nl_pad % _TM:
        raise ValueError(f"nl_pad={nl_pad} must be a multiple of {_TM}")
    if nl_pad < 3 + basis.m:
        raise ValueError(f"nl_pad={nl_pad} < 3 + m = {3 + basis.m}")
    n = pos.shape[0]
    n_pad = -(-n // _TN) * _TN
    xT = jnp.concatenate(
        [jnp.asarray(pos, jnp.float32).T, jnp.asarray(quat, jnp.float32).T],
        axis=0,
    )                                                  # [7, N]
    xT = _pad_axis(_pad_axis(xT, 8, 0), n_pad, 1)
    nn = _jac_constants_for(basis, nl_pad)
    bk = _kernels_for(basis)
    out = _jac3d_call(xT, jnp.asarray(nn), jnp.asarray(bk.scale))
    return out[:, :n, :]


def mag3d_jacobian_rows_pallas(basis, pos, quat, nl_pad, dtype=jnp.float32):
    """As :func:`mag3d_jacobian_pallas` but in ROWS layout C [N, 3, nl]
    (the lowrank KF kernel's required input layout) emitted directly in
    ``dtype`` — no XLA transpose/cast pass between the Jacobian kernel
    and the KF kernel. Reference semantics identical
    (run_dense3D_magfield.m:265-279)."""
    if basis.d != 3:
        raise ValueError("mag3d_jacobian_rows_pallas requires a 3-D basis")
    if nl_pad % _TM:
        raise ValueError(f"nl_pad={nl_pad} must be a multiple of {_TM}")
    if nl_pad < 3 + basis.m:
        raise ValueError(f"nl_pad={nl_pad} < 3 + m = {3 + basis.m}")
    n = pos.shape[0]
    n_pad = -(-n // _TN) * _TN
    xT = jnp.concatenate(
        [jnp.asarray(pos, jnp.float32).T, jnp.asarray(quat, jnp.float32).T],
        axis=0,
    )
    xT = _pad_axis(_pad_axis(xT, 8, 0), n_pad, 1)
    nn = _jac_constants_for(basis, nl_pad)
    bk = _kernels_for(basis)
    out = _jac3d_rows_call(xT, jnp.asarray(nn), jnp.asarray(bk.scale),
                           jnp.dtype(dtype))
    return out[:n]
