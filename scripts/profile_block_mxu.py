"""Micro-benchmark: in-kernel formulations of the blocked KF products.

The blocked KF kernel's cost is CP = C_b @ P_b and the rank-ny downdate
P_b -= CP_b' K_b, batched over a particle block. Three candidate
formulations, measured on the real chip at the bench config:

  vpu       broadcast-multiply + sublane reduction (round-1 version)
  batched   3D jax.lax.dot_general with a batch dimension
  blockdiag flatten the block into ONE [B*ny, B*nl] x [B*nl, nl] MXU dot
            (wastes a factor B of MXU flops on zero blocks but issues a
            single large systolic pass)

Run: timeout 2400 python scripts/profile_block_mxu.py
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rbslam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N, NY, NL = 16384, 3, 128


def _products_vpu(C, P):
    CP = [jnp.sum(P * C[:, m, :, None], axis=1) for m in range(NY)]
    K = [0.7 * cp for cp in CP]  # stand-in for the gain algebra
    dd = CP[0][:, :, None] * K[0][:, None, :]
    for m in range(1, NY):
        dd = dd + CP[m][:, :, None] * K[m][:, None, :]
    return dd


def _products_batched(C, P):
    CP = jax.lax.dot_general(
        C, P, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                              # [B, ny, nl]
    K = 0.7 * CP
    dd = jax.lax.dot_general(
        CP, K, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                              # [B, nl, nl]
    return dd


def _products_blockdiag(C, P):
    B = C.shape[0]
    mask = (
        jax.lax.broadcasted_iota(jnp.float32, (B, 1, B, 1), 0)
        == jax.lax.broadcasted_iota(jnp.float32, (B, 1, B, 1), 2)
    ).astype(jnp.float32)
    Cd = (C[:, :, None, :] * mask).reshape(B * NY, B * NL)
    CP = jnp.dot(Cd, P.reshape(B * NL, NL),
                 preferred_element_type=jnp.float32)   # [B*ny, nl]
    K = 0.7 * CP
    CPr = CP.reshape(B, NY, NL)
    CPT = jnp.transpose(CPr, (0, 2, 1))                # [B, nl, ny]
    mask2 = (
        jax.lax.broadcasted_iota(jnp.float32, (B, 1, B, 1), 0)
        == jax.lax.broadcasted_iota(jnp.float32, (B, 1, B, 1), 2)
    ).astype(jnp.float32)
    CPTd = (CPT[:, :, None, :] * mask2).reshape(B * NL, B * NY)
    dd = jnp.dot(CPTd, K, preferred_element_type=jnp.float32)
    return dd.reshape(B, NL, NL)


def _kernel(products, C_ref, P_ref, out_ref):
    P = P_ref[...].astype(jnp.float32)
    C = C_ref[...].astype(jnp.float32)
    dd = products(C, P)
    out_ref[...] = (P - dd).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "products"))
def run(C, P, block, products):
    grid = (N // block,)
    return pl.pallas_call(
        functools.partial(_kernel, products),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, NY, NL), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, NL, NL), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, NL, NL), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, NL, NL), P.dtype),
    )(C, P)


def main():
    key = jax.random.PRNGKey(0)
    C = jax.random.normal(key, (N, NY, NL), jnp.float32)
    P = jax.random.normal(key, (N, NL, NL), jnp.bfloat16)
    ref = None
    for name, fn in [("vpu", _products_vpu), ("batched", _products_batched),
                     ("blockdiag", _products_blockdiag)]:
        for block in (8, 16, 32):
            try:
                out = run(C, P, block, fn)
                jax.block_until_ready(out)
            except Exception as e:  # noqa: BLE001
                print(f"{name:10s} B={block:3d}  FAILED: "
                      f"{str(e).splitlines()[0][:90]}", flush=True)
                continue
            if ref is None:
                ref = out
            err = float(jnp.max(jnp.abs(
                (out.astype(jnp.float32) - ref.astype(jnp.float32)))))
            t0 = time.perf_counter()
            for _ in range(20):
                out = run(C, P, block, fn)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 20
            print(f"{name:10s} B={block:3d}  {dt*1e3:8.3f} ms   "
                  f"maxerr={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
