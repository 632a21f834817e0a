"""Measure the gather-fused blocked KF kernel vs the take+block path.

At the bench config (N=16384, nl=128) the XLA path's resampling gather
of P costs ~1.5x a P copy on top of the update's read+write; the fused
kernel should land near gathered-read + write. Sweep block sizes.

Run: timeout 3000 python scripts/profile_block_gather.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from rbslam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from rbslam_tpu.kernels.kf_update import (
    _block_call, _block_gather_call, kf_update_block, kf_update_block_gather,
)
from rbslam_tpu.ops.kalman import kalman_update_dense_batched

N, NY, NL = 16384, 3, 128
key = jax.random.PRNGKey(0)
print("backend:", jax.default_backend(), flush=True)


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1e3:9.3f} ms", flush=True)
    return out


for dtype in [jnp.bfloat16, jnp.float32]:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    A = 0.1 * jax.random.normal(k1, (N, NL, NL))
    # symmetric SPD covariances (the kernels' small-ny algebra, like the
    # reference's chol, assumes S = C P C' + R symmetric)
    P = (jnp.einsum("pij,pkj->pik", A, A) + jnp.eye(NL)).astype(dtype)
    C = jax.random.normal(k2, (N, NY, NL)) * 0.3
    xl = jax.random.normal(k3, (N, NL))
    y = jax.random.normal(k4, (NY,))
    R = 0.5 * jnp.eye(NY)
    # sorted ancestors (systematic-resampling order)
    ai = jnp.sort(jax.random.randint(jax.random.PRNGKey(5), (N,), 0, N))
    name = np.dtype(dtype).name

    take_blk = jax.jit(
        lambda p, a, c, x, yy: kf_update_block(
            c, jnp.take(p, a, axis=0), jnp.take(x, a, axis=0), yy, R)
    )
    timeit(f"[{name}] take + kf_update_block", take_blk, P, ai, C, xl, y)

    take_xla = jax.jit(
        lambda p, a, c, x, yy: kalman_update_dense_batched(
            c, jnp.take(p, a, axis=0), jnp.take(x, a, axis=0), yy, R,
            1e-3, False, False)
    )
    timeit(f"[{name}] take + XLA closed form", take_xla, P, ai, C, xl, y)

    for blk in (16, 32, 64):
        fused = jax.jit(
            lambda p, a, c, x, yy, b=blk: kf_update_block_gather(
                a, c, jnp.take(x, a, axis=0), p, yy, R, block=b)
        )
        out = timeit(f"[{name}] block_gather (block={blk})",
                     fused, P, ai, C, xl, y)

    # correctness spot-check vs XLA at this dtype
    ref = take_xla(P, ai, C, xl, y)
    got = fused(P, ai, C, xl, y)
    err_xl = float(jnp.max(jnp.abs(ref[0] - got[0])))
    err_P = float(jnp.max(jnp.abs(
        ref[1].astype(jnp.float32) - got[1].astype(jnp.float32))))
    err_w = float(jnp.max(jnp.abs(ref[2] - got[2])))
    print(f"[{name}] max err xl={err_xl:.2e} P={err_P:.2e} logw={err_w:.2e}",
          flush=True)
