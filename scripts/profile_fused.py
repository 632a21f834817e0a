"""Benchmark the 1-pass fused gather+KF kernel vs the XLA path on TPU."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")

from rbslam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from rbslam_tpu.kernels.kf_update import (
    fused_gather_kf_update_1pass,
    fused_gather_kf_update_2pass,
)
from rbslam_tpu.ops.kalman import kalman_update_dense_batched

N = 16384
ny = 3


def timeit(name, fn, *args, reps=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:52s} {dt*1e3:9.3f} ms", flush=True)
    return out


for dtype, nl in [(jnp.bfloat16, 128), (jnp.float32, 128)]:
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    A = 0.1 * jax.random.normal(k1, (N, nl, nl))
    P = (jnp.einsum("pij,pkj->pik", A, A) + 10.0 * jnp.eye(nl)).astype(dtype)
    C = jax.random.normal(k2, (N, ny, nl))
    xl = jax.random.normal(k3, (N, nl))
    y = jax.random.normal(k4, (ny,))
    R = 10.0 * jnp.eye(ny)
    ai = jnp.sort(jax.random.randint(jax.random.fold_in(key, 9), (N,), 0, N))

    tag = f"{np.dtype(dtype.dtype if hasattr(dtype,'dtype') else dtype).name} nl={nl}"
    for blk in (8, 16, 32, 64):
        timeit(f"[{tag}] fused 1-pass block={blk}",
               lambda a, c, x, p: fused_gather_kf_update_1pass(
                   a, c, x, p, y, R, block=blk), ai, C, xl, P)
    timeit(f"[{tag}] fused 2-pass",
           lambda a, c, x, p: fused_gather_kf_update_2pass(a, c, x, p, y, R),
           ai, C, xl, P)

    def xla_path(p, a, c, x):
        pa = jnp.take(p, a, axis=0)
        xa = jnp.take(x, a, axis=0)
        return kalman_update_dense_batched(c, pa, xa, y, R, 1e-3, False)

    timeit(f"[{tag}] XLA gather+KF (w/ symmetrize)", xla_path, P, ai, C, xl)

# correctness spot-check on-device (f32)
out = fused_gather_kf_update_1pass(ai, C, xl, P, y, R)
Pg = jnp.take(P, ai, axis=0)
xg = jnp.take(xl, ai, axis=0)
ref = kalman_update_dense_batched(C, Pg, xg, y, R, 1e-3, False)
print("max |dP|:", float(jnp.max(jnp.abs(out[1] - ref[1]))),
      "max |dlogw|:", float(jnp.max(jnp.abs(out[2] - ref[2]))),
      "max |dxl|:", float(jnp.max(jnp.abs(out[0] - ref[0]))), flush=True)
