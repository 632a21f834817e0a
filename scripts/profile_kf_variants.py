"""Micro-benchmarks for KF-update and gather variants on the real chip."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")

from rbslam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N = 16384
nl = 131
ny = 3
COV = jnp.bfloat16

key = jax.random.PRNGKey(0)
k1, k2, k3, k4 = jax.random.split(key, 4)
P = (0.1 * jax.random.normal(k1, (N, nl, nl))).astype(COV)
P = jnp.einsum("pij,pkj->pik", P.astype(jnp.float32), P.astype(jnp.float32))
P = (P + 10.0 * jnp.eye(nl)).astype(COV)
C = jax.random.normal(k2, (N, ny, nl))
xl = jax.random.normal(k3, (N, nl))
y = jax.random.normal(k4, (ny,))
R = 10.0 * jnp.eye(ny)
ai = jnp.sort(jax.random.randint(jax.random.fold_in(key, 9), (N,), 0, N))

from rbslam_tpu.ops.kalman import (
    _chol_small_batched,
    _inv_from_chol_small_batched,
    _tri_solve_small_batched,
    _LOG2PI,
)


def timeit(name, fn, *args, reps=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1e3:9.3f} ms", flush=True)
    return out


def kf_core(C, P, xl, y, symmetrize_out, via_M):
    e = y[None, :] - jnp.einsum("pij,pj->pi", C, xl)
    CP = jnp.einsum("pij,pjk->pik", C, P, preferred_element_type=jnp.float32)
    S = jnp.einsum("pik,pjk->pij", CP, C, preferred_element_type=jnp.float32) + R
    L, retried = _chol_small_batched(S, 1e-3)
    v = _tri_solve_small_batched(L, e)
    logw = (
        -jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
        - 0.5 * jnp.sum(v * v, axis=-1)
        - 0.5 * ny * _LOG2PI
    )
    Sinv = _inv_from_chol_small_batched(L)
    K = jnp.einsum("pji,pjk->pik", CP, Sinv)
    xl_new = xl + jnp.einsum("pij,pj->pi", K, e)
    if via_M:
        M = jnp.einsum("pij,pjk->pik", Sinv, CP)           # [N, ny, nl] f32
        down = jnp.einsum(
            "pji,pjk->pik", CP, M, preferred_element_type=jnp.float32
        )
    else:
        down = jnp.einsum(
            "pji,pjk->pik", CP, jnp.einsum("pij,pjk->pik", Sinv, CP),
            preferred_element_type=jnp.float32,
        )
    P_new = P - down.astype(P.dtype)
    if symmetrize_out:
        P_new = 0.5 * (P_new + jnp.swapaxes(P_new, -1, -2))
    return xl_new, P_new.astype(P.dtype), logw


timeit("KF current (symmetrize)", lambda c, p, x: kf_core(c, p, x, y, True, False), C, P, xl)
timeit("KF no-symmetrize", lambda c, p, x: kf_core(c, p, x, y, False, False), C, P, xl)

# lower-level: which einsum orientation is faster for CP?
timeit("CP einsum pij,pjk", lambda c, p: jnp.einsum(
    "pij,pjk->pik", c, p, preferred_element_type=jnp.float32), C, P)
timeit("PCt einsum pjk,pij->pki?", lambda c, p: jnp.einsum(
    "pkj,pij->pki", p, c, preferred_element_type=jnp.float32), C, P)

# downdate via outer product in one einsum (ternary)
def kf_ternary(c, p, x):
    e = y[None, :] - jnp.einsum("pij,pj->pi", c, x)
    CP = jnp.einsum("pij,pjk->pik", c, p, preferred_element_type=jnp.float32)
    S = jnp.einsum("pik,pjk->pij", CP, c, preferred_element_type=jnp.float32) + R
    L, _ = _chol_small_batched(S, 1e-3)
    Sinv = _inv_from_chol_small_batched(L)
    down = jnp.einsum("pji,pjl,plk->pik", CP, Sinv, CP,
                      preferred_element_type=jnp.float32)
    return p - down.astype(p.dtype)

timeit("KF downdate ternary einsum", kf_ternary, C, P, xl)

# gathers
timeit("gather P take (sorted idx)", lambda p, a: jnp.take(p, a, axis=0), P, ai)
timeit("gather P flat [N, nl*nl]", lambda p, a: jnp.take(
    p.reshape(N, nl * nl), a, axis=0).reshape(N, nl, nl), P, ai)
P_flat = P.reshape(N, nl * nl)
timeit("gather P pre-flattened", lambda p, a: jnp.take(p, a, axis=0), P_flat, ai)
timeit("gather P dynamic_slice-free take_along", lambda p, a: jnp.take_along_axis(
    p, a[:, None], axis=0), P_flat, ai)
