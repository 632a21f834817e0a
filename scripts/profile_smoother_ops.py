"""Locate the reference-scale (N=100, nl=515) smoother step bottleneck."""
import time
import jax
import jax.numpy as jnp
import sys
sys.path.insert(0, "/root/repo")
from rbslam_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from rbslam_tpu.math.linalg import psd_cholesky, tril_solve

N, ny, nl = 100, 3, 515
key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
A = 0.05 * jax.random.normal(k1, (N, nl, nl))
Imat = jnp.einsum("pij,pkj->pik", A, A) + 5.0 * jnp.eye(nl)
P = jnp.linalg.inv(Imat[0])[None].repeat(N, 0) * 1.0
ivec = jax.random.normal(k2, (N, nl))
C = jax.random.normal(k3, (N, ny, nl))
Rinv = jnp.eye(ny) / 10.0
y_t = jnp.ones(ny)


def timeit(name, fn, *args, reps=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:42s} {(time.perf_counter()-t0)/reps*1e3:9.3f} ms", flush=True)
    return out


timeit("noop", lambda a: a + 1, ivec)
timeit("batched cholesky [100,515,515]", lambda m: psd_cholesky(m, 1e-2)[0], Imat)
L = jnp.linalg.cholesky(Imat)
timeit("tril_solve vec", lambda l, v: tril_solve(l, v), L, ivec)
timeit("info pair update einsums", lambda c, m: m + jnp.einsum(
    "pki,kl,plj->pij", c, Rinv, c), C, Imat)
timeit("CP einsum [100,3,515]x[100,515,515]", lambda c, p: jnp.einsum(
    "pij,pjk->pik", c, p, preferred_element_type=jnp.float32), C, P)
timeit("quad Pv einsum", lambda p, v: jnp.einsum("pij,pj->pi", p, v), P, ivec)
timeit("gather all [100,515,515]x3", lambda m, p: (
    jnp.take(m, jnp.arange(N)[::-1], axis=0),
    jnp.take(p, jnp.arange(N)[::-1], axis=0)), Imat, P)
