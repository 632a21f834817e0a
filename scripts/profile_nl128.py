"""XLA path components at nl=128 (aligned), bf16 covariance."""
import time
import jax
import jax.numpy as jnp
import numpy as np
import sys
sys.path.insert(0, "/root/repo")
from rbslam_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from rbslam_tpu.ops.kalman import kalman_update_dense_batched

N, ny, nl = 16384, 3, 128
key = jax.random.PRNGKey(0)
k1, k2, k3, k4 = jax.random.split(key, 4)
A = 0.1 * jax.random.normal(k1, (N, nl, nl))
P = (jnp.einsum("pij,pkj->pik", A, A) + 10.0 * jnp.eye(nl)).astype(jnp.bfloat16)
C = jax.random.normal(k2, (N, ny, nl))
xl = jax.random.normal(k3, (N, nl))
y = jax.random.normal(k4, (ny,))
R = 10.0 * jnp.eye(ny)
ai = jnp.sort(jax.random.randint(jax.random.fold_in(key, 9), (N,), 0, N))


def timeit(name, fn, *args, reps=30):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:46s} {dt*1e3:9.3f} ms", flush=True)
    return out


timeit("noop (dispatch overhead)", lambda a: a + 1, ai)
timeit("gather P take", lambda p, a: jnp.take(p, a, axis=0), P, ai)
timeit("KF no-symm", lambda c, p, x: kalman_update_dense_batched(
    c, p, x, y, R, 1e-3, False, False), C, jnp.take(P, ai, axis=0), xl)


def full_nosym(p, a, c, x):
    pa = jnp.take(p, a, axis=0)
    return kalman_update_dense_batched(c, pa, x, y, R, 1e-3, False, False)


def full_sym(p, a, c, x):
    pa = jnp.take(p, a, axis=0)
    return kalman_update_dense_batched(c, pa, x, y, R, 1e-3, False, True)


timeit("gather+KF no-symm (one jit)", full_nosym, P, ai, C, xl)
timeit("gather+KF symm (one jit)", full_sym, P, ai, C, xl)
timeit("P copy rw probe", lambda p: p + jnp.bfloat16(0), P)
