"""Break down the RBPF step cost at the bench config on the real chip.

Times each sub-op of the hot step in isolation (own jit, block_until_ready)
to locate the bottleneck the fused work should target. All device arrays
are passed as jit ARGUMENTS (closed-over arrays become HLO constants and
overflow the axon remote-compile request).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")

from rbslam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from bench import _build_problem

N = 16384
M = 125
COV = jnp.bfloat16

data, model, potential, k, Q, R = _build_problem(M, N, 192)
nl = potential.n_lin
print("backend:", jax.default_backend(), "nl:", nl, flush=True)

key = jax.random.PRNGKey(0)
xn = jnp.broadcast_to(jnp.asarray(data.init_state), (N, data.init_state.shape[-1]))
xn = xn + 0.01 * jax.random.normal(key, xn.shape)
xl = jnp.zeros((N, nl))
P = (jnp.broadcast_to(jnp.diag(k), (N, nl, nl))
     + 1e-3 * jax.random.normal(key, (N, nl, nl))).astype(COV)
logw = jnp.zeros(N) - np.log(N)
y_t = data.y[1]
u = data.dx[0]
Q_t = jnp.asarray(Q)
dt_t = jnp.asarray(0.01)

from rbslam_tpu.ops.resampling import resample_indices
from rbslam_tpu.ops.kalman import kalman_update_dense_batched


def timeit(name, fn, *args, reps=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:32s} {dt*1e3:9.3f} ms", flush=True)
    return out


ai = timeit("resample_indices",
            lambda kk, lw: resample_indices(kk, jnp.exp(lw), N, "systematic"),
            key, logw)

gathered = timeit("gather xn/xl (take)",
                  lambda x, l, a: (jnp.take(x, a, axis=0), jnp.take(l, a, axis=0)),
                  xn, xl, ai)

P_anc = timeit("gather P (take)", lambda p, a: jnp.take(p, a, axis=0), P, ai)

dyn_keys = jax.random.split(key, N)
xn_new = timeit("dynamics (vmap)",
                lambda ks, x, uu, qq, dd: jax.vmap(
                    lambda kk, xx: model.dynamics(kk, xx, uu, dd, qq))(ks, x),
                dyn_keys, gathered[0], u, Q_t, dt_t)

C = timeit("meas jacobian (basis eval)",
           lambda x: jax.vmap(model.meas_jacobian)(x), xn_new)

upd = timeit("KF update (closed form)",
             lambda c, p, x, yy: kalman_update_dense_batched(c, p, x, yy, R, 1e-3, False, False),
             C, P_anc, gathered[1], y_t)

def full(p, a, c, x, yy):
    pa = jnp.take(p, a, axis=0)
    return kalman_update_dense_batched(c, pa, x, yy, R, 1e-3, False, False)

timeit("gather P + KF update", full, P, ai, C, gathered[1], y_t)

timeit("P copy (read+write)", lambda p: p + jnp.bfloat16(0), P)
timeit("P sum (read only)", lambda p: jnp.sum(p, dtype=jnp.float32), P)
print("P bytes:", P.nbytes / 1e6, "MB", flush=True)
