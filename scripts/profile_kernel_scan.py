"""Kernel-only in-scan cost split: time lax.scan loops containing JUST
the blocked KF kernel in three flavors to separate (a) the update math
+ P stream (BlockSpec pipeline, no gather), (b) the per-particle DMA
gather machinery with identity ancestors, (c) realistic sorted
resampling ancestors. Also sweeps block size.
Run: timeout 3000 python scripts/profile_kernel_scan.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from rbslam_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from bench import _build_problem
from rbslam_tpu.kernels.kf_update import kf_update_block_gather, kf_update_block

N, M, T = 16384, 125, 64
data, model_j, potential, k_sd, Q, R = _build_problem(M, N, T, pallas_basis=False)
nl = potential.n_lin
key = jax.random.PRNGKey(0)
xn0 = jnp.broadcast_to(jnp.asarray(data.init_state), (N, 7)) + 0.0
C_const = jax.vmap(model_j.meas_jacobian)(xn0)
xl0 = jnp.zeros((N, nl))
P0 = (jnp.broadcast_to(jnp.diag(k_sd), (N, nl, nl))).astype(jnp.bfloat16)
y_t = jnp.asarray(data.y[1])
ident = jnp.arange(N, dtype=jnp.int32)
# a realistic sorted ancestor vector: systematic resampling of a
# moderately concentrated weight vector
w = jax.nn.softmax(2.0 * jax.random.normal(key, (N,)))
u = (jnp.arange(N, dtype=jnp.float32) + 0.5) / N
ai_real = jnp.clip(jnp.searchsorted(jnp.cumsum(w), u), 0, N - 1).astype(jnp.int32)

def timeit(name, make_run, reps=3):
    f, args = make_run()
    out = f(*args); jax.block_until_ready(out)
    best = np.inf
    for i in range(reps):
        t0 = time.perf_counter()
        out = f(*args); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:52s} {best/T*1e3:8.3f} ms/step", flush=True)

def scan_block(block):
    def mk():
        @jax.jit
        def run(C, xl, P):
            def step(P, _):
                xl_n, P_n, lw, _ = kf_update_block(C, P, xl, y_t, R,
                                                   block=block)
                return P_n, lw[0]
            P_f, out = jax.lax.scan(step, P, None, length=T)
            return out
        return run, (C_const, xl0, P0)
    return mk

def scan_gather(ai, block):
    def mk():
        @jax.jit
        def run(ai, C, xl, P):
            def step(P, _):
                xl_n, P_n, lw, _ = kf_update_block_gather(
                    ai, C, xl, P, y_t, R, block=block)
                return P_n, lw[0]
            P_f, out = jax.lax.scan(step, P, None, length=T)
            return out
        return run, (ai, C_const, xl0, P0)
    return mk

def scan_take_only():
    def mk():
        @jax.jit
        def run(ai, P):
            def step(P, _):
                P_n = jnp.take(P, ai, 0)
                return P_n, P_n[0, 0, 0]
            P_f, out = jax.lax.scan(step, P, None, length=T)
            return out
        return run, (ai_real, P0)
    return mk

def scan_copy_only():
    def mk():
        @jax.jit
        def run(P):
            def step(P, _):
                P_n = P + jnp.bfloat16(1e-8)
                return P_n, P_n[0, 0, 0]
            P_f, out = jax.lax.scan(step, P, None, length=T)
            return out
        return run, (P0,)
    return mk

timeit("copy floor: P += eps (1 read + 1 write)", scan_copy_only())
timeit("XLA take(P, sorted ai) (1 read + 1 write)", scan_take_only())
timeit("block (BlockSpec stream, no gather) b=32", scan_block(32))
timeit("block b=64", scan_block(64))
timeit("block_gather identity ai b=32", scan_gather(ident, 32))
timeit("block_gather identity ai b=64", scan_gather(ident, 64))
timeit("block_gather sorted real ai b=32", scan_gather(ai_real, 32))
timeit("block_gather sorted real ai b=64", scan_gather(ai_real, 64))
timeit("block_gather sorted real ai b=128", scan_gather(ai_real, 128))
