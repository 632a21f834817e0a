"""Where does the lowrank step spend time? Scan-based ablation of the
factored-update path at the bench config.
Run: timeout 3000 python scripts/profile_lowrank.py"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from rbslam_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from bench import _build_problem
from rbslam_tpu.kernels.kf_update import (
    kf_update_lowrank, kf_rebase, kf_update_block_gather)

N, M, T = 16384, 125, 64
data, model_j, potential, k_sd, Q, R = _build_problem(M, N, T)
nl = potential.n_lin
key = jax.random.PRNGKey(0)
xn0 = jnp.broadcast_to(jnp.asarray(data.init_state), (N, 7)) + 0.0
C_const = jax.vmap(model_j.meas_jacobian)(xn0)
xl0 = jnp.zeros((N, nl))
P0 = (jnp.broadcast_to(jnp.diag(k_sd), (N, nl, nl))).astype(jnp.bfloat16)
y_t = jnp.asarray(data.y[1])
rw = 24
Wt0 = jnp.zeros((N, rw, nl), jnp.bfloat16)
ident = jnp.arange(N, dtype=jnp.int32)
w = jax.nn.softmax(2.0 * jax.random.normal(key, (N,)))
u = (jnp.arange(N, dtype=jnp.float32) + 0.5) / N
ai_real = jnp.clip(jnp.searchsorted(jnp.cumsum(w), u), 0, N - 1).astype(jnp.int32)

def timeit(name, f, args, reps=3):
    out = f(*args); jax.block_until_ready(out)
    best = np.inf
    for i in range(reps):
        t0 = time.perf_counter()
        out = f(*args); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:56s} {best/T*1e3:8.3f} ms/step", flush=True)

@jax.jit
def scan_kernel_only(bidx, C, xl, Wt, P_base):
    def step(xl, _):
        xl_n, wnew, lw, _ = kf_update_lowrank(bidx, C, xl, Wt, P_base, y_t, R)
        return xl_n, lw[0]
    return jax.lax.scan(step, xl, None, length=T)[1]

@jax.jit
def scan_kernel_dus(bidx, C, xl, Wt, P_base):
    def step(carry, ph):
        xl, Wt = carry
        xl_n, wnew, lw, _ = kf_update_lowrank(bidx, C, xl, Wt, P_base, y_t, R)
        Wt = jax.lax.dynamic_update_slice(
            Wt, wnew.astype(Wt.dtype), (0, 3 * (ph % 8), 0))
        return (xl_n, Wt), lw[0]
    return jax.lax.scan(step, (xl, Wt), jnp.arange(T, dtype=jnp.int32))[1]

@jax.jit
def scan_kernel_take_dus(bidx, C, xl, Wt, P_base):
    def step(carry, ph):
        xl, Wt = carry
        Wt_g = jnp.take(Wt, ai_real, 0)
        xl_n, wnew, lw, _ = kf_update_lowrank(bidx, C, xl, Wt_g, P_base, y_t, R)
        Wt = jax.lax.dynamic_update_slice(
            Wt_g, wnew.astype(Wt.dtype), (0, 3 * (ph % 8), 0))
        return (xl_n, Wt), lw[0]
    return jax.lax.scan(step, (xl, Wt), jnp.arange(T, dtype=jnp.int32))[1]

@jax.jit
def scan_rebase(bidx, Wt, P_base):
    def step(P_base, _):
        return kf_rebase(bidx, Wt, P_base), P_base[0, 0, 0]
    return jax.lax.scan(step, P_base, None, length=T)[1]

@jax.jit
def scan_bg(ai, C, xl, P):
    def step(P, _):
        xl_n, P_n, lw, _ = kf_update_block_gather(ai, C, xl, P, y_t, R)
        return P_n, lw[0]
    return jax.lax.scan(step, P, None, length=T)[1]

timeit("block_gather kernel (reference)", scan_bg, (ai_real, C_const, xl0, P0))
timeit("lowrank kernel only (ident bidx, fixed Wt)",
       scan_kernel_only, (ident, C_const, xl0, Wt0, P0))
timeit("lowrank kernel only (real bidx)",
       scan_kernel_only, (ai_real, C_const, xl0, Wt0, P0))
timeit("lowrank kernel + DUS", scan_kernel_dus,
       (ai_real, C_const, xl0, Wt0, P0))
timeit("lowrank kernel + take + DUS", scan_kernel_take_dus,
       (ai_real, C_const, xl0, Wt0, P0))
timeit("rebase kernel every step", scan_rebase, (ai_real, Wt0, P0))
