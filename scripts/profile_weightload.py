"""Test the MXU weight-load hypothesis: time a scan of JUST the batched
[N,3,128]@[N,128,128] contraction (both operand dtypes, XLA), plus
lowrank/block_gather kernels at block 16/32/64.
Run: timeout 3000 python scripts/profile_weightload.py"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from rbslam_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from bench import _build_problem
from rbslam_tpu.kernels.kf_update import kf_update_lowrank, kf_update_block_gather

N, M, T = 16384, 125, 64
data, model_j, potential, k_sd, Q, R = _build_problem(M, N, T)
nl = potential.n_lin
key = jax.random.PRNGKey(0)
xn0 = jnp.broadcast_to(jnp.asarray(data.init_state), (N, 7)) + 0.0
C_const = jax.vmap(model_j.meas_jacobian)(xn0)
xl0 = jnp.zeros((N, nl))
P0 = (jnp.broadcast_to(jnp.diag(k_sd), (N, nl, nl))).astype(jnp.bfloat16)
y_t = jnp.asarray(data.y[1])
Wt0 = jnp.zeros((N, 24, nl), jnp.bfloat16)
ident = jnp.arange(N, dtype=jnp.int32)

def timeit(name, f, args, reps=3):
    out = f(*args); jax.block_until_ready(out)
    best = np.inf
    for i in range(reps):
        t0 = time.perf_counter()
        out = f(*args); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:56s} {best/T*1e3:8.3f} ms/step", flush=True)

def mk_cp(cdtype):
    @jax.jit
    def run(C, P):
        C = C.astype(cdtype)
        def step(c, _):
            cp = jax.lax.dot_general(c, P, (((2,), (1,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
            # fold CP back to C's shape so the scan carries it
            return cp.astype(c.dtype) * 1e-6 + c * 0.999, cp[0, 0, 0]
        return jax.lax.scan(step, C, None, length=T)[1]
    return run

timeit("XLA batched CP (C bf16, P bf16)", mk_cp(jnp.bfloat16), (C_const, P0))
timeit("XLA batched CP (C f32, P bf16)", mk_cp(jnp.float32), (C_const, P0))

def mk_lr(block):
    @jax.jit
    def run(bidx, C, xl, Wt, P_base):
        def step(xl, _):
            xl_n, wnew, lw, _ = kf_update_lowrank(
                bidx, C, xl, Wt, P_base, y_t, R, block=block)
            return xl_n, lw[0]
        return jax.lax.scan(step, xl, None, length=T)[1]
    return run

for b in (16, 64):
    timeit(f"lowrank kernel only b={b}", mk_lr(b),
           (ident, C_const, xl0, Wt0, P0))
