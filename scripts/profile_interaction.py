"""Dissect the basis-chain x KF-kernel interaction: the step ablation
shows meas_jacobian_batch costs ~0.3 ms isolated but +4.3 ms when it
feeds kf_update_block_gather in the same program. Vary (a) how C is
produced, (b) which update runs, (c) barriers between them.
Run: timeout 3000 python scripts/profile_interaction.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from rbslam_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from bench import _build_problem
from rbslam_tpu.ops.resampling import resample_indices
from rbslam_tpu.kernels.kf_update import kf_update_block_gather, kf_update_block
from rbslam_tpu.math.linalg import logsumexp_normalize

N, M = 16384, 125
data, model_p, potential, k_sd, Q, R = _build_problem(M, N, 192, pallas_basis=True)
_, model_j, *_ = _build_problem(M, N, 192, pallas_basis=False)
nl = potential.n_lin
key = jax.random.PRNGKey(0)
xn = jnp.broadcast_to(jnp.asarray(data.init_state), (N, 7)) + 0.0
xl = jnp.zeros((N, nl))
P = (jnp.broadcast_to(jnp.diag(k_sd), (N, nl, nl))).astype(jnp.bfloat16)
logw = jnp.zeros(N) - np.log(N)
y_t = data.y[1]; u = data.dx[0]; Qj = jnp.asarray(Q); dt = jnp.asarray(0.01)
C_const = jax.vmap(model_j.meas_jacobian)(xn)

def mk_step(jac, barrier=False):
    def step(k, xn, xl, P, logw):
        k1, k2 = jax.random.split(k)
        ai = resample_indices(k1, jnp.exp(logw), N, "systematic")
        xn_a = jnp.take(xn, ai, 0); xl_a = jnp.take(xl, ai, 0)
        xn_n = model_p.dynamics_batch(k2, xn_a, u, dt, Qj)
        C = jac(xn_n)
        if barrier:
            C = jax.lax.optimization_barrier(C)
        xl_n, P_n, lw, _ = kf_update_block_gather(ai, C, xl_a, P, y_t, R)
        _, lwn, _ = logsumexp_normalize(lw)
        return xn_n, xl_n, P_n, lwn
    return step

def timeit(name, fn, reps=30):
    f = jax.jit(fn)
    out = f(key, xn, xl, P, logw); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(reps):
        out = f(jax.random.fold_in(key, i), xn, xl, P, logw)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/reps*1e3:8.3f} ms", flush=True)

timeit("const C + block_gather", mk_step(lambda x: C_const))
timeit("pallas-basis C + block_gather", mk_step(model_p.meas_jacobian_batch))
timeit("pallas-basis C + barrier + block_gather",
       mk_step(model_p.meas_jacobian_batch, barrier=True))
timeit("jnp-basis C + block_gather",
       mk_step(lambda x: jax.vmap(model_j.meas_jacobian)(x)))

def step_dummy_C(k, xn, xl, P, logw):
    # C depends on xn_n through a trivially cheap op (no basis, no quat)
    k1, k2 = jax.random.split(k)
    ai = resample_indices(k1, jnp.exp(logw), N, "systematic")
    xn_a = jnp.take(xn, ai, 0); xl_a = jnp.take(xl, ai, 0)
    xn_n = model_p.dynamics_batch(k2, xn_a, u, dt, Qj)
    C = C_const + xn_n[:, :1, None] * 1e-12
    xl_n, P_n, lw, _ = kf_update_block_gather(ai, C, xl_a, P, y_t, R)
    _, lwn, _ = logsumexp_normalize(lw)
    return xn_n, xl_n, P_n, lwn

timeit("dummy-dependent C + block_gather", step_dummy_C)

def mk_step_postgather(jac):
    def step(k, xn, xl, P, logw):
        k1, k2 = jax.random.split(k)
        ai = resample_indices(k1, jnp.exp(logw), N, "systematic")
        xn_a = jnp.take(xn, ai, 0); xl_a = jnp.take(xl, ai, 0)
        P_a = jnp.take(P, ai, 0)
        xn_n = model_p.dynamics_batch(k2, xn_a, u, dt, Qj)
        C = jac(xn_n)
        xl_n, P_n, lw, _ = kf_update_block(C, P_a, xl_a, y_t, R)
        _, lwn, _ = logsumexp_normalize(lw)
        return xn_n, xl_n, P_n, lwn
    return step

timeit("pallas-basis C + take + block (no DMA gather)",
       mk_step_postgather(model_p.meas_jacobian_batch))
timeit("const C + take + block (no DMA gather)",
       mk_step_postgather(lambda x: C_const))
