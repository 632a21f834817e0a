"""In-context step cost breakdown: time the FULL jitted RBPF step, then
ablated variants (constant C, no dynamics, no resample-gather, XLA
update) — deltas give the true in-scan cost of each phase without
per-dispatch noise. Run: timeout 3000 python scripts/profile_step_ablation.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from rbslam_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from bench import _build_problem
from rbslam_tpu.ops.resampling import resample_indices
from rbslam_tpu.ops.kalman import kalman_update_dense_batched
from rbslam_tpu.kernels.kf_update import kf_update_block_gather
from rbslam_tpu.math.linalg import logsumexp_normalize

N, M = 16384, 125
data, model, potential, k_sd, Q, R = _build_problem(M, N, 192, pallas_basis=True)
nl = potential.n_lin
key = jax.random.PRNGKey(0)
xn = jnp.broadcast_to(jnp.asarray(data.init_state), (N, 7)) + 0.0
xl = jnp.zeros((N, nl))
P = (jnp.broadcast_to(jnp.diag(k_sd), (N, nl, nl))).astype(jnp.bfloat16)
logw = jnp.zeros(N) - np.log(N)
y_t = data.y[1]; u = data.dx[0]; Qj = jnp.asarray(Q); dt = jnp.asarray(0.01)
C_const = jax.vmap(model.meas_jacobian)(xn)

def step_full(k, xn, xl, P, logw):
    k1, k2 = jax.random.split(k)
    ai = resample_indices(k1, jnp.exp(logw), N, "systematic")
    xn_a = jnp.take(xn, ai, 0); xl_a = jnp.take(xl, ai, 0)
    xn_n = model.dynamics_batch(k2, xn_a, u, dt, Qj)
    C = model.meas_jacobian_batch(xn_n)
    xl_n, P_n, lw, _ = kf_update_block_gather(ai, C, xl_a, P, y_t, R)
    _, lwn, _ = logsumexp_normalize(lw)
    return xn_n, xl_n, P_n, lwn

def step_const_C(k, xn, xl, P, logw):
    k1, k2 = jax.random.split(k)
    ai = resample_indices(k1, jnp.exp(logw), N, "systematic")
    xn_a = jnp.take(xn, ai, 0); xl_a = jnp.take(xl, ai, 0)
    xn_n = model.dynamics_batch(k2, xn_a, u, dt, Qj)
    xl_n, P_n, lw, _ = kf_update_block_gather(ai, C_const, xl_a, P, y_t, R)
    _, lwn, _ = logsumexp_normalize(lw)
    return xn_n, xl_n, P_n, lwn

def step_no_dyn(k, xn, xl, P, logw):
    k1, k2 = jax.random.split(k)
    ai = resample_indices(k1, jnp.exp(logw), N, "systematic")
    xn_a = jnp.take(xn, ai, 0); xl_a = jnp.take(xl, ai, 0)
    C = model.meas_jacobian_batch(xn_a)
    xl_n, P_n, lw, _ = kf_update_block_gather(ai, C, xl_a, P, y_t, R)
    _, lwn, _ = logsumexp_normalize(lw)
    return xn_a, xl_n, P_n, lwn

def step_identity_ai(k, xn, xl, P, logw):
    k1, k2 = jax.random.split(k)
    ai = jnp.arange(N, dtype=jnp.int32)
    xn_n = model.dynamics_batch(k2, xn, u, dt, Qj)
    C = model.meas_jacobian_batch(xn_n)
    xl_n, P_n, lw, _ = kf_update_block_gather(ai, C, xl, P, y_t, R)
    _, lwn, _ = logsumexp_normalize(lw)
    return xn_n, xl_n, P_n, lwn

def step_xla(k, xn, xl, P, logw):
    k1, k2 = jax.random.split(k)
    ai = resample_indices(k1, jnp.exp(logw), N, "systematic")
    xn_a = jnp.take(xn, ai, 0); xl_a = jnp.take(xl, ai, 0)
    P_a = jnp.take(P, ai, 0)
    xn_n = model.dynamics_batch(k2, xn_a, u, dt, Qj)
    C = model.meas_jacobian_batch(xn_n)
    xl_n, P_n, lw, _ = kalman_update_dense_batched(
        C, P_a, xl_a, y_t, R, 1e-3, False, False)
    _, lwn, _ = logsumexp_normalize(lw)
    return xn_n, xl_n, P_n, lwn

def step_kernel_only(k, xn, xl, P, logw):
    ai = jnp.arange(N, dtype=jnp.int32)
    xl_n, P_n, lw, _ = kf_update_block_gather(ai, C_const, xl, P, y_t, R)
    _, lwn, _ = logsumexp_normalize(lw)
    return xn, xl_n, P_n, lwn

for name, fn in [("full", step_full), ("const C (no basis eval)", step_const_C),
                 ("no dynamics", step_no_dyn), ("identity ai (no resample)", step_identity_ai),
                 ("xla update path", step_xla), ("kernel only", step_kernel_only)]:
    f = jax.jit(fn)
    out = f(key, xn, xl, P, logw); jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 30
    for i in range(reps):
        out = f(jax.random.fold_in(key, i), xn, xl, P, logw)
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.perf_counter()-t0)/reps*1e3:8.3f} ms", flush=True)
