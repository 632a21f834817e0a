"""In-scan step timing: run lax.scan over T steps of the bench step with
variants, timing (total / T). This is the ground truth the bench sees —
isolated per-call timings on this axon tunnel are unstable (4.3 vs 11.9
ms for identical programs across processes).
Run: timeout 3000 python scripts/profile_scan.py
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

N, M, T = 16384, 125, 192
data, model_p, potential, k_sd, Q, R = _build_problem(M, N, T, pallas_basis=True)
_, model_j, *_ = _build_problem(M, N, T, pallas_basis=False)
nl = potential.n_lin
key = jax.random.PRNGKey(0)
xn0 = jnp.broadcast_to(jnp.asarray(data.init_state), (N, 7)) + 0.0
xl0 = jnp.zeros((N, nl))
P0 = (jnp.broadcast_to(jnp.diag(k_sd), (N, nl, nl))).astype(jnp.bfloat16)
logw0 = jnp.zeros(N) - np.log(N)
Qj = jnp.asarray(Q); dt = jnp.asarray(0.01)
C_const = jax.vmap(model_j.meas_jacobian)(xn0)
ys = jnp.asarray(data.y[1:])
us = jnp.asarray(data.dx)
keys = jax.random.split(key, T - 1)

def mk_scan(jac, kernel="block_gather"):
    def step(carry, inp):
        xn, xl, P, logw, Cc = carry
        k, y_t, u = inp
        k1, k2 = jax.random.split(k)
        ai = resample_indices(k1, jnp.exp(logw), N, "systematic")
        xn_a = jnp.take(xn, ai, 0); xl_a = jnp.take(xl, ai, 0)
        xn_n = model_p.dynamics_batch(k2, xn_a, u, dt, Qj)
        C = jac(xn_n, Cc)
        if kernel == "block_gather":
            xl_n, P_n, lw, _ = kf_update_block_gather(ai, C, xl_a, P, y_t, R)
        else:
            P_a = jnp.take(P, ai, 0)
            xl_n, P_n, lw, _ = kf_update_block(C, P_a, xl_a, y_t, R)
        _, lwn, _ = logsumexp_normalize(lw)
        return (xn_n, xl_n, P_n, lwn, Cc), lwn[0]

    @jax.jit
    def run(key0, xn0, xl0, P0, logw0, ys, us, Cc):
        ks = jax.random.split(key0, T - 1)
        carry, out = jax.lax.scan(
            step, (xn0, xl0, P0, logw0, Cc), (ks, ys, us))
        return out

    return run

def timeit(name, fn, reps=3):
    args = (xn0, xl0, P0, logw0, ys, us, C_const)
    out = fn(key, *args); jax.block_until_ready(out)
    best = np.inf
    for i in range(reps):
        t0 = time.perf_counter()
        out = fn(jax.random.fold_in(key, i), *args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best/(T-1)*1e3:8.3f} ms/step   "
          f"({N*(T-1)/best/1e6:.2f}M ps/s)", flush=True)

timeit("scan: pallas-C + block_gather",
       mk_scan(lambda x, Cc: model_p.meas_jacobian_batch(x)))
timeit("scan: const-C + block_gather", mk_scan(lambda x, Cc: Cc))
timeit("scan: dummy-C + block_gather",
       mk_scan(lambda x, Cc: Cc + x[:, :1, None] * 1e-12))
timeit("scan: jnp-C + block_gather",
       mk_scan(lambda x, Cc: jax.vmap(model_j.meas_jacobian)(x)))
timeit("scan: pallas-C + take+block",
       mk_scan(lambda x, Cc: model_p.meas_jacobian_batch(x), "block"))
timeit("scan: dummy-C + take+block",
       mk_scan(lambda x, Cc: Cc + x[:, :1, None] * 1e-12, "block"))
