"""Full lowrank-step ablation: time the complete inner step (as the
engine's lowrank_inner builds it) and variants with one phase removed
each — the deltas are the in-scan cost of resampling, dynamics, the
Jacobian/basis eval, the Wt gather, and the outs bookkeeping.
Run: timeout 3000 python scripts/profile_lowrank_step.py"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from rbslam_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from bench import _build_problem
from rbslam_tpu.kernels.kf_update import kf_update_lowrank
from rbslam_tpu.ops.resampling import resample_indices
from rbslam_tpu.math.linalg import logsumexp_normalize, ess_from_logw

N, M, T = 16384, 125, 64
data, model, potential, k_sd, Q, R = _build_problem(M, N, T,
                                                    pallas_basis=True)
nl = potential.n_lin
key = jax.random.PRNGKey(0)
xn0 = jnp.broadcast_to(jnp.asarray(data.init_state), (N, 7)) + 0.0
C_const = model.meas_jacobian_batch_rows(xn0, 128, jnp.bfloat16)
xl0 = jnp.zeros((N, nl))
P0 = (jnp.broadcast_to(jnp.diag(k_sd), (N, nl, nl))).astype(jnp.bfloat16)
y_t = jnp.asarray(data.y[1])
u = jnp.asarray(data.dx[0]); Qj = jnp.asarray(Q); dt = jnp.asarray(0.01)
rw = 24
Wt0 = jnp.zeros((N, rw, nl), jnp.bfloat16)
bidx0 = jnp.arange(N, dtype=jnp.int32)
logw0 = jnp.zeros(N) - np.log(N)
keys = jax.random.split(key, T)


def make_scan(resample=True, gather_wt=True, dynamics=True, jacobian=True,
              kernel=True, outs=True):
    def inner(P_base, C_c, carry, inp):
        xn, xl, Wt, bidx, logw_n = carry
        k, ph = inp
        k_res, k_dyn = jax.random.split(k)
        if resample:
            ai = resample_indices(k_res, jnp.exp(logw_n), N, "systematic")
            xn = jnp.take(xn, ai, 0)
            xl = jnp.take(xl, ai, 0)
            bidx = jnp.take(bidx, ai, 0)
        if gather_wt and resample:
            Wt = jnp.take(Wt, ai, 0)
        if dynamics:
            xn = model.dynamics_batch(k_dyn, xn, u, dt, Qj)
        Ct = (model.meas_jacobian_batch_rows(xn, 128, jnp.bfloat16)
              if jacobian else C_c)
        if kernel:
            xl, wnew, logw, _ = kf_update_lowrank(
                bidx, Ct, xl, Wt, P_base, y_t, R)
            Wt = jax.lax.dynamic_update_slice(
                Wt, wnew.astype(Wt.dtype), (0, 3 * (ph % 8), 0))
        else:
            logw = -0.5 * jnp.sum(Ct[:, :, 0] ** 2, 0) + xl[:, 0]
        w_new, logw_nn, logz = logsumexp_normalize(logw)
        if outs:
            iw = jnp.argmax(logw_nn)
            o = (xn[iw], jnp.sum(xn * w_new[:, None], 0),
                 ess_from_logw(logw_nn), logz)
        else:
            o = logz
        return (xn, xl, Wt, bidx, logw_nn), o

    @jax.jit
    def run(P_base, C_c, ks, xn, xl, Wt, bidx, logw_n):
        inp = (ks, jnp.arange(T, dtype=jnp.int32))
        import functools
        body = functools.partial(inner, P_base, C_c)
        return jax.lax.scan(body, (xn, xl, Wt, bidx, logw_n), inp)[1]
    return run


def timeit(name, f, reps=3):
    args = (P0, C_const, keys, xn0, xl0, Wt0, bidx0, logw0)
    out = f(*args); jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best/T*1e3:8.3f} ms/step", flush=True)


timeit("FULL inner step", make_scan())
timeit("- outs (argmax/mean/ess)", make_scan(outs=False))
timeit("- jacobian (const C)", make_scan(jacobian=False))
timeit("- dynamics", make_scan(dynamics=False))
timeit("- resample+all gathers", make_scan(resample=False))
timeit("- Wt gather only", make_scan(gather_wt=False))
timeit("- kernel (weights faked)", make_scan(kernel=False))
timeit("kernel+Wt-DUS only", make_scan(
    resample=False, dynamics=False, jacobian=False, outs=False))
