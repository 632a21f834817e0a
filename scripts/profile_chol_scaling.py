"""XLA batched cholesky/triangular_solve scaling + blocked prototype."""
import time
import jax
import jax.numpy as jnp
import numpy as np
import sys
sys.path.insert(0, "/root/repo")
from rbslam_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

Nb = 100


def timeit(name, fn, *args, reps=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:48s} {(time.perf_counter()-t0)/reps*1e3:9.3f} ms", flush=True)
    return out


def spd(key, n):
    A = 0.05 * jax.random.normal(key, (Nb, n, n))
    return jnp.einsum("pij,pkj->pik", A, A) + 5.0 * jnp.eye(n)


key = jax.random.PRNGKey(0)
for n in (128, 256, 512):
    S = spd(key, n)
    timeit(f"XLA chol [{Nb},{n},{n}]", jnp.linalg.cholesky, S)

S512 = spd(key, 512)
L512 = jnp.linalg.cholesky(S512)
B = jax.random.normal(key, (Nb, 512, 128))
timeit("tri_solve matrix RHS [100,512,512]x[..,128]",
       lambda l, b: jax.scipy.linalg.solve_triangular(l, b, lower=True),
       L512, B)
v = jax.random.normal(key, (Nb, 512))
timeit("tri_solve vec RHS",
       lambda l, b: jax.scipy.linalg.solve_triangular(l, b[..., None],
                                                      lower=True), L512, v)


def blocked_chol(S, nb=128):
    """Blocked lower Cholesky: XLA chol on diagonal panels, MXU matmuls
    for the trailing updates, explicit triangular inverse per panel."""
    n = S.shape[-1]
    k = n // nb
    eye = jnp.eye(nb, dtype=S.dtype)
    L = jnp.zeros_like(S)
    for i in range(k):
        sl_i = slice(i * nb, (i + 1) * nb)
        D = S[:, sl_i, sl_i]
        Ld = jnp.linalg.cholesky(D)
        Ld_inv = jax.scipy.linalg.solve_triangular(Ld, jnp.broadcast_to(eye, Ld.shape), lower=True)
        L = L.at[:, sl_i, sl_i].set(Ld)
        if i + 1 < k:
            sl_r = slice((i + 1) * nb, n)
            panel = jnp.einsum("pij,pkj->pik", S[:, sl_r, sl_i], Ld_inv)
            L = L.at[:, sl_r, sl_i].set(panel)
            S = S.at[:, sl_r, sl_r].add(
                -jnp.einsum("pij,pkj->pik", panel, panel)
            )
    return L


Lb = blocked_chol(S512)
err = float(jnp.max(jnp.abs(Lb - L512)))
print("blocked chol max err:", err, flush=True)
timeit("blocked chol [100,512,512] nb=128", blocked_chol, S512)
timeit("blocked chol nb=256", lambda s: blocked_chol(s, 256), S512)


def blocked_tri_solve_vec(L, b, nb=128):
    """Blocked forward substitution for vector RHS."""
    n = L.shape[-1]
    k = n // nb
    eye = jnp.eye(nb, dtype=L.dtype)
    xs = []
    for i in range(k):
        sl_i = slice(i * nb, (i + 1) * nb)
        rhs = b[:, sl_i]
        for j, xj in enumerate(xs):
            sl_j = slice(j * nb, (j + 1) * nb)
            rhs = rhs - jnp.einsum("pij,pj->pi", L[:, sl_i, sl_j], xj)
        Ld_inv = jax.scipy.linalg.solve_triangular(
            L[:, sl_i, sl_i], jnp.broadcast_to(eye, L[:, sl_i, sl_i].shape),
            lower=True)
        xs.append(jnp.einsum("pij,pj->pi", Ld_inv, rhs))
    return jnp.concatenate(xs, axis=-1)


xb = blocked_tri_solve_vec(L512, v)
xr = jax.scipy.linalg.solve_triangular(L512, v[..., None], lower=True)[..., 0]
print("blocked solve max err:", float(jnp.max(jnp.abs(xb - xr))), flush=True)
timeit("blocked tri_solve vec nb=128", blocked_tri_solve_vec, L512, v)

print("--- varying-input pipelined (honest) ---", flush=True)
Ss = [spd(jax.random.PRNGKey(i), 512) for i in range(8)]
vs = [jax.random.normal(jax.random.PRNGKey(i), (Nb, 512)) for i in range(8)]
from rbslam_tpu.math.linalg import psd_cholesky

def timeit_vary(name, fn, argss, reps=8):
    f = jax.jit(fn)
    jax.block_until_ready(f(*argss[0]))
    t0 = time.perf_counter()
    outs = [f(*argss[i]) for i in range(reps)]
    jax.block_until_ready(outs)
    print(f"{name:48s} {(time.perf_counter()-t0)/reps*1e3:9.3f} ms", flush=True)

timeit_vary("noop", lambda s: s[:, 0, 0] + 1, [(S,) for S in Ss])
timeit_vary("XLA chol", jnp.linalg.cholesky, [(S,) for S in Ss])
timeit_vary("psd_cholesky", lambda s: psd_cholesky(s, 1e-2)[0], [(S,) for S in Ss])
timeit_vary("blocked chol nb=128", blocked_chol, [(S,) for S in Ss])
Ls = [jnp.linalg.cholesky(S) for S in Ss]
timeit_vary("tri_solve vec", lambda l, b: jax.scipy.linalg.solve_triangular(
    l, b[..., None], lower=True), list(zip(Ls, vs)))
timeit_vary("blocked tri_solve vec", blocked_tri_solve_vec, list(zip(Ls, vs)))
