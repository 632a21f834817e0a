"""Two targeted experiments on the remaining lowrank-step overheads:

1. systematic resampling variants, timed inside a scan (the current
   sort-based searchsorted vs a scatter-histogram formulation vs the
   binary-search lowering) — the comb inversion is monotone, so
   ai[j] = #{i : ceil(N cdf_i - u0) <= j} can be computed by a
   bucket-count + cumsum instead of a sort.
2. kf_rebase block-size sweep (the rebase kernel measured 2.7x over its
   read+write floor at block<=32).

Run: timeout 3000 python scripts/profile_resample_rebase.py
"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from rbslam_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

N = 16384
T = 128
key = jax.random.PRNGKey(0)
logw = 2.0 * jax.random.normal(key, (N,))
keys = jax.random.split(key, T)


def sys_sort(k, w, n):
    from rbslam_tpu.ops.resampling import systematic_resample
    return systematic_resample(k, w, n)


def sys_hist(k, w, n):
    u0 = jax.random.uniform(k, ())
    cdf = jnp.cumsum(w)
    cdf = cdf / cdf[-1]
    b = jnp.ceil(n * cdf - u0).astype(jnp.int32)
    b = jnp.clip(b, 0, n)
    hist = jnp.zeros(n + 1, jnp.int32).at[b].add(1, mode="drop")
    ai = jnp.cumsum(hist[:n])
    return jnp.clip(ai, 0, n - 1).astype(jnp.int32)


def sys_scan(k, w, n):
    u0 = jax.random.uniform(k, ())
    u = (jnp.arange(n, dtype=w.dtype) + u0) / n
    cdf = jnp.cumsum(w)
    cdf = cdf / cdf[-1]
    return jnp.clip(
        jnp.searchsorted(cdf, u, side="right", method="scan_unrolled"),
        0, n - 1,
    ).astype(jnp.int32)


# correctness: hist == sort on random weights, several seeds
for s in range(5):
    kk = jax.random.fold_in(key, s)
    w = jax.nn.softmax(3.0 * jax.random.normal(kk, (N,)))
    a = np.asarray(sys_sort(kk, w, N))
    b = np.asarray(sys_hist(kk, w, N))
    if not np.array_equal(a, b):
        d = np.nonzero(a != b)[0]
        print(f"seed {s}: MISMATCH at {d.size} combs, first {d[:5]}",
              {int(i): (int(a[i]), int(b[i])) for i in d[:3]})
    else:
        print(f"seed {s}: hist == sort (bitwise)")

# in-scan timing: resample + gather a [N, 128] payload (xl-sized)
payload = jax.random.normal(key, (N, 128))


def make_loop(fn):
    @jax.jit
    def run(ks, logw, pay):
        def step(carry, k):
            lw, p = carry
            ai = fn(k, jnp.exp(lw), N)
            p = jnp.take(p, ai, 0)
            lw = jnp.take(lw, ai, 0) * 0.999
            return (lw, p), ai[0]
        return jax.lax.scan(step, (logw, pay), ks)[1]
    return run


def timeit(name, f, args, denom=T, reps=3):
    out = f(*args); jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:40s} {best/denom*1e3:8.3f} ms/step", flush=True)


timeit("searchsorted sort (current)", make_loop(sys_sort),
       (keys, logw, payload))
timeit("scatter histogram", make_loop(sys_hist), (keys, logw, payload))
timeit("searchsorted scan_unrolled", make_loop(sys_scan),
       (keys, logw, payload))

# ---- rebase block sweep ----
from rbslam_tpu.kernels.kf_update import _rebase_call

nl, rw = 128, 24
P0 = jax.random.normal(key, (N, nl, nl)).astype(jnp.bfloat16)
Wt = (0.1 * jax.random.normal(key, (N, rw, nl))).astype(jnp.bfloat16)
w = jax.nn.softmax(2.0 * jax.random.normal(key, (N,)))
u = (jnp.arange(N, dtype=jnp.float32) + 0.5) / N
ai = jnp.clip(jnp.searchsorted(jnp.cumsum(w), u), 0, N - 1).astype(jnp.int32)

for blk in (16, 32, 64, 128):
    @jax.jit
    def scan_rb(bidx, Wt, P, blk=blk):
        def step(P, _):
            return _rebase_call(bidx, Wt, P, nl, rw, blk, False), P[0, 0, 0]
        return jax.lax.scan(step, P, None, length=32)[1]
    try:
        timeit(f"rebase block={blk}", scan_rb, (ai, Wt, P0), denom=32)
    except Exception as e:
        print(f"rebase block={blk} FAILED: {str(e)[:120]}")
