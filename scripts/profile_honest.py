"""Pipelined varying-input timing: queue 8 distinct calls, sync once."""
import functools, time, sys
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from rbslam_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from rbslam_tpu.ops.kalman import kalman_update_dense_batched
from rbslam_tpu.kernels.kf_update import fused_gather_kf_update_1pass
sys.path.insert(0, '/root/repo/scripts')
from profile_gather_kernel import pallas_gather

N, ny, nl = 16384, 3, 128
key = jax.random.PRNGKey(0)
k1, k2, k3, k4 = jax.random.split(key, 4)
A = 0.1 * jax.random.normal(k1, (N, nl, nl))
P = (jnp.einsum("pij,pkj->pik", A, A) + 10.0 * jnp.eye(nl)).astype(jnp.bfloat16)
C = jax.random.normal(k2, (N, ny, nl))
xl = jax.random.normal(k3, (N, nl))
y = jax.random.normal(k4, (ny,))
R = 10.0 * jnp.eye(ny)
ais = [jnp.sort(jax.random.randint(jax.random.PRNGKey(i), (N,), 0, N))
       for i in range(8)]

def timeit(name, fn, reps=8):
    f = jax.jit(fn)
    jax.block_until_ready(f(ais[0]))
    t0 = time.perf_counter()
    outs = [f(ais[i]) for i in range(reps)]
    jax.block_until_ready(outs)
    print(f"{name:44s} {(time.perf_counter()-t0)/reps*1e3:9.3f} ms", flush=True)

timeit("noop", lambda a: a + 1)
timeit("jnp.take", lambda a: jnp.take(P, a, axis=0))
for blk in (16, 64):
    timeit(f"pallas gather block={blk}",
           functools.partial(lambda a, blk: pallas_gather(a, P, blk), blk=blk))
timeit("XLA gather+KF no-symm",
       lambda a: kalman_update_dense_batched(
           C, jnp.take(P, a, axis=0), xl, y, R, 1e-3, False, False))
for blk in (16, 64):
    timeit(f"fused 1-pass block={blk}",
           functools.partial(
               lambda a, blk: fused_gather_kf_update_1pass(
                   a, C, xl, P, y, R, block=blk), blk=blk))
