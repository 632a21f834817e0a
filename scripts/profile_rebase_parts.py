"""Isolate the rebase kernel's cost: gather+write only (no math) vs the
Wt^T Wt dot only (no gather) vs full. Distinguishes DMA-bound from
MXU-latency-bound (the batched K=24 matmul runs one small MXU pass per
particle). Run: timeout 3000 python scripts/profile_rebase_parts.py"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from rbslam_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

N, nl, rw, block = 16384, 128, 24, 32
key = jax.random.PRNGKey(0)
P0 = jax.random.normal(key, (N, nl, nl)).astype(jnp.bfloat16)
Wt = (0.1 * jax.random.normal(key, (N, rw, nl))).astype(jnp.bfloat16)
w = jax.nn.softmax(2.0 * jax.random.normal(key, (N,)))
u = (jnp.arange(N, dtype=jnp.float32) + 0.5) / N
ai = jnp.clip(jnp.searchsorted(jnp.cumsum(w), u), 0, N - 1).astype(jnp.int32)


def make_kernel(do_gather, do_dot):
    def kern(bidx_ref, Wt_ref, P_hbm, out_ref, pbuf, sems):
        i = pl.program_id(0)
        n_blocks = pl.num_programs(0)

        def issue(bi, slot):
            base = bi * block
            for b in range(block):
                pltpu.make_async_copy(
                    P_hbm.at[bidx_ref[base + b]], pbuf.at[slot, b],
                    sems.at[slot, b]).start()

        if do_gather:
            @pl.when(i == 0)
            def _():
                issue(0, 0)
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_blocks)
            def _():
                issue(i + 1, jax.lax.rem(i + 1, 2))
            for b in range(block):
                pltpu.make_async_copy(
                    P_hbm.at[bidx_ref[i * block + b]], pbuf.at[slot, b],
                    sems.at[slot, b]).wait()
            P = pbuf[slot]
        else:
            P = pbuf[0]
        if do_dot:
            dd = jax.lax.dot_general(
                Wt_ref[...], Wt_ref[...], (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            out_ref[...] = P - dd.astype(P.dtype)
        else:
            out_ref[...] = P

    @jax.jit
    def call(bidx, Wt, P):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(N // block,),
            in_specs=[pl.BlockSpec((block, rw, nl), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=[pl.BlockSpec((block, nl, nl), lambda i, *_: (i, 0, 0),
                                    memory_space=pltpu.VMEM)],
            scratch_shapes=[pltpu.VMEM((2, block, nl, nl), P.dtype),
                            pltpu.SemaphoreType.DMA((2, block))],
        )
        return pl.pallas_call(
            kern, out_shape=[jax.ShapeDtypeStruct((N, nl, nl), P.dtype)],
            grid_spec=gs, interpret=False)(bidx, Wt, P)[0]

    @jax.jit
    def loop(bidx, Wt, P):
        def step(P, _):
            Pn = call(bidx, Wt, P)
            return Pn, jnp.float32(Pn[0, 0, 0]) + jnp.float32(Pn[-1, -1, -1])
        return jax.lax.scan(step, P, None, length=32)[1]
    return loop


def timeit(name, f, args, denom=32, reps=3):
    out = f(*args); jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:40s} {best/denom*1e3:8.3f} ms/call", flush=True)


timeit("gather + write (no dot)", make_kernel(True, False), (ai, Wt, P0))
timeit("dot + write (no gather)", make_kernel(False, True), (ai, Wt, P0))
timeit("full rebase", make_kernel(True, True), (ai, Wt, P0))
timeit("write only", make_kernel(False, False), (ai, Wt, P0))
