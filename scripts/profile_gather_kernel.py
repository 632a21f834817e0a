"""Measure blocked manual-DMA gather throughput (no compute) on TPU."""
import functools
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from rbslam_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

N, nl = 16384, 128


def _gather_kernel(block, ai_ref, P_hbm, out_ref, pbuf, sems):
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    def issue(bi, slot):
        base = bi * block
        for b in range(block):
            pltpu.make_async_copy(
                P_hbm.at[ai_ref[base + b]], pbuf.at[slot, b], sems.at[slot, b]
            ).start()

    @pl.when(i == 0)
    def _():
        issue(0, 0)

    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    @pl.when(i + 1 < nb)
    def _():
        issue(i + 1, nxt)

    for b in range(block):
        pltpu.make_async_copy(
            P_hbm.at[ai_ref[i * block + b]], pbuf.at[slot, b], sems.at[slot, b]
        ).wait()
        out_ref[b] = pbuf[slot, b]


@functools.partial(jax.jit, static_argnames=("block",))
def pallas_gather(ai, P, block):
    n = ai.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((block, nl, nl), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, block, nl, nl), P.dtype),
            pltpu.SemaphoreType.DMA((2, block)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_gather_kernel, block),
        out_shape=jax.ShapeDtypeStruct((n, nl, nl), P.dtype),
        grid_spec=grid_spec,
    )(ai, P)


if __name__ == "__main__":
    def timeit(name, fn, *args, reps=30):
        f = jax.jit(fn) if not hasattr(fn, "lower") else fn
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*args)
        jax.block_until_ready(out)
        print(f"{name:40s} {(time.perf_counter()-t0)/reps*1e3:9.3f} ms", flush=True)
        return out


    key = jax.random.PRNGKey(0)
    P = jax.random.normal(key, (N, nl, nl)).astype(jnp.bfloat16)
    ai = jnp.sort(jax.random.randint(jax.random.fold_in(key, 1), (N,), 0, N))

    for blk in (8, 16, 32, 64):
        out = timeit(f"pallas gather block={blk}",
                     functools.partial(pallas_gather, block=blk), ai, P)
    ref = jnp.take(P, ai, axis=0)
    print("match:", bool(jnp.all(out == ref)), flush=True)
    timeit("jnp.take", lambda p, a: jnp.take(p, a, axis=0), P, ai)

    # re-measure with varying inputs and per-call sync
    print("--- varying inputs, per-call sync ---", flush=True)
    ais = [jnp.sort(jax.random.randint(jax.random.PRNGKey(i), (N,), 0, N))
           for i in range(8)]
    for blk in (16, 64):
        f = jax.jit(functools.partial(pallas_gather, block=blk))
        jax.block_until_ready(f(ais[0], P))
        t0 = time.perf_counter()
        for i in range(8):
            jax.block_until_ready(f(ais[i], P))
        print(f"pallas gather block={blk} varying: "
              f"{(time.perf_counter()-t0)/8*1e3:9.3f} ms", flush=True)
    g = jax.jit(lambda p, a: jnp.take(p, a, axis=0))
    jax.block_until_ready(g(P, ais[0]))
    t0 = time.perf_counter()
    for i in range(8):
        jax.block_until_ready(g(P, ais[i]))
    print(f"jnp.take varying: {(time.perf_counter()-t0)/8*1e3:9.3f} ms", flush=True)
