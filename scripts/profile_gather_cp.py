"""Minimal gather-fused CP kernel: DMA P_base[bidx[b]] per particle,
one batched dot C@P, output CP only (P never written). If this runs at
~read-floor speed, the lowrank path can hand all small math to XLA.
Run: timeout 3000 python scripts/profile_gather_cp.py"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from rbslam_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from bench import _build_problem

N, M, T = 16384, 125, 64
data, model_j, potential, k_sd, Q, R = _build_problem(M, N, T)
nl = potential.n_lin
key = jax.random.PRNGKey(0)
xn0 = jnp.broadcast_to(jnp.asarray(data.init_state), (N, 7)) + 0.0
C_const = jax.vmap(model_j.meas_jacobian)(xn0)
P0 = (jnp.broadcast_to(jnp.diag(k_sd), (N, nl, nl))).astype(jnp.bfloat16)
ident = jnp.arange(N, dtype=jnp.int32)

def _kernel_gcp(ny, block, bidx_ref, C_ref, P_hbm, cp_ref, pbuf, sems):
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    def issue(block_idx, slot):
        base = block_idx * block
        for b in range(block):
            pltpu.make_async_copy(P_hbm.at[bidx_ref[base + b]],
                                  pbuf.at[slot, b], sems.at[slot, b]).start()
    @pl.when(i == 0)
    def _():
        issue(0, 0)
    slot = jax.lax.rem(i, 2)
    @pl.when(i + 1 < n_blocks)
    def _():
        issue(i + 1, jax.lax.rem(i + 1, 2))
    for b in range(block):
        pltpu.make_async_copy(P_hbm.at[bidx_ref[i * block + b]],
                              pbuf.at[slot, b], sems.at[slot, b]).wait()
    P = pbuf[slot]
    cp_ref[...] = jax.lax.dot_general(
        C_ref[...].astype(P.dtype), P, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

@functools.partial(jax.jit, static_argnames=("ny", "nl", "block"))
def gather_cp(bidx, C, P_all, ny, nl, block):
    n = C.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(n // block,),
        in_specs=[pl.BlockSpec((block, ny, nl), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[pl.BlockSpec((block, ny, nl), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((2, block, nl, nl), P_all.dtype),
                        pltpu.SemaphoreType.DMA((2, block))],
    )
    return pl.pallas_call(
        functools.partial(_kernel_gcp, ny, block),
        out_shape=[jax.ShapeDtypeStruct((n, ny, nl), jnp.float32)],
        grid_spec=grid_spec)(bidx, C, P_all)[0]

def timeit(name, f, args, reps=3):
    out = f(*args); jax.block_until_ready(out)
    best = np.inf
    for i in range(reps):
        t0 = time.perf_counter()
        out = f(*args); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:56s} {best/T*1e3:8.3f} ms/step", flush=True)

def mk(block):
    @jax.jit
    def run(bidx, C, P):
        def step(c, _):
            cp = gather_cp(bidx, c, P, 3, nl, block)
            return cp.astype(c.dtype) * 1e-6 + c * 0.999, cp[0, 0, 0]
        return jax.lax.scan(step, C, None, length=T)[1]
    return run

for b in (32, 64, 128):
    timeit(f"gather-CP kernel b={b}", mk(b), (ident, C_const, P0))
# correctness
cp = gather_cp(ident, C_const, P0, 3, nl, 32)
ref = jax.lax.dot_general(C_const.astype(jnp.bfloat16), P0,
                          (((2,), (1,)), ((0,), (0,))),
                          preferred_element_type=jnp.float32)
print("max err:", float(jnp.max(jnp.abs(cp - ref))))
