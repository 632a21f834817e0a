"""Dissect the dense-mag measurement-Jacobian cost at the bench config:
Pallas basis kernel vs jnp basis path vs the pieces (grad eval, rotation
einsum, concat). Run: timeout 3000 python scripts/profile_jacobian.py"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from rbslam_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from bench import _build_problem
from rbslam_tpu.kernels import grad_basis_pallas
from rbslam_tpu.math.quaternions import quat_to_rmat

N, M = 16384, 125
data, model_p, potential, k_sd, Q, R = _build_problem(M, N, 192, pallas_basis=True)
data2, model_j, *_ = _build_problem(M, N, 192, pallas_basis=False)
key = jax.random.PRNGKey(0)
xn = jnp.broadcast_to(jnp.asarray(data.init_state), (N, 7)) \
    + 0.01 * jax.random.normal(key, (N, 7))

def timeit(name, fn, *args, reps=30):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:36s} {(time.perf_counter()-t0)/reps*1e3:8.3f} ms", flush=True)

basis = potential.basis
timeit("pallas grad_basis (N,3,m)", lambda x: grad_basis_pallas(basis, x[:, :3]), xn)
timeit("jnp vmap grad_phi", lambda x: jax.vmap(basis.grad_phi)(x[:, :3]), xn)
timeit("quat_to_rmat", lambda x: quat_to_rmat(x[:, 3:7]), xn)

def rot_einsum(x):
    g = grad_basis_pallas(basis, x[:, :3])
    eye = jnp.broadcast_to(jnp.eye(3, dtype=x.dtype), g.shape[:-1] + (3,))
    C_nav = jnp.concatenate([eye, g], axis=-1)
    Rnb = quat_to_rmat(x[:, 3:7])
    return jnp.einsum("pji,pjk->pik", Rnb, C_nav)

timeit("meas_jacobian_batch (pallas full)", model_p.meas_jacobian_batch, xn)
timeit("vmap meas_jacobian (jnp full)", lambda x: jax.vmap(model_j.meas_jacobian)(x), xn)
timeit("pallas + rot einsum explicit", rot_einsum, xn)

def rot_matmul(x):
    # rotation via one reshaped MXU matmul instead of the batched
    # [P,3,3] x [P,3,nl] einsum
    g = grad_basis_pallas(basis, x[:, :3])
    eye = jnp.broadcast_to(jnp.eye(3, dtype=x.dtype), g.shape[:-1] + (3,))
    C_nav = jnp.concatenate([eye, g], axis=-1)
    Rnb = quat_to_rmat(x[:, 3:7])
    return jax.lax.dot_general(
        Rnb, C_nav, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

timeit("pallas + rot dot_general", rot_matmul, xn)
