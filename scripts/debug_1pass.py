"""Diagnose the 1-pass kernel mismatch on real TPU."""
import jax
import jax.numpy as jnp
import numpy as np
import sys
sys.path.insert(0, "/root/repo")
from rbslam_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from rbslam_tpu.kernels.kf_update import fused_gather_kf_update_1pass
from rbslam_tpu.ops.kalman import kalman_update_dense_batched

N, ny, nl = 256, 3, 128
key = jax.random.PRNGKey(0)
k1, k2, k3, k4 = jax.random.split(key, 4)
A = 0.1 * jax.random.normal(k1, (N, nl, nl))
P = jnp.einsum("pij,pkj->pik", A, A) + 10.0 * jnp.eye(nl)
C = jax.random.normal(k2, (N, ny, nl))
xl = jax.random.normal(k3, (N, nl))
y = jax.random.normal(k4, (ny,))
R = 10.0 * jnp.eye(ny)
ai = jnp.sort(jax.random.randint(jax.random.fold_in(key, 9), (N,), 0, N))

Pg = jnp.take(P, ai, axis=0)
xg = jnp.take(xl, ai, axis=0)
ref = kalman_update_dense_batched(C, Pg, xg, y, R, 1e-3, False)

for blk in (8, 16):
    out = fused_gather_kf_update_1pass(ai, C, xg, P, y, R, block=blk)
    out2 = fused_gather_kf_update_1pass(ai, C, xg, P, y, R, block=blk)
    det = float(jnp.max(jnp.abs(out[1] - out2[1])))
    dpi = jnp.max(jnp.abs(out[1] - ref[1]), axis=(1, 2))
    bad_rows = np.asarray(jnp.nonzero(dpi > 1e-3)[0])
    print(f"block={blk} det={det:.2e} "
          f"max|dP|={float(jnp.max(dpi)):.3e} "
          f"max|dxl|={float(jnp.max(jnp.abs(out[0]-ref[0]))):.3e} "
          f"bad rows: {bad_rows[:16]}", flush=True)
