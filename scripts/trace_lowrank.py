"""Capture a jax.profiler trace of the bench-config RBPF and aggregate
device op durations via jax.profiler.ProfileData — the phase-level
attribution VERDICT r4 #2 asks for.
Run: timeout 3000 python scripts/trace_lowrank.py [kf_kernel]
"""
import glob
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from rbslam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
from bench import _build_problem
from rbslam_tpu.engines import RBPFConfig, run_rbpf

kern = sys.argv[1] if len(sys.argv) > 1 else "lowrank"
N, M, T = 16384, 125, 192
data, model, potential, k, Q, R = _build_problem(M, N, T, pallas_basis=True)
cfg = RBPFConfig(n_particles=N, resampling="systematic",
                 cov_dtype="bfloat16", symmetrize_cov=False,
                 kf_kernel=kern, lowrank_period=8)
args = (model, data.dx, data.y, data.init_state,
        jnp.zeros(potential.n_lin), jnp.diag(k), Q, R, 0.01, cfg)
key = jax.random.PRNGKey(0)
res = run_rbpf(key, *args)
jax.block_until_ready(res.logw)

logdir = "/tmp/lowrank_trace"
with jax.profiler.trace(logdir):
    res = run_rbpf(jax.random.fold_in(key, 1), *args)
    jax.block_until_ready(res.logw)

# parse the xplane proto
paths = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True))
print("trace files:", paths)
pd = jax.profiler.ProfileData.from_file(paths[-1])
agg = defaultdict(float)
cnt = defaultdict(int)
for plane in pd.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name:
        continue
    print("plane:", plane.name)
    for line in plane.lines:
        for ev in line.events:
            d = ev.duration_ns
            name = ev.name
            agg[name] += d
            cnt[name] += 1
rows = sorted(agg.items(), key=lambda kv: -kv[1])
tot = sum(agg.values())
print(f"total device ns (all lines): {tot/1e6:.2f} ms")
for name, ns in rows[:45]:
    print(f"{ns/1e6:9.3f} ms  x{cnt[name]:5d}  {name[:110]}")
