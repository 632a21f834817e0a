"""Op-level device-trace attribution of the reference-scale info-form
smoother step (N_P=100, nl=515, woodbury) — where do the 3.3 ms/step go?
Run: timeout 3000 python scripts/trace_smoother.py
"""
import glob
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from rbslam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
from bench import _build_problem
from rbslam_tpu.engines import RBPSConfig, run_rbps_information_form

data, model, potential, k, Q, R = _build_problem(512, 100, 192)
cfg = RBPSConfig(n_particles=100, n_sweeps=2, resampling="systematic",
                 ancestor_form="woodbury")
args = (model, data.dx, data.y, data.init_state,
        jnp.zeros(potential.n_lin), jnp.diag(k), Q, R, 0.01, cfg)
key = jax.random.PRNGKey(0)
res = run_rbps_information_form(key, *args)
jax.block_until_ready(res.XNK)

logdir = "/tmp/smoother_trace"
with jax.profiler.trace(logdir):
    res = run_rbps_information_form(jax.random.fold_in(key, 1), *args)
    jax.block_until_ready(res.XNK)

paths = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True))
pd = jax.profiler.ProfileData.from_file(paths[-1])
agg = defaultdict(float)
cnt = defaultdict(int)
for plane in pd.planes:
    if "TPU" not in plane.name:
        continue
    for line in plane.lines:
        for ev in line.events:
            agg[ev.name] += ev.duration_ns
            cnt[ev.name] += 1
rows = sorted(agg.items(), key=lambda kv: -kv[1])
for name, ns in rows[:35]:
    print(f"{ns/1e6:9.3f} ms  x{cnt[name]:5d}  {name[:110]}")
