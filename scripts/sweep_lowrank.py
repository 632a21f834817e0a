"""Sweep the low-rank factored KF path vs block_gather/xla on the real
chip (VERDICT r3 ask #1): lowrank_period in {4, 8, 16, 32}, bench
config N_P=16384, m=125+3, T=192, bf16 covariance. Prints one line per
config; results go to RESULTS.md and pick bench.py's default.

Run: timeout 9000 python scripts/sweep_lowrank.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from rbslam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import bench

rows = []


def one(kf_kernel, period=8, **kw):
    t0 = time.time()
    thr, elapsed, T = bench.bench_rbpf(
        125, 16384, 192, pallas_basis=True, cov_dtype="bfloat16",
        symmetrize=False, kf_kernel=kf_kernel, lowrank_period=period, **kw
    )
    tag = kf_kernel + (f"-r{period}" if kf_kernel == "lowrank" else "")
    row = {"config": tag, "particle_steps_per_s": round(thr, 1),
           "step_ms": round(elapsed / T * 1e3, 3),
           "wall_s": round(time.time() - t0, 1)}
    rows.append(row)
    print(json.dumps(row), flush=True)


one("xla")
one("block_gather")
for r in (4, 8, 16, 32, 64):
    one("lowrank", period=r)

with open("/root/repo/results/lowrank_sweep.json", "w") as f:
    json.dump(rows, f, indent=1)
