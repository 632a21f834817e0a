"""Run the dense-radio Monte Carlo reproduction and save raw RMSEs.

Reference config: slam-dense-radio/main.m:24-27 — nMC=100 repetitions,
N_P=100, N_K=50 smoother sweeps, m=128 basis functions, with either the
line_3D (N_T=32) or square_3D degeneracy (N_T=48) trajectory. Writes
results/dense_radio_{line|square}_mc{N}.json with per-run RMSEs.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--traj", default="square_3D",
                    choices=["line_3D", "square_3D"])
    ap.add_argument("--mc", type=int, default=100)
    ap.add_argument("--sweeps", type=int, default=50)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from rbslam_tpu.utils.cache import enable_compilation_cache
    from rbslam_tpu.workloads.dense_radio import DenseRadioConfig, run

    enable_compilation_cache()
    cfg = DenseRadioConfig(
        traj_type=args.traj,
        n_steps=48 if args.traj == "square_3D" else 32,
        n_particles=100,
        n_sweeps=args.sweeps,
        n_mc=args.mc,
        m_basis=128,
    )
    out = run(cfg)
    tag = "square" if args.traj == "square_3D" else "line"
    path = args.out or os.path.join(
        os.path.dirname(__file__), "..", "results",
        f"dense_radio_{tag}_mc{args.mc}.json",
    )
    with open(path, "w") as f:
        json.dump(out, f)
    print(json.dumps({k: v for k, v in out.items()
                      if not k.endswith("_all")}, indent=1))


if __name__ == "__main__":
    main()
