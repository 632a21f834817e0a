"""Top-level CLI: `python -m rbslam_tpu <workload> [args...]`."""

from __future__ import annotations

import sys

_WORKLOADS = {
    "dense-radio": "rbslam_tpu.workloads.dense_radio",
    "dense-mag": "rbslam_tpu.workloads.dense_mag",
    "sparse-visual": "rbslam_tpu.workloads.sparse_visual",
    "mag-localization": "rbslam_tpu.workloads.mag_localization",
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print("usage: python -m rbslam_tpu <workload> [args...]")
        print("workloads:", ", ".join(sorted(_WORKLOADS)))
        print("(pass --help after a workload name for its options)")
        raise SystemExit(0 if len(sys.argv) >= 2 else 2)
    name = sys.argv[1]
    if name not in _WORKLOADS:
        print(f"unknown workload {name!r}; options: {sorted(_WORKLOADS)}")
        raise SystemExit(2)
    import importlib

    mod = importlib.import_module(_WORKLOADS[name])
    mod.main(sys.argv[2:])


if __name__ == "__main__":
    main()
