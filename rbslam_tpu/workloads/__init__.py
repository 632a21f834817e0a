"""Runnable workloads matching the four reference examples (SURVEY §2.3).

Each module has a `run(config) -> dict` entry point and a CLI
(`python -m rbslam_tpu.workloads.<name> [--quick]`).
"""
