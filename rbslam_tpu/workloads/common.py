"""Shared workload utilities: config dataclasses, JSON reporting, timing."""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Any


def report(results: dict) -> None:
    """Print one JSON line per workload run (machine-checkable)."""

    def clean(v: Any):
        import numpy as np

        if isinstance(v, (list, tuple)):
            return [clean(x) for x in v]
        if isinstance(v, dict):
            return {k: clean(x) for k, x in v.items()}
        if hasattr(v, "item") and getattr(v, "ndim", 1) == 0:
            return v.item()
        if isinstance(v, np.ndarray):
            return v.tolist()
        return v

    print(json.dumps(clean(results)))


class Timer:
    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        return False


def config_dict(cfg) -> dict:
    if dataclasses.is_dataclass(cfg):
        return dataclasses.asdict(cfg)
    return dict(cfg._asdict()) if hasattr(cfg, "_asdict") else vars(cfg)
