from .checkpoint import save_checkpoint, load_checkpoint, latest_step
from .profiling import phase_annotation, ThroughputMeter

__all__ = [
    "save_checkpoint", "load_checkpoint", "latest_step",
    "phase_annotation", "ThroughputMeter",
]
