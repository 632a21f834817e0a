from .checkpoint import save_checkpoint, load_checkpoint, latest_step
from .profiling import phase_annotation, ThroughputMeter
from .cache import enable_compilation_cache

__all__ = [
    "save_checkpoint", "load_checkpoint", "latest_step",
    "phase_annotation", "ThroughputMeter", "enable_compilation_cache",
]
