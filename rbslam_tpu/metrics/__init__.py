from .rmse import (
    aligned_position_rmse,
    orientation_rmse_deg,
    map_and_path_rmse,
    rms,
)

__all__ = [
    "aligned_position_rmse",
    "orientation_rmse_deg",
    "map_and_path_rmse",
    "rms",
]
