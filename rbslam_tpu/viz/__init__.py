from .plots import (
    plot_dense_map,
    plot_trajectories,
    plot_landmark_map,
    plot_degeneracy,
)
from .homography import estimate_homography, apply_homography

__all__ = [
    "plot_dense_map", "plot_trajectories", "plot_landmark_map",
    "plot_degeneracy", "estimate_homography", "apply_homography",
]
