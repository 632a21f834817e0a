from .trajectories import generate_trajectory, TRAJECTORY_TYPES, Trajectory
from .fields import (
    draw_scalar_field,
    draw_scalar_potential_field,
)
from .simulate import simulate_dense_dataset, DenseDataset

__all__ = [
    "generate_trajectory", "TRAJECTORY_TYPES", "Trajectory",
    "draw_scalar_field", "draw_scalar_potential_field",
    "simulate_dense_dataset", "DenseDataset",
]
