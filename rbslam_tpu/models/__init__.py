from .base import DenseModel, SparseModel
from .radio2d import make_radio2d_model
from .mag3d import make_mag3d_model
from .pinhole2d import make_pinhole2d_model, PinholeCamera
from .terrain import make_terrain_model, make_gridded_terrain_model, gridify_gp

__all__ = [
    "DenseModel", "SparseModel",
    "make_radio2d_model", "make_mag3d_model",
    "make_pinhole2d_model", "PinholeCamera",
    "make_terrain_model", "make_gridded_terrain_model", "gridify_gp",
]
