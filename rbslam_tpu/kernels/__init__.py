"""Pallas TPU kernels (dense RBPF hot path + basis evaluation)."""

from .basis_eval import (
    grad_basis_pallas,
    mag3d_jacobian_pallas,
    phi_basis_pallas,
)
from .kf_update import (
    kf_rebase,
    kf_update_block_gather,
    kf_update_lowrank,
)

__all__ = [
    "grad_basis_pallas", "mag3d_jacobian_pallas", "phi_basis_pallas",
    "kf_rebase", "kf_update_block_gather", "kf_update_lowrank",
]
