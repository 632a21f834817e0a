from .basis_eval import grad_basis_pallas, phi_basis_pallas
from .kf_update import (
    fused_gather_kf_update,
    fused_gather_kf_update_2pass,
    kf_update_block,
    kf_update_block_gather,
)

__all__ = [
    "grad_basis_pallas", "phi_basis_pallas",
    "fused_gather_kf_update", "fused_gather_kf_update_2pass",
    "kf_update_block", "kf_update_block_gather",
]
