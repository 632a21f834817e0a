from .basis_eval import grad_basis_pallas, phi_basis_pallas

__all__ = ["grad_basis_pallas", "phi_basis_pallas"]
