from .laplace import LaplaceBasis, hypercube_basis
from .spectral import se_spectral_density, linear_plus_se_spectral
from .potential import ScalarPotentialBasis

__all__ = [
    "LaplaceBasis",
    "hypercube_basis",
    "se_spectral_density",
    "linear_plus_se_spectral",
    "ScalarPotentialBasis",
]
