from .rbpf import RBPFConfig, RBPFResult, run_rbpf
from .pf import PFConfig, PFResult, run_pf_localization
from .rbps import RBPSConfig, RBPSResult, run_rbps
from .rbps_info import run_rbps_information_form
from .ekf import run_ekf_dense, run_ekf_dense_batched, EKFResult

__all__ = [
    "RBPFConfig", "RBPFResult", "run_rbpf",
    "PFConfig", "PFResult", "run_pf_localization",
    "RBPSConfig", "RBPSResult", "run_rbps",
    "run_rbps_information_form",
    "run_ekf_dense", "run_ekf_dense_batched", "EKFResult",
]
