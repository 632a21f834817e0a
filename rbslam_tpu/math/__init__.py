from .quaternions import (
    expq,
    logq,
    mcross,
    qinv,
    qleft,
    qmul,
    qright,
    quat_to_euler,
    quat_to_rmat,
    rmat_to_quat,
)
from .linalg import (
    psd_cholesky,
    gaussian_logpdf_chol,
    solve_psd,
    symmetrize,
    tril_solve,
    logsumexp_normalize,
    ess_from_logw,
)
from .procrustes import procrustes, procrustes_transform

__all__ = [
    "expq", "logq", "mcross", "qinv", "qleft", "qmul", "qright",
    "quat_to_euler", "quat_to_rmat", "rmat_to_quat",
    "psd_cholesky", "gaussian_logpdf_chol", "solve_psd", "symmetrize",
    "tril_solve", "logsumexp_normalize", "ess_from_logw",
    "procrustes", "procrustes_transform",
]
