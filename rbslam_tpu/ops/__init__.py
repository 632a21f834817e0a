from .resampling import (
    multinomial_resample,
    systematic_resample,
    stratified_resample,
    sample_categorical,
    resample_indices,
)
from .kalman import (
    kalman_update_dense,
    kalman_update_dense_batched,
    kalman_update_masked,
    kalman_update_masked_batched,
    dense_log_weights,
    masked_log_weights,
)

__all__ = [
    "multinomial_resample", "systematic_resample", "stratified_resample",
    "sample_categorical", "resample_indices",
    "kalman_update_dense", "kalman_update_masked",
    "kalman_update_dense_batched", "kalman_update_masked_batched",
    "dense_log_weights", "masked_log_weights",
]
