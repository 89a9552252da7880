from .pca import PCAResult, global_pca, local_pca, pca_to_x_direction
from .pullback import (
    batched_local_pullback,
    PullbackResult,
    local_decoder_pullback,
    local_encoder_pullback,
    local_pullback,
    pullback_covector,
)
from .transport import transport_all, transport_direction

__all__ = [
    "PCAResult",
    "PullbackResult",
    "global_pca",
    "batched_local_pullback",
    "local_decoder_pullback",
    "local_encoder_pullback",
    "local_pca",
    "local_pullback",
    "pca_to_x_direction",
    "pullback_covector",
    "transport_all",
    "transport_direction",
]
