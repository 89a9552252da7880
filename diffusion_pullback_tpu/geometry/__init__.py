from .pullback import (
    PullbackResult,
    local_pullback,
    local_encoder_pullback,
    local_decoder_pullback,
    pullback_covector,
)

__all__ = [
    "PullbackResult",
    "local_pullback",
    "local_encoder_pullback",
    "local_decoder_pullback",
    "pullback_covector",
]
