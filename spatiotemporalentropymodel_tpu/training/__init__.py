from .losses import (
    em_loss,
    pixelwise_rate_distortion_loss,
    quality2lambda,
    rate_distortion_loss,
)
from .optimizers import (
    OptimizerPair,
    ReduceLROnPlateau,
    configure_optimizers,
    main_mask,
    quantiles_mask,
)

__all__ = [
    "em_loss",
    "rate_distortion_loss",
    "pixelwise_rate_distortion_loss",
    "quality2lambda",
    "OptimizerPair",
    "configure_optimizers",
    "ReduceLROnPlateau",
    "quantiles_mask",
    "main_mask",
]
