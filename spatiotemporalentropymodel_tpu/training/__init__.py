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
    get_main_learning_rate,
    main_mask,
    quantiles_mask,
    set_main_learning_rate,
)
from .checkpoints import (
    CheckpointManager,
    load_checkpoint,
    save_checkpoint,
)
from .logging import MetricsLogger, StageTimer, profile_trace

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
    "set_main_learning_rate",
    "get_main_learning_rate",
    "CheckpointManager",
    "save_checkpoint",
    "load_checkpoint",
    "MetricsLogger",
    "StageTimer",
    "profile_trace",
]
