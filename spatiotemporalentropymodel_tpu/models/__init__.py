from .base import CompressionModel
from .priors import (
    FactorizedPrior,
    FactorizedPriorModule,
    JointAutoregressiveHierarchicalPriors,
    JointAutoregressiveModule,
    MeanScaleHyperprior,
    MeanScaleHyperpriorModule,
    ScaleHyperprior,
    ScaleHyperpriorModule,
)
from .charm import ChannelARSTEMModule, SpatioTemporalPriorModelChannelAR
from .waseda import Cheng2020Anchor, Cheng2020Attention
from .stem_roi import (
    StemBaseline,
    StemBaselineModule,
    StemBaselineV2,
    StemROI,
    StemROIModule,
    StemROIWoGsc,
    StemROI_I,
)
from .stem import (
    STEM_VARIANTS,
    SpatioTemporalPriorModel,
    SpatioTemporalPriorModelFull,
    SpatioTemporalPriorModelWithoutSPM,
    SpatioTemporalPriorModelWithoutSPMTPM,
    SpatioTemporalPriorModelWithoutTPM,
    SpatioTemporalPriorModel_Res,
    STEMModule,
)

__all__ = [
    "CompressionModel",
    "FactorizedPrior",
    "ScaleHyperprior",
    "MeanScaleHyperprior",
    "JointAutoregressiveHierarchicalPriors",
    "Cheng2020Anchor",
    "Cheng2020Attention",
    "SpatioTemporalPriorModel",
    "SpatioTemporalPriorModelWithoutSPMTPM",
    "SpatioTemporalPriorModelWithoutSPM",
    "SpatioTemporalPriorModelWithoutTPM",
    "SpatioTemporalPriorModelFull",
    "SpatioTemporalPriorModel_Res",
    "STEM_VARIANTS",
    "STEMModule",
    "FactorizedPriorModule",
    "ScaleHyperpriorModule",
    "MeanScaleHyperpriorModule",
    "JointAutoregressiveModule",
    "StemBaseline",
    "StemBaselineV2",
    "StemBaselineModule",
    "StemROI",
    "StemROIModule",
    "StemROIWoGsc",
    "StemROI_I",
    "SpatioTemporalPriorModelChannelAR",
    "ChannelARSTEMModule",
]
