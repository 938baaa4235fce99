from tpuseg.nn.blocks import (
    ConvBN,
    Conv1x1BN,
    InvertedV1Residual,
    InvertedResidual,
    MobileV1ASPP,
    DoubleConv,
)
from tpuseg.nn.unet import UNet
from tpuseg.nn.attention import (
    SqueezeExcite,
    ChannelAttention,
    SpatialAttention,
    HardAttention,
    MaskedBatchNorm,
)
from tpuseg.nn.heads import L0Head

__all__ = [
    "ConvBN",
    "Conv1x1BN",
    "InvertedV1Residual",
    "InvertedResidual",
    "MobileV1ASPP",
    "DoubleConv",
    "UNet",
    "SqueezeExcite",
    "ChannelAttention",
    "SpatialAttention",
    "HardAttention",
    "MaskedBatchNorm",
    "L0Head",
]
