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
from tpuseg.nn.aspp import (
    DenseASPP,
    DenseAsppBlock,
    DilatedMobileNetV2,
    MaskedAsppEncoder,
)
from tpuseg.nn.coord_conv import (
    CoordConv,
    CoordConvNet,
    CoordConvTranspose,
    add_coordinates,
    retrofit_coordconv_params,
)
from tpuseg.nn.conv_gru import ConvGRUCell
from tpuseg.nn.hourglass import RecurrentHourglass
from tpuseg.nn.dcgan_decoder import DcganDecoder
from tpuseg.nn.sru import SRU, SRUCell, sru_recurrence
from tpuseg.nn.vgg16 import VGG16, SkipVGG16
from tpuseg.nn.transformer import (
    MultiHeadAttention,
    NonLocalLayer,
    PositionwiseFeedForward,
    ScalePDAttention,
    ScaledDotProductAttention,
    TransformerDecoderLayer,
    make_position_encoding,
)

__all__ = [
    "DenseASPP",
    "DenseAsppBlock",
    "DilatedMobileNetV2",
    "MaskedAsppEncoder",
    "CoordConv",
    "CoordConvTranspose",
    "add_coordinates",
    "CoordConvNet",
    "retrofit_coordconv_params",
    "ConvGRUCell",
    "RecurrentHourglass",
    "DcganDecoder",
    "SRU",
    "SRUCell",
    "sru_recurrence",
    "VGG16",
    "SkipVGG16",
    "MultiHeadAttention",
    "NonLocalLayer",
    "PositionwiseFeedForward",
    "ScalePDAttention",
    "ScaledDotProductAttention",
    "TransformerDecoderLayer",
    "make_position_encoding",
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
