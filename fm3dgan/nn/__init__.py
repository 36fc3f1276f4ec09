from fm3dgan.nn.layers import (
    Blur,
    ConvLayer,
    Downsample,
    EqualConv2d,
    EqualLinear,
    FusedLeakyReLU,
    PixelNorm,
    ResBlock,
    ScaledLeakyReLU,
    Upsample,
    minibatch_stddev,
)
from fm3dgan.nn.modulated import (
    ConstantInput,
    ModulatedConv2d,
    NoiseInjection,
    StyledConv,
    ToRGB,
)

__all__ = [
    "Blur",
    "ConvLayer",
    "Downsample",
    "EqualConv2d",
    "EqualLinear",
    "FusedLeakyReLU",
    "PixelNorm",
    "ResBlock",
    "ScaledLeakyReLU",
    "Upsample",
    "minibatch_stddev",
    "ConstantInput",
    "ModulatedConv2d",
    "NoiseInjection",
    "StyledConv",
    "ToRGB",
]
