from tpuseg.data.colorspace import (
    expand21,
    image_ex_standardize,
    rgb2lab,
    rgb2hsv,
    rgb2yuv,
    rgb2ycbcr,
    rgb2hed,
    rgb2yiq,
)

__all__ = [
    "expand21",
    "image_ex_standardize",
    "rgb2lab",
    "rgb2hsv",
    "rgb2yuv",
    "rgb2ycbcr",
    "rgb2hed",
    "rgb2yiq",
]
