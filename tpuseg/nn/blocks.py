"""Depthwise-separable building blocks (NHWC, flax.linen).

TPU-native re-design of the reference's MobileNet-style blocks
(``code/lib/archs/modules/MobileNetDenseASPP.py:52-123``): NHWC layout so XLA
tiles channels onto the 128-lane VPU/MXU, optional bfloat16 compute dtype,
BatchNorm with mutable ``batch_stats`` (cross-replica axis handled by the
caller's ``axis_name``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


class _BN(nn.Module):
    """BatchNorm matching torch defaults (eps 1e-5, momentum 0.1)."""

    dtype: Optional[jnp.dtype] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
        )(x)


class ConvBN(nn.Module):
    """3x3 conv + BN + ReLU (reference ``conv_bn``, MobileNetDenseASPP.py:52-57)."""

    features: int
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, (3, 3), strides=self.stride, padding=1,
            use_bias=False, dtype=self.dtype,
        )(x)
        x = _BN(dtype=self.dtype)(x, train)
        return nn.relu(x)


class Conv1x1BN(nn.Module):
    """1x1 conv + BN + ReLU (reference ``conv_1x1_bn``, MobileNetDenseASPP.py:60-65)."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        x = _BN(dtype=self.dtype)(x, train)
        return nn.relu(x)


class InvertedV1Residual(nn.Module):
    """Depthwise-separable block: dw3x3 -> BN -> ReLU6 -> pw1x1 -> BN.

    Residual connection when stride==1 and channels match.  Reference
    ``MobileNetDenseASPP.py:68-93`` (``expand_ratio`` is accepted but unused
    there too).
    """

    features: int
    stride: int = 1
    dilation: int = 1
    with_relu: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        use_res = self.stride == 1 and inp == self.features
        y = nn.Conv(
            inp, (3, 3), strides=self.stride, padding=self.dilation,
            kernel_dilation=self.dilation, feature_group_count=inp,
            use_bias=False, dtype=self.dtype,
        )(x)
        y = _BN(dtype=self.dtype)(y, train)
        y = relu6(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = _BN(dtype=self.dtype)(y, train)
        if self.with_relu:
            y = relu6(y)
        return x + y if use_res else y


class InvertedResidual(nn.Module):
    """MobileNetV2 block: pw-expand -> dw -> pw-linear, each with BN.

    Reference ``MobileNetDenseASPP.py:96-123``.
    """

    features: int
    stride: int = 1
    expand_ratio: int = 2
    dilation: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        hidden = inp * self.expand_ratio
        use_res = self.stride == 1 and inp == self.features
        y = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = _BN(dtype=self.dtype)(y, train)
        y = relu6(y)
        y = nn.Conv(
            hidden, (3, 3), strides=self.stride, padding=self.dilation,
            kernel_dilation=self.dilation, feature_group_count=hidden,
            use_bias=False, dtype=self.dtype,
        )(y)
        y = _BN(dtype=self.dtype)(y, train)
        y = relu6(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = _BN(dtype=self.dtype)(y, train)
        return x + y if use_res else y


class MobileV1ASPP(nn.Module):
    """pw-expand -> dw(dilated) -> pw-linear (reference ``modules/utils.py:665-694``)."""

    features: int
    stride: int = 1
    dilation: int = 1
    expand_ratio: int = 2
    with_relu: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        hidden = inp * self.expand_ratio
        use_res = self.stride == 1 and inp == self.features
        y = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = _BN(dtype=self.dtype)(y, train)
        y = relu6(y)
        y = nn.Conv(
            hidden, (3, 3), strides=self.stride, padding=self.dilation,
            kernel_dilation=self.dilation, feature_group_count=hidden,
            use_bias=False, dtype=self.dtype,
        )(y)
        y = _BN(dtype=self.dtype)(y, train)
        y = relu6(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = _BN(dtype=self.dtype)(y, train)
        if self.with_relu:
            y = relu6(y)
        return x + y if use_res else y


class DoubleConv(nn.Module):
    """Two chained InvertedV1Residual blocks (reference
    ``unet/unet_parts.py:7-27`` ``double_conv``)."""

    features: int
    dilation_rates: Sequence[int] = (1, 1)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for rate in self.dilation_rates:
            x = InvertedV1Residual(
                self.features, stride=1, dilation=rate, dtype=self.dtype
            )(x, train)
        return x
