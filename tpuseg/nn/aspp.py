"""DenseASPP blocks and the dilated MobileNetV2 feature extractor.

Reference: ``code/lib/archs/modules/MobileNetDenseASPP.py`` —
``DilatedMobileNetV2`` (:125-171), ``DenseASPP`` wrapper (:7-49),
``_DenseAsppBlock`` (:174-198) — and the masked ASPP ``Encoder`` stack
from ``modules/utils.py:15-46`` used by the legacy atteNet.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tpuseg.nn.blocks import ConvBN, Conv1x1BN, InvertedResidual


def _instance_norm(x, name=None):
    # torch InstanceNorm2d default: affine=False (the reference relies on
    # the default in its ASPP blocks, utils.py:354,359)
    return nn.GroupNorm(
        num_groups=None, group_size=1, use_bias=False, use_scale=False,
        name=name,
    )(x)


class DenseAsppBlock(nn.Module):
    """InstanceNorm -> ReLU -> 1x1 -> InstanceNorm -> ReLU -> dilated 3x3
    (+ channel dropout).  Reference ``_DenseAsppBlock``
    (utils.py:348-372)."""

    num1: int
    num2: int
    dilation_rate: int
    drop_out: float = 0.1
    norm_start: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.norm_start:
            x = _instance_norm(x, name="norm_1")
        x = nn.relu(x)
        x = nn.Conv(self.num1, (1, 1), dtype=self.dtype, name="conv_1")(x)
        x = _instance_norm(x, name="norm_2")
        x = nn.relu(x)
        x = nn.Conv(
            self.num2, (3, 3), kernel_dilation=self.dilation_rate,
            padding=self.dilation_rate, dtype=self.dtype, name="conv_2",
        )(x)
        if self.drop_out > 0:
            x = nn.Dropout(
                self.drop_out, broadcast_dims=(1, 2), deterministic=not train
            )(x)
        return x


class MaskedAsppEncoder(nn.Module):
    """Masked dense-ASPP feature encoder (reference ``Encoder``,
    utils.py:15-46): each block sees the running concat masked by the fg
    mask; a dropout + 1x1 head projects back to d_model."""

    d_model: int
    aspp_rates: Sequence[int]
    d_features0: int = 20
    d_features1: int = 10
    dropout0: float = 0.1
    dropout1: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        features = x
        for i, rate in enumerate(self.aspp_rates):
            features = features * mask
            aspp = DenseAsppBlock(
                num1=self.d_features0, num2=self.d_features1,
                dilation_rate=rate, drop_out=self.dropout0,
                norm_start=(i != 0), dtype=self.dtype, name=f"aspp{i}",
            )(features, train)
            features = jnp.concatenate([aspp, features], axis=-1)
        features = features * mask
        features = nn.Dropout(
            self.dropout1, broadcast_dims=(1, 2), deterministic=not train
        )(features)
        return nn.Conv(self.d_model, (1, 1), dtype=self.dtype, name="last")(
            features
        )


class DilatedMobileNetV2(nn.Module):
    """Reference ``DilatedMobileNetV2`` (MobileNetDenseASPP.py:125-171):
    inverted-residual stages with output-stride-controlled dilation,
    emitting features after stages 3, 10, 16 and the final 1x1.
    """

    width_mult: float = 1.0
    output_stride: int = 8
    last_channel: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        scale = self.output_stride
        settings = [
            # t, c, n, s, dilate
            (1, 16, 1, 1, 1),
            (6, 24, 2, 1, 1),
            (6, 32, 3, 2, 1),
            (6, 64, 4, int(scale), max(int(2 / scale), 1)),
            (6, 96, 3, 2, max(int(2 / scale), 1)),
            (6, 160, 3, 1, max(int(2 / scale), 1)),
            (6, 320, 1, 2, max(int(2 / scale), 1)),
        ]
        taps = {3, 10, 16}
        outs: List[jnp.ndarray] = []
        x = ConvBN(int(32 * self.width_mult), stride=1, dtype=self.dtype)(
            x, train
        )
        idx = 1
        for t, c, n, s, dilate in settings:
            oc = int(c * self.width_mult)
            for i in range(n):
                x = InvertedResidual(
                    oc, stride=(s if i == 0 else 1), expand_ratio=t,
                    dilation=dilate, dtype=self.dtype,
                )(x, train)
                if idx in taps:
                    outs.append(x)
                idx += 1
        x = Conv1x1BN(self.last_channel, dtype=self.dtype)(x, train)
        outs.append(x)
        return outs


class DenseASPP(nn.Module):
    """Multi-scale feature wrapper (reference MobileNetDenseASPP.py:7-49)."""

    output_stride: int = 8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return DilatedMobileNetV2(
            output_stride=self.output_stride, dtype=self.dtype,
            name="features",
        )(x, train)
