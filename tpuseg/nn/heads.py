"""Per-pyramid-level prediction head.

Reference ``L0Layer`` (``code/lib/archs/modules/utils.py:696-774``):
Conv3x3(c -> c/r) -> LeakyReLU -> Conv3x3(-> 2) producing 2-class mask
logits for one pyramid level, with optional sigmoid/mask.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class L0Head(nn.Module):
    reduction: int = 2
    out_channels: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask=None, use_sigmoid: bool = False):
        c = x.shape[-1]
        y = nn.Conv(c // self.reduction, (3, 3), padding=1, dtype=self.dtype)(x)
        y = nn.leaky_relu(y, negative_slope=0.01)
        y = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype)(y)
        if use_sigmoid:
            y = jax.nn.sigmoid(y)
        if mask is not None:
            y = y * mask
        return y
