"""DCGAN-style mask decoder for the WAE capability.

Reference: ``code/lib/archs/modules/dcgan_decoder.py:5-51`` — latent ->
linear -> ConvTranspose(5x5, stride 2) stack with instance norm -> sigmoid
mask.  Consumed by ``MatchLoss`` (reference ``dice.py:248-333``), which is
provided functionally by ``tpuseg.losses.mmd`` + ``wae.py``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class DcganDecoder(nn.Module):
    coding: int = 24
    num_units: int = 64
    num_layers: int = 3
    out_shape: Tuple[int, int, int] = (64, 64, 1)  # (H, W, C)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, z):
        """z: (B, coding) -> (B, H, W) mask in (0, 1) (C squeezed when 1)."""
        h0 = self.out_shape[0] // 2 ** (self.num_layers - 1)
        w0 = self.out_shape[1] // 2 ** (self.num_layers - 1)
        x = nn.Dense(self.num_units * h0 * w0, dtype=self.dtype)(z)
        x = x.reshape(-1, h0, w0, self.num_units)
        x = nn.relu(x)
        units = self.num_units
        for _ in range(self.num_layers - 1):
            x = nn.ConvTranspose(
                units // 2, (5, 5), strides=(2, 2), dtype=self.dtype
            )(x)
            x = nn.GroupNorm(
                num_groups=None, group_size=1, use_bias=True, use_scale=True
            )(x)  # InstanceNorm(affine=True)
            x = nn.relu(x)
            units //= 2
        x = nn.ConvTranspose(
            self.out_shape[2], (5, 5), strides=(1, 1), dtype=self.dtype
        )(x)
        x = jax.nn.sigmoid(x)
        if self.out_shape[2] == 1:
            x = x[..., 0]
        return x
