"""5-level UNet over depthwise-separable blocks (NHWC).

Reference: ``code/lib/archs/modules/unet/unet_model.py`` and
``unet_parts.py``.  Channel plan 32-64-128-256-512; each ``down`` is a
bilinear 0.5x downsample followed by a DoubleConv producing ``out - in``
channels concatenated with the downsampled input (``unet_parts.py:42-61``);
each ``up`` is a 2x2 stride-2 transposed conv + skip concat + DoubleConv
(``unet_parts.py:64-93``).

TPU notes: torch's ``interpolate(scale=0.5, bilinear, align_corners=False)``
is exactly 2x2 average pooling, which XLA fuses; all shapes are static and
powers of two so every level tiles cleanly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tpuseg.nn.blocks import DoubleConv


def _downsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 0.5x with align_corners=False == 2x2 mean pooling."""
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class _Down(nn.Module):
    out_features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        x_bili = _downsample2x(x)
        y = DoubleConv(self.out_features - inp, dtype=self.dtype)(x_bili, train)
        return jnp.concatenate([y, x_bili], axis=-1), x_bili


class _Up(nn.Module):
    out_features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        inp = x1.shape[-1]
        x1 = nn.ConvTranspose(
            inp // 2, (2, 2), strides=(2, 2), dtype=self.dtype
        )(x1)
        # reference pads when shapes mismatch (unet_parts.py:80-85); with
        # power-of-two static shapes they never do, asserted here.
        assert x1.shape[1:3] == x2.shape[1:3], (x1.shape, x2.shape)
        x = jnp.concatenate([x2, x1], axis=-1)
        return DoubleConv(self.out_features, dtype=self.dtype)(x, train)


class UNet(nn.Module):
    """Returns (x_dec, skips) where skips are the 5 encoder scales.

    With ``use_encode=True`` (reference config.use_encode) skips are
    ``x1..x5`` — the raw encoder outputs at 1x..1/16x resolution with
    channels (32, 64, 128, 256, 512) — consumed by the instance pyramid
    decoder (``unet_model.py:34-38``).
    """

    n_filters: int = 32
    use_encode: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x, train: bool = False
    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
        f = self.n_filters
        x1 = DoubleConv(f, dtype=self.dtype, name="inc")(x, train)
        x2, _ = _Down(2 * f, dtype=self.dtype, name="down1")(x1, train)
        x3, _ = _Down(4 * f, dtype=self.dtype, name="down2")(x2, train)
        x4, _ = _Down(8 * f, dtype=self.dtype, name="down3")(x3, train)
        x5, _ = _Down(16 * f, dtype=self.dtype, name="down4")(x4, train)
        y4 = _Up(8 * f, dtype=self.dtype, name="up1")(x5, x4, train)
        y3 = _Up(4 * f, dtype=self.dtype, name="up2")(y4, x3, train)
        y2 = _Up(2 * f, dtype=self.dtype, name="up3")(y3, x2, train)
        y1 = _Up(f, dtype=self.dtype, name="up4")(y2, x1, train)
        if self.use_encode:
            return y1, (x1, x2, x3, x4, x5)
        return y1, (y1, y2, y3, y4, x5)
