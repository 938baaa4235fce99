"""CoordConv (Liu et al. 2018) — NHWC flax ports.

Reference: ``code/lib/archs/modules/coord_conv.py`` — ``AddCoordinates``
(:6-67), ``CoordConv`` (:70-117), ``CoordConvTranspose`` (:120-171).  The
``CoordConvNet`` retrofit wrapper (:174-260) maps to
``add_coordinates``-wrapping at call sites in functional JAX; the zero-pad
weight surgery it performs is a torch-module mutation with no JAX
equivalent needed.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp


def add_coordinates(x: jnp.ndarray, with_r: bool = False) -> jnp.ndarray:
    """Concatenate y/x (and optionally r) coordinate planes.

    y/x are scaled to [-1, 1] (origin at center), r is the euclidean
    distance from center scaled to [0, 1] (coord_conv.py:43-67).
    NHWC: planes are prepended on the channel axis, matching the
    reference's channel ordering (coords first).
    """
    b, h, w, _ = x.shape
    y = 2.0 * jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) / (h - 1.0) - 1.0
    xc = 2.0 * jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) / (w - 1.0) - 1.0
    planes = [y, xc]
    if with_r:
        r = jnp.sqrt(y**2 + xc**2)
        planes.append(r / jnp.max(r))
    coords = jnp.stack(planes, axis=-1)[None].astype(x.dtype)
    coords = jnp.broadcast_to(coords, (b, h, w, coords.shape[-1]))
    return jnp.concatenate([coords, x], axis=-1)


class CoordConv(nn.Module):
    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    with_r: bool = False
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        ks = (k, k) if isinstance(k, int) else k
        x = add_coordinates(x, self.with_r)
        return nn.Conv(
            self.features, ks, strides=self.stride, padding=self.padding,
            kernel_dilation=self.dilation, use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)


class CoordConvTranspose(nn.Module):
    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: int = 2
    with_r: bool = False
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        ks = (k, k) if isinstance(k, int) else k
        x = add_coordinates(x, self.with_r)
        return nn.ConvTranspose(
            self.features, ks, strides=(self.stride, self.stride),
            use_bias=self.use_bias, dtype=self.dtype,
        )(x)
