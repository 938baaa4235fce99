"""Convolutional GRU cell (Ballas et al. 2016) — NHWC flax port.

Reference: ``code/lib/archs/modules/conv_gru.py:10-104``: gates from one
conv over [x, h], candidate from a conv over [x, r*h], optional CoordConv.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuseg.nn.coord_conv import CoordConv


class ConvGRUCell(nn.Module):
    hidden_size: int
    kernel_size: int = 3
    use_coordinates: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, hidden=None):
        b, h, w, _ = x.shape
        if hidden is None:
            hidden = jnp.zeros((b, h, w, self.hidden_size), x.dtype)
        pad = self.kernel_size // 2
        if self.use_coordinates:
            conv_gates = CoordConv(
                2 * self.hidden_size, self.kernel_size, padding=pad,
                with_r=True, dtype=self.dtype, name="conv_gates",
            )
            conv_ct = CoordConv(
                self.hidden_size, self.kernel_size, padding=pad, with_r=True,
                dtype=self.dtype, name="conv_ct",
            )
        else:
            conv_gates = nn.Conv(
                2 * self.hidden_size, (self.kernel_size, self.kernel_size),
                padding=pad, dtype=self.dtype, name="conv_gates",
            )
            conv_ct = nn.Conv(
                self.hidden_size, (self.kernel_size, self.kernel_size),
                padding=pad, dtype=self.dtype, name="conv_ct",
            )
        c1 = conv_gates(jnp.concatenate([x, hidden], axis=-1))
        rt, ut = jnp.split(c1, 2, axis=-1)
        reset = jax.nn.sigmoid(rt)
        update = jax.nn.sigmoid(ut)
        ct = jnp.tanh(conv_ct(jnp.concatenate([x, reset * hidden], axis=-1)))
        return update * hidden + (1.0 - update) * ct
