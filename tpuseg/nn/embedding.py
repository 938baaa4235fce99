"""Distance-map positional embedding (reference ``Embedding``/``CalPosition``,
``modules/utils.py:777-814``).

``cal_position`` builds per-sample |row-dist|,|col-dist| planes to the glimpse
point; ``Embedding`` pads them to d_model channels and adds them to the
feature map scaled by a learned sigma head.  The reference allocates its
coordinate grids on CUDA at import time (utils.py:11-13); here they are
traced constants.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def cal_position(shape_hw: Tuple[int, int], points: jnp.ndarray) -> jnp.ndarray:
    """points: (B, 2) int (row, col). Returns (B, H, W, 2) absolute
    row/col distance planes (channel order col,row as the reference's
    position_all concat, utils.py:811-814)."""
    h, w = shape_hw
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    pr = points[:, 0].astype(jnp.float32)[:, None, None]
    pc = points[:, 1].astype(jnp.float32)[:, None, None]
    dist_r = jnp.abs(rows[None] - pr)
    dist_c = jnp.abs(cols[None] - pc)
    return jnp.stack([dist_c, dist_r], axis=-1)


class Embedding(nn.Module):
    """Adds the (stop-gradient) distance planes, zero-padded to d_model
    channels, scaled by a sigma MLP of the glimpse feature h."""

    d_model: int
    reduction: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, o_map, points, h):
        b, hh, ww, c = o_map.shape
        fi = jax.lax.stop_gradient(cal_position((hh, ww), points))
        fi = jnp.pad(fi, ((0, 0), (0, 0), (0, 0), (0, self.d_model - 2)))
        sigma = nn.Dense(self.d_model // self.reduction, dtype=self.dtype)(h)
        sigma = jnp.tanh(sigma)
        sigma = nn.Dense(1, dtype=self.dtype)(sigma)
        sigma = jax.nn.sigmoid(sigma).reshape(-1, 1, 1, 1)
        return o_map + fi.astype(o_map.dtype) * sigma * 2.0
