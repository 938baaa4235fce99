"""Point-conditioned 5-level pyramid mask decoder.

Reference: ``AttenDecoder``/``UpDecoderLayer``/``UpAttenLayer``
(``code/lib/archs/modules/attenet2.py:410-493`` and
``code/lib/archs/modules/utils.py:816-1112``).

Given one sampled glimpse point per batch element and the UNet encoder
pyramid (x1..x5 at 1x..1/16x), decodes a full-resolution binary mask for
the instance containing that point, producing 2-class logits at every level
(16^2 .. 256^2) for the pyramid loss.

TPU redesign of the reference's host-side machinery:
  * the glimpse point is a flat on-device int32 index per sample; the
    per-level integer coordinates and the binary sub-pixel position code
    (reference ``resize_p``/``bin``, utils.py:823-836) are bit arithmetic;
  * ``conPosition`` (utils.py:1027-1045) — a python loop writing one pixel
    per sample — becomes a vectorised one-hot outer product;
  * level resizing of gold/attention/semantic masks (utils.py:838-867) is
    max/avg reduce-window pooling, which XLA maps to native TPU ops.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuseg.configs import DecoderConfig
from tpuseg.nn.blocks import Conv1x1BN, InvertedResidual
from tpuseg.nn.heads import L0Head


def point_position_planes(
    point_flat: jnp.ndarray, full_hw: Tuple[int, int], level_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Build the (B, h, w, 2N+1) glimpse-position planes for one level.

    Channel layout matches the reference (utils.py:1027-1036): channels
    0..2N-1 hold the binary code of the sub-pixel offset (row bits then
    col bits, MSB first) written at the level-resolution point pixel;
    channel 2N is the one-hot point indicator.
    """
    H, W = full_hw
    h, w = level_hw
    f = H // h
    n_bits = int(math.log2(f)) if f > 1 else 0
    b = point_flat.shape[0]
    row = point_flat // W
    col = point_flat % W
    row_l, col_l = row // f, col // f
    row_r, col_r = row % f, col % f

    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    onehot = (
        (yy[None] == row_l[:, None, None]) & (xx[None] == col_l[:, None, None])
    ).astype(jnp.float32)  # (B, h, w)

    vals = []
    for t in range(n_bits):
        vals.append(((row_r >> (n_bits - 1 - t)) & 1).astype(jnp.float32))
    for t in range(n_bits):
        vals.append(((col_r >> (n_bits - 1 - t)) & 1).astype(jnp.float32))
    vals.append(jnp.ones((b,), jnp.float32))
    code = jnp.stack(vals, axis=-1)  # (B, 2N+1)
    return onehot[..., None] * code[:, None, None, :]


def _maxpool(x: jnp.ndarray, f: int) -> jnp.ndarray:
    if f == 1:
        return x
    return nn.max_pool(x, (f, f), strides=(f, f))


def _avgpool(x: jnp.ndarray, f: int) -> jnp.ndarray:
    if f == 1:
        return x
    return nn.avg_pool(x, (f, f), strides=(f, f))


def _prev_mask_gate(pred_logits_prev: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Reference ``UpAttenLayer.Mask`` (utils.py:1047-1056): bilinear-resize
    the previous level's 2-class logits to this level and take the softmax
    foreground probability."""
    b = pred_logits_prev.shape[0]
    m = jax.image.resize(
        pred_logits_prev, (b, hw[0], hw[1], 2), method="bilinear"
    )
    return jax.nn.softmax(m, axis=-1)[..., 1:2]


class _UpAttenLevel(nn.Module):
    """One pyramid level (reference ``UpAttenLayer``, utils.py:946-1112)."""

    out_ch: int
    factor: int
    is_first: bool = False
    use_mask: bool = True
    drop_rate: float = 0.5
    position_type: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_prev, x_skip, point_flat, mask_pre, mask_all, train: bool):
        b, h, w, _ = x_skip.shape
        full = (h * self.factor, w * self.factor)
        n_extra = (2 * int(math.log2(self.factor)) if self.position_type else 0) + (
            2 if self.use_mask else 0
        )

        def dropout(z):
            return nn.Dropout(
                rate=self.drop_rate, broadcast_dims=(1, 2),
                deterministic=not train,
            )(z)

        if self.is_first:
            y = InvertedResidual(self.out_ch, dtype=self.dtype)(x_skip, train)
            y = dropout(y)
            y = InvertedResidual(self.out_ch - n_extra, dtype=self.dtype)(y, train)
            x = y
            x1u = None
        else:
            x1u = nn.ConvTranspose(
                self.out_ch, (2, 2), strides=(2, 2), dtype=self.dtype
            )(x_prev)
            gate = 1.0 if mask_pre is None else _prev_mask_gate(mask_pre, (h, w))
            x1m = x1u * gate
            y = InvertedResidual(self.out_ch, dtype=self.dtype)(x_skip, train)
            y = dropout(y)
            y = InvertedResidual(self.out_ch - n_extra, dtype=self.dtype)(y, train)
            x = jnp.concatenate([y, x1m], axis=-1)

        if mask_all is not None:
            x = jnp.concatenate([x, mask_all], axis=-1)
        pos = point_position_planes(point_flat, full, (h, w))
        x = jnp.concatenate([x, pos.astype(x.dtype)], axis=-1)
        x = Conv1x1BN(self.out_ch, dtype=self.dtype)(x, train)
        x = dropout(x)
        x = InvertedResidual(self.out_ch, dtype=self.dtype)(x, train)
        x = InvertedResidual(self.out_ch, dtype=self.dtype)(x, train)
        if not self.is_first:
            x = x + x1u
        x = dropout(x)
        x = InvertedResidual(self.out_ch, dtype=self.dtype)(x, train)
        x = InvertedResidual(self.out_ch, dtype=self.dtype)(x, train)
        return x


class AttenDecoder(nn.Module):
    """Full 5-level decoder (reference ``AttenDecoder``, attenet2.py:410-473).

    Args to ``__call__``:
      point_flat: (B,) int32 flat indices into the full-resolution H*W grid.
      feats: UNet skips (x1..x5), resolutions 1x..1/16x.
      sem_mask: (B, H, W, 1) semantic foreground mask.
      gold: (B, H, W, 1) this instance's ground-truth mask (None at pure
        inference — pyramid targets are then returned as None).
      anchorpro: (B, H, W, 1) merged attention map (stop-gradient'd by the
        caller, cf. attenet2.py:391).

    Returns (targets, preds): 5 per-level gold masks (or Nones) and 5
    per-level 2-class logits, coarse->fine.
    """

    cfg: DecoderConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, point_flat, feats, sem_mask, gold=None, anchorpro=None,
        train: bool = False,
    ) -> Tuple[List[Optional[jnp.ndarray]], List[jnp.ndarray]]:
        x1, x2, x3, x4, x5 = feats
        H = x1.shape[1]
        skips = [x5, x4, x3, x2, x1]
        out_chs = [
            x4.shape[-1],      # 256
            x3.shape[-1],      # 128
            x2.shape[-1],      # 64
            x1.shape[-1],      # 32
            x1.shape[-1],      # 32 (last level keeps 32, attenet2.py:418)
        ]
        preds: List[jnp.ndarray] = []
        targets: List[Optional[jnp.ndarray]] = []
        x = None
        prev_pred = None
        for i, (skip, oc) in enumerate(zip(skips, out_chs)):
            f = H // skip.shape[1]
            gold_l = _maxpool(gold, f) if gold is not None else None
            mask_all_l = _maxpool(sem_mask, f)
            x = _UpAttenLevel(
                out_ch=oc,
                factor=f,
                is_first=(i == 0),
                use_mask=self.cfg.use_mask,
                drop_rate=self.cfg.drop_rate,
                position_type=self.cfg.position_type,
                dtype=self.dtype,
                name=f"up_atten{i}",
            )(x, skip, point_flat, prev_pred, mask_all_l, train)
            pred_l = L0Head(dtype=self.dtype, name=f"pred{i}")(x)
            preds.append(pred_l)
            targets.append(gold_l)
            prev_pred = pred_l
        return targets, preds
