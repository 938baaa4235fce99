"""Legacy v1 attention decoder (atteNet / DecoderPipline) — made to work.

Reference: ``code/lib/archs/modules/attenet.py:9-157`` — the pre-pyramid
instance decoder: a masked ASPP encoder, a DQN-selected glimpse per
iteration, a correlation decoder (``Decoder``/``MultiHeadAttention``
last-branch: sigmoid(feature . encoding)) producing a full-res mask, a
focal+dice loss with IoU reward pushed to the DQN replay buffer, and
``removeSeled`` shrinking the remaining foreground.

The reference version is dead code — it references the undefined
``config.FocalWeight`` (attenet.py:90) and crashes.  This port fixes that
(weight configurable, default the CEWeight=10 the successor uses) and
replaces the dynamic batch ``compress`` (attenet.py:98-100,152) with done
masking — fixed shapes, scan-friendly.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuseg.configs import DecoderConfig
from tpuseg.losses.dice import instance_dice_loss
from tpuseg.losses.focal import focal_loss
from tpuseg.nn.aspp import MaskedAsppEncoder


class CorrelationDecoder(nn.Module):
    """sigmoid(selected_feature . encoded_map) mask decoder (reference
    ``Decoder``, utils.py:49-69 effective path)."""

    @nn.compact
    def __call__(self, selected, encode):
        """selected: (B, C); encode: (B, H, W, C) -> (B, H*W) in (0,1)."""
        b, h, w, c = encode.shape
        corr = jnp.einsum("bc,bhwc->bhw", selected, encode).reshape(b, h * w)
        return jax.nn.sigmoid(corr)


class AtteNetLegacy(nn.Module):
    """Encoder + iterative select/decode loss (attenet.py:21-29,114-157)."""

    cfg: DecoderConfig
    aspp_rates: Sequence[int] = (3, 6, 12)
    focal_weight: float = 10.0  # config.FocalWeight is undefined upstream
    max_iter: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, features, mask, ins_seg, q_fn=None, train: bool = False):
        """features: (B, H, W, C); mask: (B, H, W, 1) fg mask; ins_seg:
        (B, H, W, N) instance stack; q_fn: optional callable
        (encode, flat_mask) -> (B, H*W) Q-values (the DQN selector) —
        argmax of the masked encoder norm when None.

        Returns (per-sample loss (B,), transitions dict for the replay
        buffer)."""
        cfg = self.cfg
        b, h, w, _ = features.shape
        n = ins_seg.shape[-1]
        hw = h * w
        encode = MaskedAsppEncoder(
            d_model=cfg.d_model, aspp_rates=self.aspp_rates,
            dtype=self.dtype, name="encoder",
        )(features, mask, train)
        decoder = CorrelationDecoder(name="decoder")
        feat_flat = features.reshape(b, hw, -1)
        ins_flat = ins_seg.reshape(b, hw, n).astype(jnp.float32)

        remaining = mask.reshape(b, hw).astype(jnp.float32)
        mask_sum = jnp.maximum(jnp.sum(remaining, axis=1), 1.0)
        done = jnp.sum(remaining, axis=1) == 0
        loss = jnp.zeros((b,), jnp.float32)
        transitions = []

        for _ in range(self.max_iter):
            # action selection (DQN capability or heuristic argmax)
            if q_fn is not None:
                q = q_fn(encode, remaining)
            else:
                q = jnp.linalg.norm(encode.reshape(b, hw, -1), axis=-1)
            actions = jnp.argmax(jnp.where(remaining > 0, q, -1e30), axis=1)
            sel = jnp.take_along_axis(
                feat_flat, actions[:, None, None], axis=1
            )[:, 0]
            pred = decoder(sel, encode)  # (B, HW)
            # gold = the instance containing the selected pixel
            picked = jnp.take_along_axis(
                ins_flat, actions[:, None, None], axis=1
            )[:, 0]  # (B, N)
            gold_idx = jnp.argmax(picked, axis=1)
            gold = jnp.take_along_axis(
                ins_flat, gold_idx[:, None, None], axis=2
            )[..., 0]  # (B, HW)

            pred_m = pred * remaining
            gold_m = gold * remaining
            f = focal_loss(
                jnp.stack([1 - pred_m, pred_m], -1).reshape(-1, 2) * 20 - 10,
                gold_m.reshape(-1), gamma=cfg.focal_gamma,
            ).reshape(b, hw).mean(axis=1)
            d = instance_dice_loss(pred_m, gold_m)
            step_loss = self.focal_weight * f + d

            pred_bin = (pred_m > 0.5).astype(jnp.float32)
            inter = jnp.sum(pred_bin * gold_m, axis=1)
            iou = 2 * inter / jnp.maximum(
                jnp.sum(gold_m, axis=1) + jnp.sum(pred_bin, axis=1), 1.0
            )
            new_remaining = remaining - remaining * (gold > 0.5)
            pred_sum = jnp.sum(remaining * (gold > 0.5), axis=1)

            active = jnp.logical_not(done).astype(jnp.float32)
            loss = loss + active * step_loss * pred_sum
            transitions.append(
                {
                    "action": actions,
                    "reward": jax.lax.stop_gradient(iou),
                    "mask": remaining,
                    "next_mask": new_remaining,
                    "done": done,
                }
            )
            done = done | (jnp.sum(new_remaining, axis=1) == 0)
            remaining = new_remaining

        return loss / mask_sum, transitions
