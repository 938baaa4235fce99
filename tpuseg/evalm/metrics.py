"""Vectorised evaluation metrics: SBD, |DiC|, foreground Dice.

Reference: ``code/evaluate.py:18-57``.  The reference computes best-dice
with a python double loop over (gt instance × pred instance), building a
full-image boolean mask per pair — O(G*P*H*W) numpy work.  Here both label
maps are one-hot encoded and all pairwise intersections come from a single
(G, HW) x (HW, P) matmul (MXU work on TPU), followed by row/col max
reductions — identical values, no loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def calc_dic(n_objects_gt, n_objects_pred):
    """|DiC| — absolute count error (``evaluate.py:18-19``)."""
    return jnp.abs(
        jnp.asarray(n_objects_gt, jnp.int32) - jnp.asarray(n_objects_pred, jnp.int32)
    )


def calc_dice(gt_seg: jnp.ndarray, pred_seg: jnp.ndarray) -> jnp.ndarray:
    """Binary-mask Dice (``evaluate.py:22-28``). No smoothing, raw ratio."""
    g = jnp.asarray(gt_seg, jnp.float32)
    p = jnp.asarray(pred_seg, jnp.float32)
    nom = 2.0 * jnp.sum(g * p)
    denom = jnp.sum(g) + jnp.sum(p)
    return nom / denom


@functools.partial(jax.jit, static_argnames=("max_ids",))
def dice_matrix(
    ins_a: jnp.ndarray, ins_b: jnp.ndarray, max_ids: int = 64
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """All-pairs instance Dice via one matmul.

    ins_a/ins_b: (H, W) integer id maps (0 = background; ids need not be
    contiguous).  Returns (D, valid_a, valid_b): D is the (max_ids, max_ids)
    dice matrix over id slots 1..max_ids, valid_* mark ids present.
    """
    ids = jnp.arange(1, max_ids + 1)
    a_flat = ins_a.reshape(-1)
    b_flat = ins_b.reshape(-1)
    # (G, HW) boolean one-hot stacks in f32/bf16 for the MXU.
    a_oh = (a_flat[None, :] == ids[:, None]).astype(jnp.float32)
    b_oh = (b_flat[None, :] == ids[:, None]).astype(jnp.float32)
    inter = a_oh @ b_oh.T  # (G, P)
    area_a = jnp.sum(a_oh, axis=1)
    area_b = jnp.sum(b_oh, axis=1)
    denom = area_a[:, None] + area_b[None, :]
    d = 2.0 * inter / jnp.maximum(denom, 1.0)
    return d, area_a > 0, area_b > 0


def _best_dice(d: jnp.ndarray, valid_rows: jnp.ndarray, valid_cols: jnp.ndarray):
    """Mean over valid rows of the max dice against valid columns
    (``evaluate.py:31-50``).  When either side has no instances the
    reference crashes on ``np.max([])``; here the best dice is defined
    as 0 (worst) instead."""
    d = jnp.where(valid_cols[None, :], d, -jnp.inf)
    row_best = jnp.max(d, axis=1)
    row_best = jnp.where(valid_rows & jnp.isfinite(row_best), row_best, 0.0)
    n = jnp.maximum(jnp.sum(valid_rows), 1)
    return jnp.sum(row_best) / n


@functools.partial(jax.jit, static_argnames=("max_ids",))
def _sbd_jit(ins_gt, ins_pred, max_ids):
    d, vg, vp = dice_matrix(ins_gt, ins_pred, max_ids=max_ids)
    bd1 = _best_dice(d, vg, vp)      # gt -> pred
    bd2 = _best_dice(d.T, vp, vg)    # pred -> gt
    return jnp.minimum(bd1, bd2)


def calc_bd(ins_seg_gt, ins_seg_pred, max_ids: int = 64):
    """Best dice, gt rows vs pred columns (``evaluate.py:31-50``)."""
    d, vg, vp = dice_matrix(
        jnp.asarray(ins_seg_gt), jnp.asarray(ins_seg_pred), max_ids=max_ids
    )
    return _best_dice(d, vg, vp)


def calc_sbd(ins_seg_gt, ins_seg_pred, max_ids: int = 64):
    """Symmetric best dice (``evaluate.py:53-57``)."""
    return _sbd_jit(jnp.asarray(ins_seg_gt), jnp.asarray(ins_seg_pred), max_ids)


def symmetric_best_dice_batch(
    ins_gt: np.ndarray, ins_pred: np.ndarray, max_ids: int = 64
) -> jnp.ndarray:
    """Batched SBD over stacks of id maps: (B, H, W) each -> (B,)."""
    fn = jax.vmap(lambda g, p: _sbd_jit(g, p, max_ids))
    return fn(jnp.asarray(ins_gt), jnp.asarray(ins_pred))


@jax.jit
def fg_dice_batch(fg_gt: jnp.ndarray, fg_pred: jnp.ndarray) -> jnp.ndarray:
    """Batched binary-mask Dice: (B, H, W) each -> (B,)
    (``evaluate.py:22-28`` per image, one fused reduction here)."""
    g = jnp.asarray(fg_gt, jnp.float32).reshape(fg_gt.shape[0], -1)
    p = jnp.asarray(fg_pred, jnp.float32).reshape(fg_pred.shape[0], -1)
    nom = 2.0 * jnp.sum(g * p, axis=1)
    denom = jnp.sum(g, axis=1) + jnp.sum(p, axis=1)
    return nom / denom
