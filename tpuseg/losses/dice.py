"""Soft-Dice losses.

Pure-jnp re-derivations of the reference formulas
(``code/lib/losses/dice.py:10-85`` and ``code/lib/losses/multi_loss.py:58-75``),
vectorised over batch and class; no device-placement side effects.

Layout convention: logits/targets are ``(B, H, W, C)`` (NHWC).  The reference
uses NCHW; only the reduction axes change.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import jax


def dice_coefficient(
    logits: jnp.ndarray,
    target_onehot: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    smooth: float = 1.0,
    time: int = 2,
    map_weight=0,
) -> jnp.ndarray:
    """Per-class soft Dice of softmax(logits) against a one-hot target.

    Mirrors reference ``dice.py:10-51``:
      * ``time=2``: denominator uses p^2 and g^2;
      * ``time=1``: denominator uses p and g;
      * ``map_weight``: per-pixel weight applied as ``(w + 1)`` to every term;
      * ``mask``: multiplicative per-pixel mask on every term.

    Args:
      logits: (B, H, W, C) unnormalised class scores.
      target_onehot: (B, H, W, C) one-hot ground truth in {0, 1}.
      mask: optional broadcastable per-pixel mask.
      smooth: additive smoothing (> 0).
      time: 1 or 2 (denominator power).
      map_weight: scalar 0 or per-pixel weights broadcastable to logits.

    Returns:
      (B, C) dice coefficients in [0, 1].
    """
    probs = jax.nn.softmax(logits, axis=-1)
    tgt = target_onehot.astype(probs.dtype)
    w = map_weight + 1

    num = probs * tgt * w
    den1 = (probs * w) if time == 1 else (probs * probs * w)
    den2 = (tgt * w) if time == 1 else (tgt * tgt * w)
    if mask is not None:
        num = num * mask
        den1 = den1 * mask
        den2 = den2 * mask

    axes = (1, 2)
    num = jnp.sum(num, axis=axes)
    den1 = jnp.sum(den1, axis=axes)
    den2 = jnp.sum(den2, axis=axes)
    return (2.0 * num + smooth) / (den1 + den2 + smooth)


def dice_loss(
    logits: jnp.ndarray,
    target_onehot: jnp.ndarray,
    optimize_bg: bool = False,
    weight: Optional[jnp.ndarray] = None,
    smooth: float = 1.0,
    size_average: bool = True,
    reduce: bool = True,
    mask: Optional[jnp.ndarray] = None,
    time: int = 2,
    map_weight=0,
) -> jnp.ndarray:
    """1 - mean foreground Dice. Mirrors reference ``dice.py:54-85``.

    With ``optimize_bg=False`` class 0 is excluded before the mean; class
    weights are renormalised to mean 1 over the kept classes.
    Returns per-sample (B,) if ``reduce=False``, else a scalar
    (mean if ``size_average`` else sum).
    """
    dice = dice_coefficient(
        logits, target_onehot, mask=mask, smooth=smooth, time=time,
        map_weight=map_weight,
    )
    if not optimize_bg:
        dice = dice[:, 1:]
    if weight is not None:
        weight = jnp.asarray(weight, dice.dtype)
        if not optimize_bg:
            weight = weight[1:]
        weight = weight.shape[0] * weight / jnp.sum(weight)
        dice = dice * weight
    loss = 1.0 - jnp.mean(dice, axis=1)
    if not reduce:
        return loss
    return jnp.mean(loss) if size_average else jnp.sum(loss)


def instance_dice_loss(
    probs: jnp.ndarray, target: jnp.ndarray, smooth: float = 1.0
) -> jnp.ndarray:
    """Flat per-instance Dice on probabilities (reference ``multi_loss.py:58-75``).

    ``(1 - dice) * sum(target)`` per row — zero-area instances contribute 0.

    Args:
      probs: (N, ...) predicted probabilities.
      target: (N, ...) binary targets.
    Returns:
      (N,) losses.
    """
    n = target.shape[0]
    p = probs.reshape(n, -1)
    t = target.reshape(n, -1).astype(p.dtype)
    inter = jnp.sum(p * t, axis=1)
    area = jnp.sum(t, axis=1)
    dice = 2.0 * (inter + smooth) / (jnp.sum(p, axis=1) + area + smooth)
    return (1.0 - dice) * area
