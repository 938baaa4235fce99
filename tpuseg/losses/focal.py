"""Focal / BCE / CE losses (reference ``code/lib/losses/multi_loss.py:21-56``)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_EPS = 1e-7


def focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma: float = 2.0,
    alpha: float = 0.0,
    map_weight=0,
) -> jnp.ndarray:
    """Two-class focal loss on flattened pixels.

    Mirrors reference ``multi_loss.py:27-42``: softmax over the last axis,
    a *detached* pt factor, per-class alpha asymmetry ``(1-alpha)`` on the
    positive term and ``(1+alpha)`` on the negative term, and a
    ``(map_weight+1)`` per-pixel multiplier.

    Args:
      logits: (L, 2) class scores.
      targets: (L,) binary {0,1} labels.
    Returns:
      (L,) per-pixel losses (no reduction).
    """
    t = targets.astype(logits.dtype)
    p = jax.nn.softmax(logits, axis=1)
    pt = jax.lax.stop_gradient(p)
    p = jnp.clip(p, _EPS, 1.0 - _EPS)
    w = map_weight + 1
    loss_1 = -(1.0 - alpha) * (1.0 - pt[:, 1]) ** gamma * jnp.log(p[:, 1]) * t * w
    loss_0 = -(1.0 + alpha) * (1.0 - pt[:, 0]) ** gamma * jnp.log(p[:, 0]) * (1.0 - t) * w
    return loss_1 + loss_0


def bce_loss(
    pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Masked BCE summed per sample (reference ``multi_loss.py:44-56``).

    Note: like the reference, returns the *log-likelihood* sum (negative
    loss); callers negate as needed.
    """
    n = target.shape[0]
    p = jnp.clip(pred.reshape(n, -1), _EPS, 1.0 - _EPS)
    t = target.reshape(n, -1).astype(p.dtype)
    m = mask.reshape(n, -1).astype(p.dtype)
    ll = t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p)
    return jnp.sum(ll * m, axis=1)


def softmax_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean CE over flattened pixels — torch ``CrossEntropyLoss`` semantics
    (weighted mean = sum(w_y * ce) / sum(w_y)).

    Args:
      logits: (L, C); labels: (L,) int.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=1)[:, 0]
    if class_weights is None:
        return jnp.mean(ce)
    w = jnp.asarray(class_weights, logits.dtype)[labels]
    return jnp.sum(w * ce) / jnp.sum(w)
