"""Dormant PN (positive/negative point) losses of the glimpse decoder.

Reference: ``PNloss``/``PNloss2``/``PNloss3``
(``code/lib/archs/modules/attenet2.py:182-237``) — experimental attention
point-supervision terms, computed but disabled in the live loss
(attenet2.py:280-286 commented).  Provided as tested pure functions.

``PNloss2`` (attenet2.py:211-224) is deliberately NOT ported: it calls
``self.pnloss`` which is never defined anywhere in the reference, so the
function raises ``AttributeError`` on any invocation — dead-by-crash, not
merely dormant.  ``PNloss``'s internal ``pnloss2`` term is likewise
multiplied by ``0`` at attenet2.py:199 and is omitted here for the same
reason.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-7


def pn_loss(
    pred: jnp.ndarray,      # (B, HW) roi predictions
    advance: jnp.ndarray,   # (B, HW) advantage weights
    alpha: jnp.ndarray,     # (B, HW) attention distribution
    evaline: jnp.ndarray,   # (B, 1) per-instance uniform level
    gold: jnp.ndarray,      # (B, HW) instance mask
    focal_gamma: float = 2.0,
) -> jnp.ndarray:
    """attenet2.py:182-202 (effective branch): softmax(pred*alpha)
    log-weighted by the advantage, plus a focal +/- term gated by
    alpha>evaline (weight 0 in the reference's final sum, kept for
    completeness)."""
    b = alpha.shape[0]
    gold = gold.reshape(b, -1)
    alpha = alpha.reshape(b, -1)
    p = jax.nn.softmax(pred * alpha, axis=1)
    p = jnp.log(jnp.clip(p, _EPS, 1 - _EPS))
    pnloss1 = -p * advance
    return jnp.sum(pnloss1, axis=1) / b


def pn_loss3(
    alpha_maxidx: jnp.ndarray,  # (B, H, W, 1) one-hot argmax of alpha
    pro: jnp.ndarray,           # (B, H, W, 1) raw merged attention map
    alpha: jnp.ndarray,         # (B, H, W, 1) instance attention map
    evaline: jnp.ndarray,       # (B,) 1/|instance|
    gold: jnp.ndarray,          # (B, H, W, 1) instance mask
) -> jnp.ndarray:
    """attenet2.py:227-237: hinge on the attention peak + sum of positive
    raw scores at under-attended gold pixels."""
    b = pro.shape[0]
    p = jnp.sum((pro * alpha_maxidx).reshape(b, -1), axis=1)
    ploss = jax.nn.relu(-p)
    npoint = (alpha < evaline[:, None, None, None]).astype(pro.dtype) * gold
    n_count = jnp.maximum(jnp.sum(npoint.reshape(b, -1), axis=1), 1.0)
    nloss = jnp.sum(jax.nn.relu(pro * npoint).reshape(b, -1), axis=1)
    return ploss + nloss / n_count
