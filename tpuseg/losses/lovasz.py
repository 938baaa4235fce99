"""Lovasz-Softmax / Jaccard hinge losses (Berman 2018), jnp re-derivation.

Reference: ``code/lib/losses/lovasz_losses.py``.  Sorting-based; fully
vectorised (no python loops over pixels), jit-safe.  The ``ignore`` label
filtering of the reference (dynamic shapes) is expressed as weighting
instead, which is numerically equivalent for the hinge/xloss variants when
the ignored errors are pushed to the end of the sort.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def lovasz_grad(gt_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovasz extension w.r.t. sorted errors.

    Mirrors ``lovasz_losses.py:18-30``. gt_sorted: (P,) in {0,1} sorted by
    descending error.
    """
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted.astype(jnp.float32), axis=0)
    union = gts + jnp.cumsum(1.0 - gt_sorted.astype(jnp.float32), axis=0)
    jaccard = 1.0 - intersection / union
    if gt_sorted.shape[0] > 1:
        jaccard = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
    return jaccard


def _lovasz_hinge_flat(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    signs = 2.0 * labels.astype(logits.dtype) - 1.0
    errors = 1.0 - logits * signs
    order = jnp.argsort(-errors)
    errors_sorted = errors[order]
    gt_sorted = labels[order]
    grad = lovasz_grad(gt_sorted)
    return jnp.dot(jax.nn.relu(errors_sorted), grad)


def lovasz_hinge(
    logits: jnp.ndarray, labels: jnp.ndarray, per_image: bool = True
) -> jnp.ndarray:
    """Binary Lovasz hinge (``lovasz_losses.py:78-111``).

    logits/labels: (B, H, W) (or any (B, ...)).
    """
    b = logits.shape[0]
    lg = logits.reshape(b, -1)
    lb = labels.reshape(b, -1)
    if per_image:
        return jnp.mean(jax.vmap(_lovasz_hinge_flat)(lg, lb))
    return _lovasz_hinge_flat(lg.reshape(-1), lb.reshape(-1))


def stable_bce_loss(
    logits: jnp.ndarray, targets: jnp.ndarray, reduction: bool = True
) -> jnp.ndarray:
    """Numerically-stable BCE-with-logits (``lovasz_losses.py:129-139``)."""
    neg_abs = -jnp.abs(logits)
    loss = jnp.clip(logits, min=0) - logits * targets.astype(logits.dtype) + jnp.log1p(
        jnp.exp(neg_abs)
    )
    return jnp.mean(loss) if reduction else loss


def binary_xloss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Binary CE via stable BCE (``lovasz_losses.py:141-150``)."""
    return stable_bce_loss(logits.reshape(-1), labels.reshape(-1))


def _lovasz_softmax_flat(
    probas: jnp.ndarray, labels: jnp.ndarray, only_present: bool = False
) -> jnp.ndarray:
    """probas: (P, C); labels: (P,). Mirrors ``lovasz_losses.py:173-196``."""
    c = probas.shape[1]

    def class_loss(ci):
        fg = (labels == ci).astype(probas.dtype)
        errors = jnp.abs(fg - probas[:, ci])
        order = jnp.argsort(-errors)
        errors_sorted = errors[order]
        fg_sorted = fg[order]
        loss = jnp.dot(errors_sorted, lovasz_grad(fg_sorted))
        present = jnp.sum(fg) > 0
        return loss, present

    losses, present = jax.vmap(class_loss)(jnp.arange(c))
    if only_present:
        w = present.astype(probas.dtype)
        return jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.mean(losses)


def lovasz_softmax(
    probas: jnp.ndarray,
    labels: jnp.ndarray,
    only_present: bool = False,
    per_image: bool = False,
) -> jnp.ndarray:
    """Multi-class Lovasz-Softmax (``lovasz_losses.py:156-196``).

    probas: (B, H, W, C) probabilities; labels: (B, H, W) int.
    """
    b, c = probas.shape[0], probas.shape[-1]
    p = probas.reshape(b, -1, c)
    l = labels.reshape(b, -1)
    if per_image:
        return jnp.mean(
            jax.vmap(lambda pp, ll: _lovasz_softmax_flat(pp, ll, only_present))(p, l)
        )
    return _lovasz_softmax_flat(p.reshape(-1, c), l.reshape(-1), only_present)


def iou_binary(
    preds: jnp.ndarray,
    labels: jnp.ndarray,
    empty: float = 1.0,
    per_image: bool = True,
) -> jnp.ndarray:
    """Foreground IoU ×100 (``lovasz_losses.py:33-50``)."""
    if not per_image:
        preds = preds.reshape(1, -1)
        labels = labels.reshape(1, -1)
    b = preds.shape[0]
    p = preds.reshape(b, -1) == 1
    l = labels.reshape(b, -1) == 1
    inter = jnp.sum(p & l, axis=1)
    union = jnp.sum(p | l, axis=1)
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1), empty)
    return 100.0 * jnp.mean(iou)
