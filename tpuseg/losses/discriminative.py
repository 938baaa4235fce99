"""Discriminative (embedding) instance loss, De Brabandere et al.

Reference: ``code/lib/losses/discriminative.py``.  The reference's per-sample
python loops over ``n_objects`` become masked vectorised reductions over the
padded ``max_n_objects`` axis — fixed shapes, jit/vmap-safe.

Semantics preserved from the reference's *effective* configuration
(``discriminative.py:162-188``): ``calculate_means`` uses the 'intri'
L2-normalised means; the variance term uses the clamped-norm variant; the
distance term is computed in the reference but NOT added to the loss; the
regularisation term is the q-regularisation; ``loss = 1.0*var + 0.005*qreg``.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

_EPS = 1e-8


def calculate_means(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    n_objects: jnp.ndarray,
    normalize: bool = True,
) -> jnp.ndarray:
    """Masked per-instance embedding means.

    pred: (B, L, F); gt: (B, L, N) in {0,1}; n_objects: (B,) int.
    Returns (B, N, F), zero rows beyond n_objects. Mirrors
    ``discriminative.py:7-62`` ('intri' L2 normalisation when normalize).
    """
    gt = gt.astype(pred.dtype)
    sums = jnp.einsum("blf,bln->bnf", pred, gt)
    counts = jnp.sum(gt, axis=1)[..., None]  # (B, N, 1)
    means = sums / jnp.maximum(counts, _EPS)
    if normalize:
        means = means / jnp.maximum(
            jnp.linalg.norm(means, axis=-1, keepdims=True), _EPS
        )
    n = gt.shape[2]
    valid = (jnp.arange(n)[None, :] < n_objects[:, None])[..., None]
    return jnp.where(valid, means, 0.0)


def calculate_variance_term(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    means: jnp.ndarray,
    n_objects: jnp.ndarray,
    delta_v: float,
    norm: int = 2,
) -> jnp.ndarray:
    """Clamped within-instance variance (``discriminative.py:65-95`` else-branch)."""
    gt = gt.astype(pred.dtype)
    # diff: (B, L, N, F)
    diff = pred[:, :, None, :] - means[:, None, :, :]
    if norm == 1:
        dist = jnp.sum(jnp.abs(diff), axis=-1)
    else:
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + _EPS)
    var = jnp.clip(dist - delta_v, min=0.0) ** 2 * gt  # (B, L, N)
    n = gt.shape[2]
    valid = (jnp.arange(n)[None, :] < n_objects[:, None]).astype(pred.dtype)
    num = jnp.sum(var * valid[:, None, :], axis=(1, 2))
    den = jnp.sum(gt * valid[:, None, :], axis=(1, 2))
    return jnp.mean(num / jnp.maximum(den, _EPS))


def calculate_distance_term(
    means: jnp.ndarray, n_objects: jnp.ndarray, delta_d: float, norm: int = 2
) -> jnp.ndarray:
    """Between-instance hinge distance (``discriminative.py:98-132``).

    Computed in the reference but not added to the final loss; kept as a
    capability.
    """
    b, n, _ = means.shape
    diff = means[:, :, None, :] - means[:, None, :, :]
    if norm == 1:
        dist = jnp.sum(jnp.abs(diff), axis=-1)
    else:
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + _EPS)
    eye = jnp.eye(n, dtype=means.dtype)
    margin = 2.0 * delta_d * (1.0 - eye)
    hinge = jnp.clip(margin - dist, min=0.0) ** 2 * (1.0 - eye)
    valid = (jnp.arange(n)[None, :] < n_objects[:, None]).astype(means.dtype)
    pair_valid = valid[:, :, None] * valid[:, None, :]
    per_sample = jnp.sum(hinge * pair_valid, axis=(1, 2))
    cnt = n_objects.astype(means.dtype)
    per_sample = jnp.where(
        cnt > 1, per_sample / jnp.maximum(cnt * (cnt - 1.0), 1.0), 0.0
    )
    return jnp.mean(per_sample)


def calculate_regularization_term(
    means: jnp.ndarray, n_objects: jnp.ndarray, norm: int = 2
) -> jnp.ndarray:
    """Mean embedding norm (``discriminative.py:135-147``)."""
    if norm == 1:
        norms = jnp.sum(jnp.abs(means), axis=-1)
    else:
        norms = jnp.linalg.norm(means, axis=-1)
    n = means.shape[1]
    valid = (jnp.arange(n)[None, :] < n_objects[:, None]).astype(means.dtype)
    per_sample = jnp.sum(norms * valid, axis=1) / jnp.maximum(
        n_objects.astype(means.dtype), 1.0
    )
    return jnp.mean(per_sample)


def calculate_q_regularization_term(
    pred: jnp.ndarray, gt: jnp.ndarray
) -> jnp.ndarray:
    """Unit-norm penalty on fg embeddings (``discriminative.py:149-160``)."""
    gt = gt.astype(pred.dtype)
    tgt = jnp.sum(gt, axis=2, keepdims=True)  # (B, L, 1)
    num = jnp.maximum(jnp.sum(tgt), 1.0)
    it = pred * tgt
    l2 = jnp.linalg.norm(it, axis=2)  # (B, L)
    return jnp.sum((l2 - 1.0) ** 2) / num


def discriminative_loss(
    embeddings: jnp.ndarray,
    target: jnp.ndarray,
    n_objects: jnp.ndarray,
    delta_v: float = 0.5,
    delta_d: float = 1.5,
    norm: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full loss (``discriminative.py:162-188``): alpha*var + gamma*q_reg.

    embeddings: (B, H, W, F) NHWC; target: (B, H, W, N) instance one-hot
    stack; n_objects: (B,).  Returns (loss, cluster_means).
    """
    alpha, gamma = 1.0, 0.005
    b, h, w, f = embeddings.shape
    n = target.shape[-1]
    pred = embeddings.reshape(b, h * w, f)
    gt = target.reshape(b, h * w, n)
    means = calculate_means(pred, gt, n_objects, normalize=True)
    var_term = calculate_variance_term(pred, gt, means, n_objects, delta_v, norm)
    qreg = calculate_q_regularization_term(pred, gt)
    return alpha * var_term + gamma * qreg, means
