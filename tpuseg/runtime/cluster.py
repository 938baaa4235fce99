"""On-device masked KMeans over pixel embeddings.

Reference: ``Prediction.cluster`` (``code/lib/prediction.py:52-85``) runs
sklearn ``KMeans(n_clusters=n_objects, n_init=35, max_iter=500)`` on the
foreground-pixel embeddings of ONE image on CPU — the dominant cost of the
serial inference loop.  This is the discriminative-embedding capability
(the live attention decoder emits masks directly and does not need it).

TPU redesign: weighted Lloyd iterations over *all* pixels with the
foreground mask as weights (static shapes), a fixed iteration budget,
multiple restarts batched with ``vmap``, and best-inertia selection — the
whole thing jit/vmap-able across a batch of images.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_BIG = 1e30


def _lloyd(
    emb: jnp.ndarray,       # (L, F)
    weights: jnp.ndarray,   # (L,) 0/1 fg mask
    init_centers: jnp.ndarray,  # (K, F)
    k_valid: jnp.ndarray,   # scalar int — active cluster count
    n_iter: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    k = init_centers.shape[0]
    valid_c = (jnp.arange(k) < k_valid)[:, None]

    def step(centers, _):
        d = (
            jnp.sum(emb * emb, 1, keepdims=True)
            - 2.0 * emb @ centers.T
            + jnp.sum(centers * centers, 1)[None, :]
        )  # (L, K)
        d = jnp.where(valid_c.T, d, _BIG)
        assign = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(assign, k) * weights[:, None]  # (L, K)
        counts = jnp.sum(onehot, axis=0)[:, None]
        sums = onehot.T @ emb
        new_centers = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), centers)
        new_centers = jnp.where(valid_c, new_centers, centers)
        return new_centers, None

    centers, _ = jax.lax.scan(step, init_centers, None, length=n_iter)
    d = (
        jnp.sum(emb * emb, 1, keepdims=True)
        - 2.0 * emb @ centers.T
        + jnp.sum(centers * centers, 1)[None, :]
    )
    d = jnp.where(valid_c.T, d, _BIG)
    assign = jnp.argmin(d, axis=1)
    inertia = jnp.sum(jnp.min(d, axis=1) * weights)
    return assign, inertia


@functools.partial(jax.jit, static_argnames=("max_clusters", "n_iter", "n_init"))
def kmeans_cluster(
    embeddings: jnp.ndarray,  # (H, W, F)
    fg_mask: jnp.ndarray,     # (H, W) {0,1}
    n_clusters: jnp.ndarray,  # scalar int
    key: jax.Array,
    max_clusters: int = 32,
    n_iter: int = 50,
    n_init: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cluster fg-pixel embeddings; returns (instance_mask (H, W) int32
    with ids 1..n_clusters and 0 on background, inertia of the best run).

    Matches the reference's output contract (prediction.py:76-85): labels
    scattered into a zero background map, ids offset by +1.
    """
    h, w, f = embeddings.shape
    emb = embeddings.reshape(-1, f)
    wts = fg_mask.reshape(-1).astype(jnp.float32)
    l = emb.shape[0]

    def one_restart(k):
        # seed centers at random fg pixels (gumbel top-k over the mask)
        g = jax.random.gumbel(k, (l,))
        score = jnp.where(wts > 0, g, -_BIG)
        _, seed_idx = jax.lax.top_k(score, max_clusters)
        centers = emb[seed_idx]
        return _lloyd(emb, wts, centers, n_clusters, n_iter)

    keys = jax.random.split(key, n_init)
    assigns, inertias = jax.vmap(one_restart)(keys)
    best = jnp.argmin(inertias)
    assign = assigns[best]
    ids = (assign + 1).astype(jnp.int32) * (wts > 0).astype(jnp.int32)
    return ids.reshape(h, w), inertias[best]


def kmeans_cluster_batch(
    embeddings: jnp.ndarray,  # (B, H, W, F)
    fg_masks: jnp.ndarray,    # (B, H, W)
    n_clusters: jnp.ndarray,  # (B,)
    key: jax.Array,
    **kw,
):
    keys = jax.random.split(key, embeddings.shape[0])
    return jax.vmap(lambda e, m, n, k: kmeans_cluster(e, m, n, k, **kw))(
        embeddings, fg_masks, n_clusters, keys
    )
