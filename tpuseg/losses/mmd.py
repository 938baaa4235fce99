"""MMD / WAE loss family.

Reference: ``code/lib/losses/dice.py:88-242`` (IMQ mmd penalty, gl rank
loss, weighted-MMD, sampled point-cloud decoder MMD) and
``code/lib/losses/multi_loss.py:77-187`` (RBF weighted MMD).

TPU redesign notes:
  * The reference's point sampling (boolean indexing, dynamic shapes,
    per-sample python loops, silent try/except fallbacks) is replaced by
    fixed-size weighted point clouds: every pixel is a candidate, selection
    becomes a weight, and the kernel sums are weighted — static shapes,
    jit/vmap-safe.  With the same selected points/weights the kernel math
    matches the reference exactly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_IMQ_SCALES = (0.1, 0.2, 0.5, 1.0, 2.0, 5.0, 10.0)


def _sq_dists(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    na = jnp.sum(a * a, axis=1, keepdims=True)
    nb = jnp.sum(b * b, axis=1, keepdims=True)
    return na + nb.T - 2.0 * (a @ b.T)


def mmd_penalty(
    sample_qz: jnp.ndarray,
    sample_pz: jnp.ndarray,
    pz: str = "normal",
    zdim: int = 24,
    kernel: str = "IMQ",
) -> jnp.ndarray:
    """Unweighted IMQ MMD (reference ``dice.py:88-121``)."""
    m = sample_pz.shape[0]
    n = sample_qz.shape[0]
    if m < 2 or n < 2:
        return jnp.asarray(0.0)
    d_pp = _sq_dists(sample_pz, sample_pz)
    d_qq = _sq_dists(sample_qz, sample_qz)
    d_qp = _sq_dists(sample_qz, sample_pz)
    if kernel != "IMQ":
        raise ValueError(kernel)
    if pz == "normal":
        cbase = 2.0 * zdim * 1.0
    elif pz == "sphere":
        cbase = 2.0
    elif pz == "uniform":
        cbase = float(zdim)
    else:
        raise ValueError(pz)
    off_q = 1.0 - jnp.eye(n)
    off_p = 1.0 - jnp.eye(m)
    stat = 0.0
    for scale in _IMQ_SCALES:
        c = cbase * scale
        res1 = jnp.sum(c / (c + d_qq) * off_q / (n**2 - n))
        res1 += jnp.sum(c / (c + d_pp) * off_p / (m**2 - m))
        res2 = jnp.sum(c / (c + d_qp)) * 2.0 / (n * m)
        stat += res1 - res2
    return stat


def mmd_penalty_with_p(
    sample_qz: jnp.ndarray,
    sample_pz: jnp.ndarray,
    q_w: jnp.ndarray,
    p_w: jnp.ndarray,
    kernel: str = "RBF",
    sigma2_k: float = 64.0,
    pz: str = "normal",
    zdim: int = 24,
) -> jnp.ndarray:
    """Weighted MMD between point clouds (reference ``multi_loss.py:144-187``).

    q_w/p_w are per-point weights (may include zeros for padded points);
    they are normalised to sum 1 internally, matching the reference.
    """
    q = q_w.reshape(-1, 1) / jnp.maximum(jnp.sum(q_w), 1e-12)
    p = p_w.reshape(-1, 1) / jnp.maximum(jnp.sum(p_w), 1e-12)
    d_qq = _sq_dists(sample_qz, sample_qz)
    d_pp = _sq_dists(sample_pz, sample_pz)
    d_qp = _sq_dists(sample_qz, sample_pz)
    if kernel == "RBF":
        res1 = jnp.sum(jnp.exp(d_qq / -2.0 / sigma2_k) * q * q.T) * 0.5
        res1 += jnp.sum(jnp.exp(d_pp / -2.0 / sigma2_k) * p * p.T) * 0.5
        res2 = jnp.sum(jnp.exp(d_qp / -2.0 / sigma2_k) * q * p.T)
        return res1 - res2
    elif kernel == "IMQ":
        if pz == "normal":
            cbase = 2.0 * zdim
        elif pz == "sphere":
            cbase = 2.0
        else:
            cbase = float(zdim)
        stat = 0.0
        for scale in _IMQ_SCALES:
            c = cbase * scale
            res1 = jnp.sum(q * q.T * c / (c + d_qq))
            res1 += jnp.sum(p * c / (c + d_pp) * p.T)
            res2 = jnp.sum(q * c / (c + d_qp) * p.T * 2.0)
            stat += res1 - res2
        return stat
    raise ValueError(kernel)


def _select_points(
    prob_map: jnp.ndarray, key: jax.Array, threshold: jnp.ndarray, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Stochastic fixed-size point selection from a (H, W) map.

    Replaces the reference's dynamic boolean indexing + first-300 truncation
    (``dice.py:206-224``) with: accept pixels where value > U*threshold,
    keep at most ``k`` accepted pixels (random priority), represented as a
    (k, 2) coordinate array + (k,) validity weights.
    """
    h, w = prob_map.shape
    k = min(k, h * w)
    u = jax.random.uniform(key, prob_map.shape)
    accept = prob_map > u * threshold
    # random priority among accepted, -inf for rejected
    prio = jnp.where(accept, jax.random.uniform(jax.random.fold_in(key, 1), prob_map.shape), -jnp.inf)
    flat = prio.reshape(-1)
    _, idx = jax.lax.top_k(flat, k)
    valid = jnp.isfinite(flat[idx])
    rows = (idx // w).astype(jnp.float32)
    cols = (idx % w).astype(jnp.float32)
    coords = jnp.stack([rows, cols], axis=1)
    weights = prob_map.reshape(-1)[idx] * valid
    return coords, weights


def decoder_mmd_loss(
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    key: jax.Array,
    max_points: int = 300,
    kernel: str = "RBF",
    sigma2_k: float = 64.0,
) -> jnp.ndarray:
    """Point-cloud MMD between predicted and target masks.

    Reference ``dice.py:200-242``: thresholded random pixel selection from
    each map, then weighted MMD between the selected coordinate clouds.
    inputs/targets: (B, H, W) probability maps.
    """
    b, h, w = inputs.shape
    th_in = jnp.mean(inputs) * h * w / 200.0
    th_tg = jnp.mean(targets) * h * w / 200.0

    def per_sample(i, k):
        ci, wi = _select_points(inputs[i], jax.random.fold_in(k, 0), th_in, max_points)
        ct, wt = _select_points(targets[i], jax.random.fold_in(k, 1), th_tg, max_points)
        ok = (jnp.sum(wi) > 0) & (jnp.sum(wt) > 0)
        loss = mmd_penalty_with_p(ci, ct, wi, wt, kernel=kernel, sigma2_k=sigma2_k)
        return jnp.where(ok, loss, 0.0)

    keys = jax.random.split(key, b)
    losses = jax.vmap(per_sample)(jnp.arange(b), keys)
    return jnp.sum(losses)


def _pool(x: jnp.ndarray, f: int, mode: str) -> jnp.ndarray:
    """(B, H, W) max/avg pooling by factor f."""
    x4 = x[..., None]
    import flax.linen as fnn

    out = (
        fnn.max_pool(x4, (f, f), strides=(f, f))
        if mode == "max"
        else fnn.avg_pool(x4, (f, f), strides=(f, f))
    )
    return out[..., 0]


def mmd_loss_pooled(
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    key: jax.Array,
    pool_factor: int = 4,
    sigma2_k: float = 64.0,
    max_points: int = 256,
) -> jnp.ndarray:
    """Pooled sampled point-cloud RBF-MMD + area term.

    Reference ``MmdLoss`` (``multi_loss.py:77-142``): threshold-sample both
    maps, max-pool the selection and avg-pool the probabilities by 4, then
    per-sample weighted RBF MMD over the selected coordinate clouds plus a
    squared area-difference term.  inputs: (B, L) flat probability maps with
    L a square; targets: (B, L) or (B, h, w).
    """
    b, l = inputs.shape[0], int(np.prod(inputs.shape[1:]))
    side = int(l**0.5)
    x = inputs.reshape(b, side, side)
    t = targets.reshape(b, side, side).astype(x.dtype)
    th_x = jnp.maximum(jnp.mean(x) * side * side / 500.0, 0.01)
    th_t = jnp.maximum(jnp.mean(t) * side * side / 100.0, 0.01)
    kx, kt = jax.random.split(key)
    sel_x = (x > jax.random.uniform(kx, x.shape) * th_x).astype(x.dtype)
    sel_t = (t > jax.random.uniform(kt, t.shape) * th_t).astype(x.dtype)
    sel_x = _pool(sel_x, pool_factor, "max")
    sel_t = _pool(sel_t, pool_factor, "max")
    px = _pool(x, pool_factor, "avg")
    pt = _pool(t, pool_factor, "avg")
    hs = side // pool_factor
    rows = jax.lax.broadcasted_iota(jnp.float32, (hs, hs), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (hs, hs), 1)
    coords = jnp.stack([rows, cols], -1).reshape(-1, 2)
    k = min(max_points, hs * hs)

    def per_sample(i, kk):
        wx = (px[i] * sel_x[i]).reshape(-1)
        wt = (pt[i] * sel_t[i]).reshape(-1)
        ok = (jnp.sum(sel_x[i]) > 0) & (jnp.sum(sel_t[i]) > 0)
        loss = mmd_penalty_with_p(coords, coords, wx, wt, kernel="RBF",
                                  sigma2_k=sigma2_k)
        return jnp.where(ok, loss, 0.0)

    keys = jax.random.split(key, b)
    position_loss = jax.vmap(per_sample)(jnp.arange(b), keys)
    area = (jnp.sum(px.reshape(b, -1), 1) - jnp.sum(pt.reshape(b, -1), 1)) ** 2 / (
        hs * hs
    )
    return position_loss + area


def gl_loss(encode: jnp.ndarray, decode: jnp.ndarray) -> jnp.ndarray:
    """Rank-matching penalty between latent and decoded pairwise distances.

    Reference ``dice.py:132-152``: ranks of pairwise distance matrices in
    the latent vs decoded space, weighted by latent distances.
    encode: (B, Z); decode: (B, ...) flattened per sample.
    """
    b = decode.shape[0]
    dec = decode.reshape(b, -1)
    en_d = _sq_dists(encode, encode).reshape(-1)
    de_d = _sq_dists(dec, dec).reshape(-1)
    # rank of each element under descending sort
    en_rank = jnp.argsort(jnp.argsort(-en_d)).astype(encode.dtype)
    de_rank = jnp.argsort(jnp.argsort(-de_d)).astype(encode.dtype)
    denom = max(b * b - b, 1) * (64.0 * 34.0**0.5)
    return jnp.sum((de_rank - en_rank) * en_d) / denom
