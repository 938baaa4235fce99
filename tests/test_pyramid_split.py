"""The transform/decode split of the pyramid decoder is semantics-
preserving: __call__ == decode(transform_skips(...)) at eval."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.configs import DecoderConfig
from tpuseg.decoder.pyramid import (
    AttenDecoder,
    skip_transform_shapes,
)


def test_transform_decode_split_matches_call():
    cfg = DecoderConfig()
    f = 8
    bone = AttenDecoder(cfg=cfg, n_filters=f)
    b, H = 2, 32
    rng = np.random.RandomState(0)
    feats = tuple(
        jnp.asarray(rng.randn(b, H // s, H // s, c).astype(np.float32))
        for s, c in zip((1, 2, 4, 8, 16), (f, 2 * f, 4 * f, 8 * f, 16 * f))
    )
    sem = jnp.asarray((rng.rand(b, H, H, 1) < 0.5).astype(np.float32))
    gold = jnp.asarray((rng.rand(b, H, H, 1) < 0.3).astype(np.float32))
    pts = jnp.asarray([5, 100], jnp.int32)
    variables = bone.init(
        jax.random.PRNGKey(0), pts, feats, sem, gold, None, False
    )
    t1, p1 = bone.apply(variables, pts, feats, sem, gold, None, False)

    skips_t = bone.apply(
        variables, feats, False, method=AttenDecoder.transform_skips
    )
    # carried-shape helper agrees with the real outputs
    shapes = skip_transform_shapes(
        b, H, H, n_filters=f, use_mask=cfg.use_mask,
        position_type=cfg.position_type,
    )
    assert [tuple(s.shape) for s in skips_t] == [tuple(s) for s in shapes]
    t2, p2 = bone.apply(
        variables, pts, skips_t, sem, gold, None, False,
        method=AttenDecoder.decode,
    )
    for a, b_ in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-6)
    for a, b_ in zip(t1, t2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_))


def test_conv1_split_decode_matches_full():
    """decode_split(conv1_partials) == decode(repeated skips) at eval —
    the linearity split of conv1 (skip+mask channels precomputed at B,
    x1u+position channels per round) is semantics-preserving."""
    cfg = DecoderConfig()
    f = 8
    G = 2
    bone = AttenDecoder(cfg=cfg, n_filters=f)
    b, H = 2, 32
    rng = np.random.RandomState(3)
    feats = tuple(
        jnp.asarray(rng.randn(b, H // s, H // s, c).astype(np.float32))
        for s, c in zip((1, 2, 4, 8, 16), (f, 2 * f, 4 * f, 8 * f, 16 * f))
    )
    sem = jnp.asarray((rng.rand(b, H, H, 1) < 0.5).astype(np.float32))
    pts = jnp.asarray([5, 100, 640, 1000], jnp.int32)  # b*G points
    variables = bone.init(
        jax.random.PRNGKey(0), pts[:b], feats, sem, None, None, False
    )

    skips_t = bone.apply(
        variables, feats, False, method=AttenDecoder.transform_skips
    )
    skips_rep = [jnp.repeat(s, G, axis=0) for s in skips_t]
    sem_rep = jnp.repeat(sem, G, axis=0)
    _, preds_full = bone.apply(
        variables, pts, skips_rep, sem_rep, None, None, False,
        method=AttenDecoder.decode,
    )

    partials = bone.apply(
        variables, skips_t, sem, method=AttenDecoder.conv1_partials
    )
    preds_split = bone.apply(
        variables, pts, partials, G, method=AttenDecoder.decode_split
    )

    assert len(preds_split) == len(preds_full) == 5
    for a, c in zip(preds_full, preds_split):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=2e-4, atol=2e-4
        )
