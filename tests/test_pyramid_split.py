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
