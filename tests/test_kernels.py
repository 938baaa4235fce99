"""Pallas kernel parity vs pure-jnp references (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.kernels.masked_softmax import masked_softmax_pallas


def _jnp_masked_softmax(e, mask):
    b, hw = e.shape
    n = mask.shape[-1]
    logits = jnp.where(mask > 0, e[:, :, None], -1e30)
    p = jax.nn.softmax(logits, axis=1)
    nonempty = jnp.sum(mask, axis=1, keepdims=True) > 0
    return jnp.where(nonempty, p, 0.0)


def test_masked_softmax_matches_jnp():
    rng = np.random.RandomState(0)
    b, hw, n = 2, 300, 5
    e = jnp.asarray(rng.randn(b, hw).astype(np.float32))
    mask = jnp.asarray((rng.rand(b, hw, n) < 0.3).astype(np.float32))
    # make instance 3 of sample 0 empty
    mask = mask.at[0, :, 3].set(0.0)
    got = masked_softmax_pallas(e, mask, interpret=True)
    want = _jnp_masked_softmax(e, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    # distributions sum to 1 (or 0 for empty)
    sums = np.asarray(got.sum(axis=1))
    assert abs(sums[0, 3]) < 1e-6
    np.testing.assert_allclose(sums[1], 1.0, rtol=1e-5)
