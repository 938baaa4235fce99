"""HardAttention with the Pallas masked-softmax kernel matches the jnp
path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.nn.attention import HardAttention


def test_hard_attention_pallas_matches_jnp():
    rng = np.random.RandomState(0)
    s = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    sem = np.zeros((2, 16, 16, 1), np.float32)
    sem[:, :12] = 1.0
    ins = np.zeros((2, 16, 16, 3), np.float32)
    ins[:, :6, :, 0] = 1.0
    ins[:, 6:12, :, 1] = 1.0  # instance 2 left empty
    m_ref = HardAttention(d_k=4, use_pallas=False)
    m_pl = HardAttention(d_k=4, use_pallas=True)
    v = m_ref.init(jax.random.PRNGKey(0), s, jnp.asarray(sem), jnp.asarray(ins), True)
    p1, e1 = m_ref.apply(v, s, jnp.asarray(sem), jnp.asarray(ins), False)
    p2, e2 = m_pl.apply(v, s, jnp.asarray(sem), jnp.asarray(ins), False)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)
