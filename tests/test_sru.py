"""SRU parity tests: lax.scan reference vs Pallas kernel vs C++ kernel —
the analogue of the reference's only cross-implementation check
(sru/test_cpu_impl.py), but asserted instead of eyeballed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.kernels.sru_scan import sru_scan_fused, sru_scan_pallas
from tpuseg.nn.sru import SRU, SRUCell, sru_recurrence
from tpuseg.nn import native


def _rand_inputs(length=7, batch=3, d=5, k=4, n_in=6, bidir=1, seed=0):
    rng = np.random.RandomState(seed)
    u = rng.randn(length, batch, bidir * d * k).astype(np.float32)
    x = rng.randn(length, batch, n_in).astype(np.float32)
    wc = rng.randn(2 * bidir * d).astype(np.float32)
    b = rng.randn(2 * bidir * d).astype(np.float32)
    c0 = rng.randn(batch, bidir * d).astype(np.float32)
    return u, x, wc, b, c0


@pytest.mark.parametrize("activation", [0, 1, 2])
@pytest.mark.parametrize("k", [3, 4])
def test_scan_vs_pallas_interpret(activation, k):
    u, x, wc, b, c0 = _rand_inputs(k=k, n_in=5, d=5)
    h1, c1 = sru_recurrence(
        jnp.asarray(u), jnp.asarray(x), jnp.asarray(wc), jnp.asarray(b),
        jnp.asarray(c0), d=5, activation=activation, scale_x=1.3,
    )
    h2, c2 = sru_scan_pallas(
        jnp.asarray(u), jnp.asarray(x), jnp.asarray(wc), jnp.asarray(b),
        jnp.asarray(c0), d=5, activation=activation, scale_x=1.3,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("bidirectional", [False, True])
def test_scan_vs_cpp(bidirectional):
    lib = native.load()
    if lib is None:
        pytest.skip("native lib unavailable")
    bidir = 2 if bidirectional else 1
    u, x, wc, b, c0 = _rand_inputs(k=4, d=4, n_in=6, bidir=bidir, seed=1)
    h1, c1 = sru_recurrence(
        jnp.asarray(u), jnp.asarray(x), jnp.asarray(wc), jnp.asarray(b),
        jnp.asarray(c0), d=4, activation=1, bidirectional=bidirectional,
        scale_x=1.0,
    )
    out = native.sru_forward_cpu(
        u, x, wc, b, c0, d=4, activation=1, bidirectional=bidirectional,
        scale_x=1.0,
    )
    assert out is not None
    h2, c2 = out
    np.testing.assert_allclose(np.asarray(h1), h2, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(c1), c2, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("bidirectional", [False, True])
@pytest.mark.parametrize("k", [3, 4])
def test_scan_vs_pallas_bidirectional_fwd(bidirectional, k):
    bidir = 2 if bidirectional else 1
    d = 5
    n_in = bidir * d if k == 3 else 7  # k=3 requires n_in == out size
    u, x, wc, b, c0 = _rand_inputs(k=k, d=d, n_in=n_in, bidir=bidir, seed=5)
    h1, c1 = sru_recurrence(
        jnp.asarray(u), jnp.asarray(x), jnp.asarray(wc), jnp.asarray(b),
        jnp.asarray(c0), d=d, activation=1, bidirectional=bidirectional,
        scale_x=1.3,
    )
    h2, c2 = sru_scan_pallas(
        jnp.asarray(u), jnp.asarray(x), jnp.asarray(wc), jnp.asarray(b),
        jnp.asarray(c0), d=d, activation=1, bidirectional=bidirectional,
        scale_x=1.3, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("bidirectional", [False, True])
@pytest.mark.parametrize("activation", [0, 1, 2])
@pytest.mark.parametrize("k", [3, 4])
def test_fused_backward_vs_autodiff_scan(bidirectional, activation, k):
    """The Pallas backward kernel (custom_vjp) must match autodiff of the
    lax.scan reference for every input cotangent — the asserted analogue
    of the reference's SRU_Compute_GPU backward (cuda_functional.py:549-609).
    """
    bidir = 2 if bidirectional else 1
    d = 5
    n_in = bidir * d if k == 3 else 7
    u, x, wc, b, c0 = _rand_inputs(
        length=6, batch=2, k=k, d=d, n_in=n_in, bidir=bidir, seed=6
    )
    mask_c = np.random.RandomState(7).binomial(
        1, 0.8, (2, bidir * d)
    ).astype(np.float32)
    args = tuple(jnp.asarray(a) for a in (u, x, wc, b, c0))
    mc = jnp.asarray(mask_c)

    def loss_scan(u_, x_, wc_, b_, c0_):
        h, c = sru_recurrence(
            u_, x_, wc_, b_, c0_, d=d, activation=activation,
            bidirectional=bidirectional, scale_x=1.3, mask_c=mc,
        )
        return jnp.sum(h * h) + jnp.sum(jnp.sin(c))

    def loss_fused(u_, x_, wc_, b_, c0_):
        h, c = sru_scan_fused(
            u_, x_, wc_, b_, c0_, mc, d, activation, bidirectional,
            True, 1.3, True,
        )
        return jnp.sum(h * h) + jnp.sum(jnp.sin(c))

    v1, g1 = jax.value_and_grad(loss_scan, argnums=(0, 1, 2, 3, 4))(*args)
    v2, g2 = jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=3e-4, atol=3e-5
        )


def test_sru_cell_pallas_impl_grad():
    """SRUCell(use_impl='pallas') is differentiable end-to-end and matches
    the scan implementation (same params, same inputs)."""
    x = jnp.asarray(np.random.RandomState(8).randn(5, 2, 6).astype(np.float32))
    cell_s = SRUCell(n_in=6, n_out=6, activation=1, bidirectional=True)
    cell_p = SRUCell(
        n_in=6, n_out=6, activation=1, bidirectional=True, use_impl="pallas"
    )
    v = cell_s.init(jax.random.PRNGKey(0), x)

    def loss(params, cell):
        h, c = cell.apply({"params": params}, x)
        return jnp.sum(h**2) + jnp.sum(c**2)

    l1, g1 = jax.value_and_grad(loss)(v["params"], cell_s)
    l2, g2 = jax.value_and_grad(loss)(v["params"], cell_p)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-5
        )


def test_k3_skip_scaling_and_masks():
    # k=3 requires n_in == d (skip term from x * scale_x)
    u, x, wc, b, c0 = _rand_inputs(k=3, d=6, n_in=6, seed=2)
    mask_pad = np.zeros((7, 3), np.float32)
    mask_pad[5:] = 1.0  # last steps padded
    h, c = sru_recurrence(
        jnp.asarray(u), jnp.asarray(x), jnp.asarray(wc), jnp.asarray(b),
        jnp.asarray(c0), d=6, activation=1, scale_x=2.0,
        mask_pad=jnp.asarray(mask_pad),
    )
    # padded steps emit zeros
    np.testing.assert_allclose(np.asarray(h[5:]), 0.0, atol=1e-6)
    assert np.all(np.isfinite(np.asarray(c)))


def test_sru_cell_and_stack_shapes():
    cell = SRUCell(n_in=10, n_out=8, activation=1)
    x = jnp.asarray(np.random.RandomState(3).randn(5, 2, 10).astype(np.float32))
    v = cell.init(jax.random.PRNGKey(0), x)
    h, c = cell.apply(v, x)
    assert h.shape == (5, 2, 8) and c.shape == (2, 8)

    stack = SRU(input_size=10, hidden_size=8, num_layers=2, bidirectional=True)
    v2 = stack.init(jax.random.PRNGKey(1), x)
    h2, cs = stack.apply(v2, x)
    assert h2.shape == (5, 2, 16) and cs.shape == (2, 2, 16)


def test_sru_cell_grad_flows():
    cell = SRUCell(n_in=6, n_out=6, activation=1)
    x = jnp.asarray(np.random.RandomState(4).randn(4, 2, 6).astype(np.float32))
    v = cell.init(jax.random.PRNGKey(0), x)

    def loss(params):
        h, c = cell.apply({"params": params}, x)
        return jnp.sum(h**2) + jnp.sum(c**2)

    g = jax.grad(loss)(v["params"])
    total = sum(float(jnp.sum(jnp.abs(t))) for t in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0
