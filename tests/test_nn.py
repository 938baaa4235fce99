"""Unit tests for NN blocks, UNet, attention layers, and the pyramid
point machinery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.nn import (
    HardAttention,
    InvertedResidual,
    InvertedV1Residual,
    MaskedBatchNorm,
    SpatialAttention,
    SqueezeExcite,
    UNet,
)
from tpuseg.decoder.pyramid import point_position_planes

RNG = jax.random.PRNGKey(0)


def test_inverted_v1_residual_shapes_and_residual():
    m = InvertedV1Residual(features=8)
    x = jnp.ones((1, 8, 8, 8))
    v = m.init(RNG, x)
    y = m.apply(v, x)
    assert y.shape == (1, 8, 8, 8)
    # different channels -> no residual path, still correct shape
    m2 = InvertedV1Residual(features=16)
    v2 = m2.init(RNG, x)
    assert m2.apply(v2, x).shape == (1, 8, 8, 16)


def test_inverted_residual_expand():
    m = InvertedResidual(features=12, expand_ratio=2)
    x = jnp.ones((2, 4, 4, 6))
    v = m.init(RNG, x)
    assert m.apply(v, x).shape == (2, 4, 4, 12)


def test_unet_shapes():
    m = UNet(n_filters=8, use_encode=True)
    x = jnp.ones((1, 32, 32, 21))
    v = m.init(RNG, x)
    y, skips = m.apply(v, x)
    assert y.shape == (1, 32, 32, 8)
    shapes = [s.shape for s in skips]
    assert shapes == [
        (1, 32, 32, 8),
        (1, 16, 16, 16),
        (1, 8, 8, 32),
        (1, 4, 4, 64),
        (1, 2, 2, 128),
    ]


def test_squeeze_excite_gates_channels():
    m = SqueezeExcite()
    x = jnp.ones((1, 4, 4, 8))
    v = m.init(RNG, x)
    y = m.apply(v, x)
    assert y.shape == x.shape
    gate = m.apply(v, x) / x
    assert np.all(np.asarray(gate) > 0) and np.all(np.asarray(gate) < 1)


def test_masked_batchnorm_stats_use_only_masked_pixels():
    m = MaskedBatchNorm()
    x = np.zeros((2, 4, 4, 1), np.float32)
    x[:, :2] = 5.0  # masked-in region has mean 5, var 0
    x[:, 2:] = 100.0  # masked-out region should not affect stats
    mask = np.zeros((2, 4, 4, 1), np.float32)
    mask[:, :2] = 1.0
    v = m.init(RNG, jnp.asarray(x), jnp.asarray(mask), True)
    y, mut = m.apply(
        v, jnp.asarray(x), jnp.asarray(mask), True, mutable=["batch_stats"]
    )
    # reference denominator is |mask|+1 = 9 per sample: mean = 8*5/9
    want_mean = 8 * 5.0 / 9.0
    np.testing.assert_allclose(
        float(mut["batch_stats"]["mean"][0]) , want_mean * 0.9, rtol=1e-5
    )  # running = 0.1*0 + 0.9*batch (reference reversed EMA)
    # normalised output is finite everywhere
    assert np.all(np.isfinite(np.asarray(y)))


def test_spatial_attention_masked_softmax_scaling():
    m = SpatialAttention(d_model=8, multiply=False)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 8).astype(np.float32))
    y = np.zeros((1, 8, 8, 1), np.float32)
    y[0, :4] = 1.0
    beta = m.init(RNG, x, jnp.asarray(y))
    out = m.apply(beta, x, jnp.asarray(y))
    arr = np.asarray(out)
    # softmax over fg * fg_count: sums to fg pixel count over fg, 0 outside
    np.testing.assert_allclose(arr[0, :4].sum(), 32.0, rtol=1e-4)
    np.testing.assert_allclose(arr[0, 4:].sum(), 0.0, atol=1e-6)


def test_hard_attention_per_instance_distributions():
    m = HardAttention(d_k=4)
    s = jnp.asarray(np.random.RandomState(1).randn(1, 8, 8, 8).astype(np.float32))
    sem = np.zeros((1, 8, 8, 1), np.float32)
    sem[0, :6] = 1.0
    ins = np.zeros((1, 8, 8, 3), np.float32)
    ins[0, :3, :, 0] = 1.0
    ins[0, 3:6, :, 1] = 1.0
    # instance 2 empty
    v = m.init(RNG, s, jnp.asarray(sem), jnp.asarray(ins), True)
    p, merged = m.apply(v, s, jnp.asarray(sem), jnp.asarray(ins), False)
    parr = np.asarray(p)
    # each non-empty instance distribution sums to 1 on its own support
    np.testing.assert_allclose(parr[0, :, :, 0].sum(), 1.0, rtol=1e-5)
    np.testing.assert_allclose(parr[0, :, :, 1].sum(), 1.0, rtol=1e-5)
    # zero outside support; empty instance all zero (NaN scrub)
    assert parr[0, 3:, :, 0].sum() == 0.0
    np.testing.assert_allclose(parr[0, :, :, 2].sum(), 0.0, atol=1e-7)
    assert merged.shape == (1, 8, 8, 1)


def test_point_position_planes():
    # full res 16x16, level 4x4 (factor 4, 2 bits per axis)
    pt = jnp.asarray([5 * 16 + 7], jnp.int32)  # row 5, col 7
    planes = np.asarray(point_position_planes(pt, (16, 16), (4, 4)))
    assert planes.shape == (1, 4, 4, 5)
    # level coords: row 5//4=1, col 7//4=1 ; remainders 1, 3
    onehot = planes[0, :, :, -1]
    assert onehot[1, 1] == 1.0 and onehot.sum() == 1.0
    # bits: row rem 1 -> 01 ; col rem 3 -> 11 (MSB first)
    np.testing.assert_allclose(planes[0, 1, 1, :4], [0, 1, 1, 1])
    # planes are zero away from the point
    assert planes[0, 0, 0].sum() == 0.0


def test_point_position_planes_factor1():
    pt = jnp.asarray([3], jnp.int32)
    planes = np.asarray(point_position_planes(pt, (4, 4), (4, 4)))
    assert planes.shape == (1, 4, 4, 1)
    assert planes[0, 0, 3, 0] == 1.0 and planes.sum() == 1.0
