"""Colour-space expansion tests against known standard values."""

import numpy as np
import jax.numpy as jnp

from tpuseg.data import (
    expand21,
    image_ex_standardize,
    rgb2hed,
    rgb2hsv,
    rgb2lab,
    rgb2ycbcr,
    rgb2yiq,
    rgb2yuv,
)


def test_lab_known_values():
    # white -> L=100, a=b=0 ; black -> 0,0,0
    white = jnp.ones((1, 1, 3))
    black = jnp.zeros((1, 1, 3))
    lw = np.asarray(rgb2lab(white))[0, 0]
    lb = np.asarray(rgb2lab(black))[0, 0]
    np.testing.assert_allclose(lw, [100.0, 0.0, 0.0], atol=0.05)
    np.testing.assert_allclose(lb, [0.0, 0.0, 0.0], atol=1e-5)
    # pure red sRGB -> L~53.24, a~80.09, b~67.20 (standard D65 values)
    red = jnp.asarray([[[1.0, 0.0, 0.0]]])
    lr = np.asarray(rgb2lab(red))[0, 0]
    np.testing.assert_allclose(lr, [53.24, 80.09, 67.20], atol=0.15)


def test_hsv_known_values():
    vals = jnp.asarray(
        [[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0], [0.5, 0.5, 0.5]]]
    )
    hsv = np.asarray(rgb2hsv(vals))[0]
    np.testing.assert_allclose(hsv[0], [0.0, 1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(hsv[1], [1 / 3, 1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(hsv[2], [2 / 3, 1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(hsv[3], [0.0, 0.0, 0.5], atol=1e-6)


def test_yuv_ycbcr_yiq_known_values():
    white = jnp.ones((1, 1, 3))
    yuv = np.asarray(rgb2yuv(white))[0, 0]
    np.testing.assert_allclose(yuv, [1.0, 0.0, 0.0], atol=1e-5)
    ycc = np.asarray(rgb2ycbcr(white))[0, 0]
    np.testing.assert_allclose(ycc, [235.0, 128.0, 128.0], atol=0.01)
    yiq = np.asarray(rgb2yiq(white))[0, 0]
    np.testing.assert_allclose(yiq, [1.0, 0.0, 0.0], atol=1e-5)
    black = jnp.zeros((1, 1, 3))
    np.testing.assert_allclose(
        np.asarray(rgb2ycbcr(black))[0, 0], [16.0, 128.0, 128.0], atol=1e-4
    )


def test_hed_white_is_zero_stain():
    white = jnp.ones((1, 1, 3))
    hed = np.asarray(rgb2hed(white))[0, 0]
    np.testing.assert_allclose(hed, [0.0, 0.0, 0.0], atol=1e-5)
    # any real colour gives finite non-negative stains
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(4, 4, 3).astype(np.float32))
    h = np.asarray(rgb2hed(x))
    assert np.all(np.isfinite(h)) and np.all(h >= 0)


def test_expand21_shape_and_rgb_scale():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    out = np.asarray(expand21(jnp.asarray(img)))
    assert out.shape == (2, 8, 8, 21)
    # first 3 channels are the raw 0..255 values (reference quirk, spec)
    np.testing.assert_allclose(out[..., :3], img.astype(np.float32))
    std = np.asarray(image_ex_standardize(jnp.asarray(img)))
    np.testing.assert_allclose(std, (out - 0.5) * 2.0, rtol=1e-6)
