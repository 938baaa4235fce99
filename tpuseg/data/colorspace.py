"""On-device 21-channel colour-space expansion.

The reference expands every RGB image to 21 channels on the *host* with
skimage, one image at a time (``code/lib/utils.py:90-113``:
RGB+LAB+HSV+YUV+YCbCr+HED+YIQ), then standardises with ``(x-0.5)*2``
(``code/lib/preprocess.py`` Standardization via ``lib/utils.py:82-83``).
That is 7 colourspace conversions per image in python — a major part of the
serial ``pred_list.py`` cost.

Here every conversion is pure jnp over batched NHWC tensors, so the whole
expansion fuses into one XLA program on TPU and runs on thousands of images
per call.

Scale semantics preserved from the reference (a quirk that is spec for
parity): the RGB block keeps its raw 0..255 values (the reference
concatenates the uint8 array cast to float), LAB has L in 0..100, YCbCr is
in 16..240, HSV/YUV/HED/YIQ are in unit-ish ranges — the standardiser does
NOT rescale them to a common range.

Conversion formulas follow the published standards used by scikit-image
(sRGB D65 Lab, BT.601 YUV/YIQ/YCbCr, Ruifrok & Johnston HED stain
separation with the modern log-domain normalisation).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# sRGB -> XYZ (D65), as standardised (and used by scikit-image).
_XYZ_FROM_RGB = np.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    dtype=np.float32,
)
_D65_WHITE = np.array([0.95047, 1.0, 1.08883], dtype=np.float32)

_YUV_FROM_RGB = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.14714119, -0.28886916, 0.43601035],
        [0.61497538, -0.51496512, -0.10001026],
    ],
    dtype=np.float32,
)

_YIQ_FROM_RGB = np.array(
    [
        [0.299, 0.587, 0.114],
        [0.59590059, -0.27455667, -0.32134392],
        [0.21153661, -0.52273617, 0.31119955],
    ],
    dtype=np.float32,
)

# ITU-R BT.601 YCbCr (digital, offset form) on [0,1] RGB.
_YCBCR_FROM_RGB = np.array(
    [
        [65.481, 128.553, 24.966],
        [-37.797, -74.203, 112.0],
        [112.0, -93.786, -18.214],
    ],
    dtype=np.float32,
)
_YCBCR_OFFSET = np.array([16.0, 128.0, 128.0], dtype=np.float32)

# Ruifrok & Johnston H&E+DAB stain matrix.
_RGB_FROM_HED = np.array(
    [[0.65, 0.70, 0.29], [0.07, 0.99, 0.11], [0.27, 0.57, 0.78]],
    dtype=np.float32,
)
_HED_FROM_RGB = np.linalg.inv(_RGB_FROM_HED).astype(np.float32)


def _matmul_c(rgb01: jnp.ndarray, m: np.ndarray) -> jnp.ndarray:
    """Apply a 3x3 channel matrix to (..., 3)."""
    return rgb01 @ jnp.asarray(m).T


def rgb2yuv(rgb01: jnp.ndarray) -> jnp.ndarray:
    return _matmul_c(rgb01, _YUV_FROM_RGB)


def rgb2yiq(rgb01: jnp.ndarray) -> jnp.ndarray:
    return _matmul_c(rgb01, _YIQ_FROM_RGB)


def rgb2ycbcr(rgb01: jnp.ndarray) -> jnp.ndarray:
    return _matmul_c(rgb01, _YCBCR_FROM_RGB) + jnp.asarray(_YCBCR_OFFSET)


def rgb2hsv(rgb01: jnp.ndarray) -> jnp.ndarray:
    r, g, b = rgb01[..., 0], rgb01[..., 1], rgb01[..., 2]
    v = jnp.max(rgb01, axis=-1)
    mn = jnp.min(rgb01, axis=-1)
    delta = v - mn
    safe = jnp.where(delta == 0, 1.0, delta)
    s = jnp.where(v == 0, 0.0, delta / jnp.where(v == 0, 1.0, v))
    h_r = ((g - b) / safe) % 6.0
    h_g = (b - r) / safe + 2.0
    h_b = (r - g) / safe + 4.0
    h = jnp.where(v == r, h_r, jnp.where(v == g, h_g, h_b))
    h = jnp.where(delta == 0, 0.0, h / 6.0)
    return jnp.stack([h, s, v], axis=-1)


def rgb2lab(rgb01: jnp.ndarray) -> jnp.ndarray:
    # linearise sRGB
    srgb = jnp.clip(rgb01, 0.0, 1.0)
    lin = jnp.where(
        srgb > 0.04045, ((srgb + 0.055) / 1.055) ** 2.4, srgb / 12.92
    )
    xyz = _matmul_c(lin, _XYZ_FROM_RGB) / jnp.asarray(_D65_WHITE)
    eps = 0.008856
    f = jnp.where(xyz > eps, jnp.cbrt(xyz), 7.787 * xyz + 16.0 / 116.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    l = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([l, a, b], axis=-1)


def rgb2hed(rgb01: jnp.ndarray) -> jnp.ndarray:
    # (log(rgb)/log(1e-6)) @ hed_from_rgb, clipped at 0 — the log-domain
    # stain-separation normalisation.
    rgb = jnp.maximum(rgb01, 1e-6)
    log_adjust = float(np.log(1e-6))
    stains = (jnp.log(rgb) / log_adjust) @ jnp.asarray(_HED_FROM_RGB)
    return jnp.maximum(stains, 0.0)


def expand21(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """Expand (..., H, W, 3) RGB (0..255) to the reference's 21 channels.

    Channel order matches ``lib/utils.py:100-110``:
    [RGB(raw 0..255), LAB, HSV, YUV, YCbCr, HED, YIQ].
    """
    rgb_f = rgb_u8.astype(jnp.float32)
    rgb01 = rgb_f / 255.0
    parts = [
        rgb_f,
        rgb2lab(rgb01),
        rgb2hsv(rgb01),
        rgb2yuv(rgb01),
        rgb2ycbcr(rgb01),
        rgb2hed(rgb01),
        rgb2yiq(rgb01),
    ]
    return jnp.concatenate(parts, axis=-1)


def image_ex_standardize(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """ImageEx + Standardization pipeline (``lib/utils.py:82-83``):
    expand to 21 channels then ``(x - 0.5) * 2``."""
    return (expand21(rgb_u8) - 0.5) * 2.0
