"""CoordConv (Liu et al. 2018) — NHWC flax ports.

Reference: ``code/lib/archs/modules/coord_conv.py`` — ``AddCoordinates``
(:6-67), ``CoordConv`` (:70-117), ``CoordConvTranspose`` (:120-171), and
the ``CoordConvNet`` retrofit wrapper (:174-260), whose torch in-place
weight mutation becomes a pure param-pytree transform here
(:func:`retrofit_coordconv_params` + :class:`CoordConvNet`).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp


def add_coordinates(x: jnp.ndarray, with_r: bool = False) -> jnp.ndarray:
    """Concatenate y/x (and optionally r) coordinate planes.

    y/x are scaled to [-1, 1] (origin at center), r is the euclidean
    distance from center scaled to [0, 1] (coord_conv.py:43-67).
    NHWC: planes are prepended on the channel axis, matching the
    reference's channel ordering (coords first).
    """
    b, h, w, _ = x.shape
    y = 2.0 * jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) / (h - 1.0) - 1.0
    xc = 2.0 * jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) / (w - 1.0) - 1.0
    planes = [y, xc]
    if with_r:
        r = jnp.sqrt(y**2 + xc**2)
        planes.append(r / jnp.max(r))
    coords = jnp.stack(planes, axis=-1)[None].astype(x.dtype)
    coords = jnp.broadcast_to(coords, (b, h, w, coords.shape[-1]))
    return jnp.concatenate([coords, x], axis=-1)


class CoordConv(nn.Module):
    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    with_r: bool = False
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        ks = (k, k) if isinstance(k, int) else k
        x = add_coordinates(x, self.with_r)
        return nn.Conv(
            self.features, ks, strides=self.stride, padding=self.padding,
            kernel_dilation=self.dilation, use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)


class CoordConvTranspose(nn.Module):
    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: int = 2
    with_r: bool = False
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        ks = (k, k) if isinstance(k, int) else k
        x = add_coordinates(x, self.with_r)
        return nn.ConvTranspose(
            self.features, ks, strides=(self.stride, self.stride),
            use_bias=self.use_bias, dtype=self.dtype,
        )(x)


def retrofit_coordconv_params(params, with_r: bool = True):
    """CoordConvNet weight surgery, the JAX way (coord_conv.py:174-260).

    The reference's ``CoordConvNet`` mutates a trained torch ConvNet in
    place: every ``Conv2d`` kernel gains zero-initialised input channels
    for the coordinate planes, so the retrofitted net starts out exactly
    equivalent to the original and can then *learn* to use coordinates.
    The functional equivalent is a pure transform over the param pytree:
    every ``conv*`` kernel ``(kh, kw, I, O)`` is front-padded (coords are
    prepended on the channel axis, matching ``add_coordinates``) with
    ``2 (+1 with_r)`` zero input channels.  Apply to a
    ``VGG16(use_coordinates=False)`` tree, then run
    ``VGG16(use_coordinates=True)`` (or ``CoordConvNet``) with the result.
    """
    extra = 3 if with_r else 2

    def walk(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if k.startswith("conv") and "kernel" in v:
                    kern = v["kernel"]
                    kh, kw, cin, cout = kern.shape
                    pad = jnp.zeros((kh, kw, extra, cout), kern.dtype)
                    out[k] = {
                        **v, "kernel": jnp.concatenate([pad, kern], axis=2)
                    }
                else:
                    out[k] = walk(v)
            else:
                out[k] = v
        return out

    return walk(params)


class CoordConvNet(nn.Module):
    """Retrofit runner (coord_conv.py:174-260): a VGG16-style conv stack
    where every conv sees prepended coordinate planes, returning ALL
    intermediate layer outputs like the reference wrapper does.

    Pair with :func:`retrofit_coordconv_params` to convert trained
    plain-conv weights into this module's expected shapes.
    """

    n_layers: Optional[int] = None
    with_r: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        from tpuseg.nn.vgg16 import _layer_types

        types = _layer_types()
        n = self.n_layers if self.n_layers is not None else len(types)
        outs = []
        conv_i = 0
        for t in types[:n]:
            if t == "pool":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            elif t == "relu":
                x = nn.relu(x)
            else:
                x = add_coordinates(x, with_r=self.with_r)
                x = nn.Conv(
                    int(t[4:]), (3, 3), padding=1, dtype=self.dtype,
                    name=f"conv{conv_i}",
                )(x)
                conv_i += 1
            outs.append(x)
        return outs
