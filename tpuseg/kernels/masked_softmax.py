"""Pallas TPU kernel: per-instance masked spatial softmax.

The hot op of the hard-attention head (reference
``HardAttentionLayer``, ``modules/utils.py:648-655``): broadcast one score
map over N instances, mask-fill -inf outside each instance, softmax over
the 65536 pixels per instance, zero the empty ones.  XLA handles the
broadcast+softmax fine but materialises the (B, HW, N) logits in HBM
twice (fill + softmax); this kernel fuses mask/max/exp/normalise in VMEM
per (batch, instance) grid cell — one HBM read of the score map and the
mask, one write of the result.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_NEG = -1e30


def _kernel(e_ref, m_ref, out_ref):
    e = e_ref[0]            # (S, 128)
    m = m_ref[0, 0]         # (S, 128)
    logits = jnp.where(m > 0, e, _NEG)
    mx = jnp.max(logits)
    p = jnp.exp(logits - mx)
    p = jnp.where(m > 0, p, 0.0)
    s = jnp.sum(p)
    inv = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    out_ref[0, 0] = p * inv


def masked_softmax_pallas(
    e: jnp.ndarray,      # (B, HW) score map
    mask: jnp.ndarray,   # (B, HW, N) {0,1} per-instance masks
    interpret=None,
) -> jnp.ndarray:
    """Returns (B, HW, N): per-instance softmax over masked pixels (empty
    instances -> all-zero), matching the jnp reference in
    ``tpuseg.nn.attention.HardAttention``."""
    b, hw = e.shape
    n = mask.shape[-1]
    hw_pad = (hw + _LANES - 1) // _LANES * _LANES
    s = hw_pad // _LANES
    e_p = jnp.pad(e, ((0, 0), (0, hw_pad - hw))).reshape(b, s, _LANES)
    m_p = jnp.pad(
        mask.astype(e.dtype), ((0, 0), (0, hw_pad - hw), (0, 0))
    ).transpose(0, 2, 1).reshape(b, n, s, _LANES)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    out = pl.pallas_call(
        _kernel,
        grid=(b, n),
        in_specs=[
            pl.BlockSpec((1, s, _LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, _LANES), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, s, _LANES), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, s, _LANES), e.dtype),
        interpret=interpret,
    )(e_p, m_p)
    return out.reshape(b, n, hw_pad)[:, :, :hw].transpose(0, 2, 1)
