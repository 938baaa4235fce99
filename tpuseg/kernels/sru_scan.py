"""Pallas TPU kernel for the SRU elementwise recurrence.

The TPU equivalent of the reference's native kernels
(``sru_cpu_impl.cpp:55-133`` C++ forward, ``cuda_functional.py:52-112``
CUDA ``sru_fwd``): after the fused GEMM ``U = x @ W`` (left to the MXU via
XLA), the per-timestep elementwise recurrence is a bandwidth-bound scan.
The kernel tiles the fused (batch*hidden) axis across the grid — the
direct analogue of the CUDA kernel's one-thread-per-column layout
(``cuda_functional.py:72-74``) — and each program scans the full time axis
in VMEM, so the whole recurrence is one kernel launch instead of L fused
loop iterations.

Forward/inference only (like the reference's C++ path); training uses the
autodiff'd ``lax.scan`` in ``tpuseg.nn.sru``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(u0, u1, u2, xp, fw, rw, fb, rb, c0, mc, h_ref, cf_ref,
            *, length: int, activation: int, has_skip: bool):
    # All intermediates stay 2-D (1, LANES): Mosaic requires >= 2-D
    # vector layouts (1-D slices crash the layout pass).
    act = {0: lambda c: c, 1: jnp.tanh, 2: lambda c: jnp.maximum(c, 0.0)}[
        activation
    ]
    fwv = fw[0:1, :]
    rwv = rw[0:1, :]
    fbv = fb[0:1, :]
    rbv = rb[0:1, :]
    mcv = mc[0:1, :]

    def body(t, c):
        u0_t = u0[pl.ds(t, 1), :]
        u1_t = u1[pl.ds(t, 1), :]
        u2_t = u2[pl.ds(t, 1), :]
        f_t = jax.nn.sigmoid(u1_t + fbv + c * fwv)
        r_t = jax.nn.sigmoid(u2_t + rbv + c * rwv)
        c_t = u0_t + (c - u0_t) * f_t
        g = act(c_t) * mcv
        if has_skip:
            xp_t = xp[pl.ds(t, 1), :]
            h_t = xp_t + (g - xp_t) * r_t
        else:
            h_t = g * r_t
        h_ref[pl.ds(t, 1), :] = h_t
        return c_t

    c_final = jax.lax.fori_loop(0, length, body, c0[0:1, :])
    cf_ref[0:1, :] = c_final


def sru_scan_pallas(
    u: jnp.ndarray,         # (L, B, d*k)
    x: jnp.ndarray,         # (L, B, n_in)
    weight_c: jnp.ndarray,  # (2d,)
    bias: jnp.ndarray,      # (2d,)
    c0: jnp.ndarray,        # (B, d)
    d: int,
    activation: int = 0,
    has_skip_term: bool = True,
    scale_x: float = 1.0,
    mask_c: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unidirectional SRU recurrence. Returns (h (L,B,d), c_final (B,d))."""
    length, batch = u.shape[0], u.shape[1]
    k = u.shape[-1] // d
    u5 = u.reshape(length, batch, d, k)
    u0 = u5[..., 0].reshape(length, batch * d)
    u1 = u5[..., 1].reshape(length, batch * d)
    u2 = u5[..., 2].reshape(length, batch * d)
    if not has_skip_term:
        xp = jnp.zeros_like(u0)
    elif k == 3:
        xp = (x * scale_x).reshape(length, batch * d)
    else:
        xp = u5[..., 3].reshape(length, batch * d)

    n = batch * d
    n_pad = _round_up(n, _LANES)
    l_pad = _round_up(max(length, 1), 8)

    def pad2(a):
        return jnp.pad(a, ((0, l_pad - length), (0, n_pad - n)))

    def pad_vec(v):  # (d,) broadcast over batch -> (1, n_pad)
        vv = jnp.tile(v, batch)
        return jnp.pad(vv, (0, n_pad - n)).reshape(1, n_pad)

    fw, rw = weight_c[:d], weight_c[d:]
    fb, rb = bias[:d], bias[d:]
    c0p = jnp.pad(c0.reshape(-1), (0, n_pad - n)).reshape(1, n_pad)
    mc = (
        jnp.ones((1, n_pad), u.dtype)
        if mask_c is None
        else jnp.pad(mask_c.reshape(-1), (0, n_pad - n)).reshape(1, n_pad)
    )

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    grid = (n_pad // _LANES,)
    mat_spec = pl.BlockSpec(
        (l_pad, _LANES), lambda j: (0, j), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec(
        (1, _LANES), lambda j: (0, j), memory_space=pltpu.VMEM
    )
    h, cf = pl.pallas_call(
        functools.partial(
            _kernel, length=length, activation=activation,
            has_skip=has_skip_term,
        ),
        grid=grid,
        in_specs=[mat_spec, mat_spec, mat_spec, mat_spec,
                  vec_spec, vec_spec, vec_spec, vec_spec, vec_spec, vec_spec],
        out_specs=[mat_spec, vec_spec],
        out_shape=[
            jax.ShapeDtypeStruct((l_pad, n_pad), u.dtype),
            jax.ShapeDtypeStruct((1, n_pad), u.dtype),
        ],
        interpret=interpret,
    )(pad2(u0), pad2(u1), pad2(u2), pad2(xp),
      pad_vec(fw), pad_vec(rw), pad_vec(fb), pad_vec(rb), c0p, mc)
    h = h[:length, :n].reshape(length, batch, d)
    c_final = cf[0, :n].reshape(batch, d)
    return h, c_final
