"""SRU (Simple Recurrent Unit) — Lei et al., "Simple Recurrent Units for
Highly Parallelizable Recurrence".

Reference: ``code/lib/archs/modules/sru/`` — ``sru_functional.py`` (python
scan + cell/stack modules), ``sru_cpu_impl.cpp`` (C++ inference forward),
``cuda_functional.py`` (CUDA kernels).  The reference vendors it as a
capability (nothing imports it from the live model path; SURVEY.md §2.7).

TPU-native mapping: the fused 3/4-way GEMM ``U = x @ W`` stays an XLA
matmul (MXU); the elementwise recurrence over time is
  * ``sru_recurrence`` — a ``jax.lax.scan`` (always available, autodiff'd),
  * ``tpuseg.kernels.sru_scan`` — a Pallas TPU kernel for the scan,
  * ``native/sru_cpu.cpp`` — a C++ host kernel (the reference's
    ``cpu_forward`` capability) used via ctypes for CPU inference.

Recurrence (sru_cpu_impl.cpp:117-127 / sru_functional.py:153-176):
  f_t = sigmoid(u1_t + fb + c_{t-1} * fw)
  r_t = sigmoid(u2_t + rb + c_{t-1} * rw)
  c_t = u0_t + (c_{t-1} - u0_t) * f_t
  h_t = x'_t + (g(c_t) * mask_c - x'_t) * r_t        (with skip term)
      = g(c_t) * mask_c * r_t                         (without)
where x' = u3 (k=4) or x * scale_x (k=3), g = id/tanh/relu.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

_ACTS = {0: lambda c: c, 1: jnp.tanh, 2: jax.nn.relu}


def _sru_dir(
    u: jnp.ndarray,        # (L, B, d, k)
    x_prime,               # (L, B, d) or None
    fw, rw, fb, rb,        # (d,)
    c0: jnp.ndarray,       # (B, d)
    activation: int,
    mask_pad,              # (L, B, 1) or None; 1 = padded step
    mask_c,                # (B, d) or scalar 1
    reverse: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    act = _ACTS[activation]

    def step(c_prev, inp):
        u_t, xp_t, mp_t = inp
        f_t = jax.nn.sigmoid(u_t[..., 1] + fb + c_prev * fw)
        r_t = jax.nn.sigmoid(u_t[..., 2] + rb + c_prev * rw)
        c_t = u_t[..., 0] + (c_prev - u_t[..., 0]) * f_t
        if mp_t is not None:
            c_t = c_t * (1 - mp_t) + c_prev * mp_t
        g = act(c_t)
        if xp_t is not None:
            h_t = xp_t + (g * mask_c - xp_t) * r_t
        else:
            h_t = g * mask_c * r_t
        if mp_t is not None:
            h_t = h_t * (1 - mp_t)
        return c_t, h_t

    xs = (u, x_prime, mask_pad)
    # scan requires uniform pytrees; drop None leaves
    def step_wrap(c, packed):
        u_t = packed["u"]
        xp_t = packed.get("xp")
        mp_t = packed.get("mp")
        return step(c, (u_t, xp_t, mp_t))

    packed = {"u": u}
    if x_prime is not None:
        packed["xp"] = x_prime
    if mask_pad is not None:
        packed["mp"] = mask_pad
    c_final, h = jax.lax.scan(step_wrap, c0, packed, reverse=reverse)
    return h, c_final


def sru_recurrence(
    u: jnp.ndarray,         # (L, B, bidir*d*k)
    x: jnp.ndarray,         # (L, B, n_in)
    weight_c: jnp.ndarray,  # (2*bidir*d,)
    bias: jnp.ndarray,      # (2*bidir*d,)
    c0: Optional[jnp.ndarray] = None,   # (B, bidir*d)
    d: int = 0,
    activation: int = 0,
    bidirectional: bool = False,
    has_skip_term: bool = True,
    scale_x: float = 1.0,
    mask_pad: Optional[jnp.ndarray] = None,  # (L, B)
    mask_c: Optional[jnp.ndarray] = None,    # (B, bidir*d)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (h (L, B, bidir*d), c_final (B, bidir*d))."""
    length, batch = x.shape[0], x.shape[1]
    bidir = 2 if bidirectional else 1
    k = u.shape[-1] // d // bidir
    u = u.reshape(length, batch, bidir, d, k)
    wc = weight_c.reshape(2, bidir, d)
    b = bias.reshape(2, bidir, d)
    if c0 is None:
        c0 = jnp.zeros((batch, bidir * d), u.dtype)
    c0 = c0.reshape(batch, bidir, d)
    mp = None if mask_pad is None else mask_pad.reshape(length, batch, 1).astype(u.dtype)

    if not has_skip_term:
        x_prime_all = None
    elif k == 3:
        xp = x.reshape(length, batch, bidir, d)
        x_prime_all = xp * scale_x if scale_x != 1 else xp
    else:
        x_prime_all = u[..., 3]

    hs, cs = [], []
    for di in range(bidir):
        mc = 1.0 if mask_c is None else mask_c.reshape(batch, bidir, d)[:, di]
        h, c = _sru_dir(
            u[:, :, di], None if x_prime_all is None else x_prime_all[:, :, di],
            wc[0, di], wc[1, di], b[0, di], b[1, di], c0[:, di],
            activation, mp, mc, reverse=(di == 1),
        )
        hs.append(h)
        cs.append(c)
    h = jnp.stack(hs, axis=2).reshape(length, batch, bidir * d)
    c_final = jnp.stack(cs, axis=1).reshape(batch, bidir * d)
    return h, c_final


class SRUCell(nn.Module):
    """One SRU layer (reference ``SRUCell``, sru_functional.py:184-439),
    with the same init recipe: uniform(+-sqrt(3/d)) weights, sqrt(0.5)
    rescale of the gate columns and weight_c, highway-bias offset, and the
    ``scale_x = sqrt(1+2e^b)`` highway rescale."""

    n_in: int
    n_out: int
    dropout: float = 0.0
    rnn_dropout: float = 0.0
    bidirectional: bool = False
    n_proj: int = 0
    activation: int = 0  # 0 id, 1 tanh, 2 relu
    highway_bias: float = 0.0
    has_skip_term: bool = True
    rescale: bool = True
    use_impl: str = "scan"  # "scan" | "pallas"

    def _k(self) -> int:
        out_size = self.n_out * 2 if self.bidirectional else self.n_out
        return 4 if self.has_skip_term and self.n_in != out_size else 3

    @property
    def scale_x(self) -> float:
        if not self.rescale:
            return 1.0
        return (1 + math.exp(self.highway_bias) * 2) ** 0.5

    @nn.compact
    def __call__(self, x, c0=None, mask_pad=None, train: bool = False):
        """x: (L, B, n_in). Returns (h (L, B, bidir*n_out), c_final)."""
        n_in, n_out = self.n_in, self.n_out
        bidir = 2 if self.bidirectional else 1
        k = self._k()
        size_per_dir = n_out * k
        proj = self.n_proj if (0 < self.n_proj < min(n_in, n_out)) else 0
        w_rows = proj if proj else n_in

        def weight_init(key, shape, dtype=jnp.float32):
            d_ = shape[0]
            val = (3.0 / d_) ** 0.5
            w = jax.random.uniform(key, shape, dtype, -val, val)
            w4 = w.reshape(d_, -1, n_out, k)
            scale = jnp.ones((k,), dtype)
            scale = scale.at[1].set(0.5**0.5).at[2].set(0.5**0.5)
            if self.rescale and k == 4:
                scale = scale.at[3].set(self.scale_x)
            if self.rescale and self.dropout > 0:
                scale = scale.at[0].multiply((1 - self.dropout) ** 0.5)
            w4 = w4 * scale
            if self.rescale and self.rnn_dropout > 0:
                w4 = w4 * (1 - self.rnn_dropout) ** 0.5
            return w4.reshape(shape)

        def wc_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(
                key, shape, dtype, -(3.0**0.5), 3.0**0.5
            ) * (0.5**0.5)

        def bias_init(key, shape, dtype=jnp.float32):
            b = jnp.zeros(shape, dtype)
            half = shape[0] // 2
            return b.at[half:].set(self.highway_bias)

        weight = self.param("weight", weight_init, (w_rows, size_per_dir * bidir))
        weight_c = self.param("weight_c", wc_init, (n_out * 2 * bidir,))
        bias = self.param("bias", bias_init, (n_out * 2 * bidir,))
        if proj:
            wp_val = (3.0 / n_in) ** 0.5
            weight_proj = self.param(
                "weight_proj",
                lambda key, s: jax.random.uniform(key, s, jnp.float32, -wp_val, wp_val),
                (n_in, proj),
            )

        length, batch = x.shape[0], x.shape[1]
        xin = x
        if train and self.rnn_dropout > 0:
            keep = 1 - self.rnn_dropout
            m = jax.random.bernoulli(
                self.make_rng("dropout"), keep, (batch, n_in)
            ).astype(x.dtype) / keep
            xin = x * m[None]
        x2d = xin.reshape(-1, n_in)
        if proj:
            u = (x2d @ weight_proj) @ weight
        else:
            u = x2d @ weight
        u = u.reshape(length, batch, -1)

        mask_c = None
        if train and self.dropout > 0:
            keep = 1 - self.dropout
            mask_c = jax.random.bernoulli(
                self.make_rng("dropout"), keep, (batch, n_out * bidir)
            ).astype(x.dtype) / keep

        if self.use_impl == "pallas" and mask_pad is None:
            # differentiable fused Pallas path, uni or bi (the reference's
            # SRU_Compute_GPU forward/backward pair,
            # cuda_functional.py:488-609); mask_pad stays on the scan path.
            from tpuseg.kernels.sru_scan import sru_scan_fused

            nd = n_out * bidir
            h, c = sru_scan_fused(
                u, x, weight_c, bias,
                c0 if c0 is not None else jnp.zeros((batch, nd), x.dtype),
                mask_c if mask_c is not None
                else jnp.ones((batch, nd), x.dtype),
                n_out, self.activation, self.bidirectional,
                self.has_skip_term, self.scale_x,
            )
            return h, c
        return sru_recurrence(
            u, x, weight_c, bias, c0, d=n_out, activation=self.activation,
            bidirectional=self.bidirectional,
            has_skip_term=self.has_skip_term, scale_x=self.scale_x,
            mask_pad=mask_pad, mask_c=mask_c,
        )


class SRU(nn.Module):
    """Multi-layer SRU stack (reference ``SRU``, sru_functional.py:442-572)."""

    input_size: int
    hidden_size: int
    num_layers: int = 2
    dropout: float = 0.0
    rnn_dropout: float = 0.0
    bidirectional: bool = False
    n_proj: int = 0
    activation: int = 0
    highway_bias: float = 0.0
    use_layer_norm: bool = False
    use_impl: str = "scan"

    @nn.compact
    def __call__(self, x, c0=None, mask_pad=None, train: bool = False):
        bidir = 2 if self.bidirectional else 1
        cs = []
        h = x
        for i in range(self.num_layers):
            cell = SRUCell(
                n_in=self.input_size if i == 0 else self.hidden_size * bidir,
                n_out=self.hidden_size,
                dropout=self.dropout,
                rnn_dropout=self.rnn_dropout,
                bidirectional=self.bidirectional,
                n_proj=self.n_proj,
                activation=self.activation,
                highway_bias=self.highway_bias,
                use_impl=self.use_impl,
                name=f"cell{i}",
            )
            ci = None if c0 is None else c0[i]
            h, c = cell(h, ci, mask_pad, train)
            if self.use_layer_norm:
                h = nn.LayerNorm(name=f"ln{i}")(h)
            cs.append(c)
        return h, jnp.stack(cs)
