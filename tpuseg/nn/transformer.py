"""Transformer attention stack (legacy atteNet lineage — capability).

Reference: ``code/lib/archs/modules/utils.py`` — ``MultiHeadAttention``
(:167-226), ``ScaledDotProductAttention`` (:305-329),
``PositionwiseFeedForward`` (:229-246), transformer ``DecoderLayer``
(:138-164), ``_ScalePDAttention`` 3x3-dilated-window local attention
(:248-303), ``Encoder`` DenseASPP-style stack (:15-46),
``make_position_encoding`` (:332-344), ``NonLocalLayer`` (:905-937).

TPU notes: the 9-way shifted-pad gather of ``_ScalePDAttention`` maps to a
stacked ``jnp.roll``-free pad+slice (static shapes, fused by XLA); the
per-pixel 9-key attention is batched einsum work on the MXU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_NEG = -1e30


def make_position_encoding(batch: int, length: int, n_units: int,
                           f: float = 10000.0) -> np.ndarray:
    """Sinusoidal PE (reference utils.py:332-344): (B, n_units, L)."""
    assert n_units % 2 == 0
    position = np.broadcast_to(
        np.arange(length)[None, None, :], (batch, n_units // 2, length)
    ).astype(np.float32)
    unit = np.broadcast_to(
        np.arange(n_units // 2)[None, :, None], (batch, n_units // 2, length)
    ).astype(np.float32)
    rad = position / f ** (unit / (n_units // 2))
    return np.concatenate([np.sin(rad), np.cos(rad)], axis=1)


class ScaledDotProductAttention(nn.Module):
    temperature: float
    attn_dropout: float = 0.1

    @nn.compact
    def __call__(self, q, k, v, mask=None, last: bool = False,
                 train: bool = False):
        attn = jnp.einsum("bld,bmd->blm", q, k)
        if last:
            return attn
        attn = attn / self.temperature
        if mask is not None:
            attn = jnp.where(mask > 0, _NEG, attn)
        attn = jax.nn.softmax(attn, axis=2)
        attn = nn.Dropout(self.attn_dropout, deterministic=not train)(attn)
        out = jnp.einsum("blm,bmd->bld", attn, v)
        return out, attn


class MultiHeadAttention(nn.Module):
    """Reference utils.py:167-226 (incl. the 'last' sigmoid-correlation
    branch used by the legacy decoder)."""

    n_head: int
    d_model: int
    d_k: int
    d_v: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, q, k, v, mask=None, last: bool = False,
                 train: bool = False):
        n_head, d_k, d_v = self.n_head, self.d_k, self.d_v
        b, lq, _ = q.shape
        lk = k.shape[1]
        residual = q
        qs = nn.Dense(n_head * d_k, name="w_qs")(q).reshape(b, lq, n_head, d_k)
        ks = nn.Dense(n_head * d_k, name="w_ks")(k).reshape(b, lk, n_head, d_k)
        vs = nn.Dense(n_head * d_v, name="w_vs")(v).reshape(b, lk, n_head, d_v)
        qs = qs.transpose(2, 0, 1, 3).reshape(-1, lq, d_k)
        ks = ks.transpose(2, 0, 1, 3).reshape(-1, lk, d_k)
        vs = vs.transpose(2, 0, 1, 3).reshape(-1, lk, d_v)
        if mask is not None:
            mask = jnp.tile(mask, (n_head, 1, 1))
        attention = ScaledDotProductAttention(
            temperature=self.d_k**0.5, name="attention"
        )
        if not last:
            out, attn = attention(qs, ks, vs, mask=mask, train=train)
            out = out.reshape(n_head, b, lq, d_v).transpose(1, 2, 0, 3)
            out = out.reshape(b, lq, n_head * d_v)
            out = nn.Dense(self.d_model, name="fc")(out)
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
            out = nn.LayerNorm(name="layer_norm")(out + residual)
            return out, attn
        corr = attention(qs, ks, vs, mask=mask, last=True)
        return jax.nn.sigmoid(corr)[:, 0, :], None


class PositionwiseFeedForward(nn.Module):
    """Reference utils.py:229-246."""

    d_in: int
    d_hid: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Dense(self.d_hid, name="w_1")(x)
        y = nn.relu(y)
        y = nn.Dense(self.d_in, name="w_2")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return nn.LayerNorm(name="layer_norm")(y + residual)


class TransformerDecoderLayer(nn.Module):
    """Reference transformer DecoderLayer (utils.py:138-164)."""

    d_model: int
    d_inner: int
    n_head: int
    d_k: int
    d_v: int
    dropout: float = 0.1
    last: bool = False

    @nn.compact
    def __call__(self, dec_input, enc_output, mask, train: bool = False):
        n_head = 1 if self.last else self.n_head
        slf = MultiHeadAttention(
            n_head, self.d_model, self.d_k, self.d_v, self.dropout,
            name="slf_attn",
        )
        enc = MultiHeadAttention(
            n_head, self.d_model, self.d_k, self.d_v, self.dropout,
            name="enc_attn",
        )
        slf_attn_mask = 1 - mask[:, None, :] if mask is not None else None
        out, dec_slf = slf(dec_input, dec_input, dec_input, mask=None,
                           train=train)
        out2 = enc(out, enc_output, enc_output, mask=slf_attn_mask,
                   last=self.last, train=train)
        if self.last:
            return out2[0], dec_slf, None
        out2, dec_enc = out2
        out2 = PositionwiseFeedForward(
            self.d_model, self.d_inner, self.dropout, name="pos_ffn"
        )(out2, train)
        return out2, dec_slf, dec_enc


def _gather9(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """The 9-way shifted-pad neighbourhood gather (utils.py:283-285):
    (B, H, W, C) -> (B, H, W, 9, C) of dilated 3x3 neighbours."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    shifts = []
    for i in range(9):
        r, cc = (i // 3) * d, (i % 3) * d
        shifts.append(xp[:, r : r + h, cc : cc + w, :])
    return jnp.stack(shifts, axis=3)


class ScalePDAttention(nn.Module):
    """Dilated 3x3-window local attention (reference ``_ScalePDAttention``,
    utils.py:248-303): per pixel, attend over its 9 dilated neighbours with
    a mask, multi-head via channel splitting."""

    d_k: int
    d_v: int
    d_model: int
    dilation: int
    n_head: int = 2

    @nn.compact
    def __call__(self, qk, v, nomask=None, train: bool = False):
        b, h, w, c = qk.shape
        nh = self.n_head
        residual = qk
        # split channels into heads: (B*nh, H, W, C/nh)
        def split_heads(t):
            return (
                t.reshape(b, h, w, nh, t.shape[-1] // nh)
                .transpose(0, 3, 1, 2, 4)
                .reshape(b * nh, h, w, t.shape[-1] // nh)
            )

        qk_h = split_heads(qk)
        v_h = split_heads(v)
        qkp = nn.Conv(2 * self.d_k, (1, 1), name="qk_w")(qk_h)
        vp = nn.Conv(self.d_v, (1, 1), name="v_w")(v_h)
        q, k = jnp.split(qkp, 2, axis=-1)
        k9 = _gather9(k, self.dilation)      # (B*nh, H, W, 9, dk)
        v9 = _gather9(vp, self.dilation)     # (B*nh, H, W, 9, dv)
        if nomask is not None:
            nm = jnp.tile(nomask, (nh, 1, 1, 1))  # (B*nh, H, W, 1)
            nm9 = _gather9(nm, self.dilation)[..., 0]  # (B*nh, H, W, 9)
        else:
            nm9 = None
        scale = (qk_h.shape[-1]) ** -0.5
        inner = jnp.einsum("bhwnd,bhwd->bhwn", k9, q) * scale
        if nm9 is not None:
            inner = jnp.where(nm9 > 0, _NEG, inner)
        p = jax.nn.softmax(inner, axis=-1)
        p = jnp.where(jnp.isnan(p), 0.0, p)
        att = jnp.einsum("bhwn,bhwnd->bhwd", p, v9)  # (B*nh, H, W, dv)
        att = (
            att.reshape(b, nh, h, w, self.d_v)
            .transpose(0, 2, 3, 1, 4)
            .reshape(b, h, w, nh * self.d_v)
        )
        out = nn.Conv(self.d_model, (1, 1), name="fc")(att)
        # InstanceNorm(d_model) — per-sample, per-channel spatial norm
        out = nn.GroupNorm(
            num_groups=None, group_size=1, use_bias=False, use_scale=False,
            name="layer_norm",
        )(out + residual)
        return out


class NonLocalLayer(nn.Module):
    """Reference utils.py:905-937 (Dot / Embedded Gaussian / Concatenation)."""

    in_ch: int
    out_ch: int
    mode: str = "Concatenation"

    @nn.compact
    def __call__(self, fmap, x):
        g = nn.Conv(self.out_ch, (1, 1), name="g_net")(fmap)
        i = nn.Dense(self.in_ch, name="sita")(x)  # (B, C)
        js = nn.Conv(self.in_ch, (1, 1), name="fi")(fmap)
        b, h, w, c = js.shape
        if self.mode in ("Dot", "Embedded Gaussian"):
            f = jnp.einsum("bc,bhwc->bhw", i, js)[..., None]
            if self.mode == "Embedded Gaussian":
                f = jnp.exp(f)
        else:
            ii = jnp.broadcast_to(i[:, None, None, :], (b, h, w, c))
            conc = jnp.concatenate([ii, js], axis=-1)
            f = nn.relu(nn.Conv(1, (1, 1), name="F")(conc))
        return f * g + fmap
