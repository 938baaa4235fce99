"""Attention layers and masked batch-norm (NHWC, flax.linen).

Reference: ``code/lib/archs/modules/utils.py`` —
``AttentionLayer`` (SE, :402-420), ``ChannelAttentionLayer`` (:422-454),
``SpatialAttentionLayer`` (:457-523), ``maskBN`` (:529-611),
``HardAttentionLayer`` (:613-663).

TPU redesign notes:
  * masked softmaxes use ``where(-inf)`` + a NaN-free renormalisation
    (the reference scrubs NaNs after the fact, ``utils.py:655``);
  * the per-instance hard-attention softmax is one batched softmax over the
    padded (B, HW, N) tensor instead of the reference's expand+masked_fill;
  * all device placement is implicit (no import-time CUDA grids,
    cf. ``utils.py:11-13``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def avg_pool_3x3_same(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 average pooling with zero padding, divisor fixed at 9
    (torch AvgPool2d count_include_pad=True semantics)."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))


class SqueezeExcite(nn.Module):
    """SE block (reference ``AttentionLayer``, utils.py:402-420)."""

    reduction: int = 2
    multiply: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(c // self.reduction, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Dense(c, dtype=self.dtype)(y)
        y = jax.nn.sigmoid(y)[:, None, None, :]
        return x * y if self.multiply else y


class ChannelAttention(nn.Module):
    """Masked channel attention (reference ``ChannelAttentionLayer``,
    utils.py:422-454)."""

    d_model: int
    reduction: int = 2
    multiply: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, base, y, h_t=None, train: bool = False):
        b, h, w, c = base.shape
        pooled = jnp.mean(base * y, axis=(1, 2))  # (b, c)
        z = nn.Dense(self.d_model // self.reduction, dtype=self.dtype)(pooled)
        if h_t is not None:
            z = z + nn.Dense(
                self.d_model // self.reduction, use_bias=False, dtype=self.dtype
            )(h_t)
        z = jnp.tanh(z)
        z = nn.Dense(self.d_model, dtype=self.dtype)(z)
        alpha = jax.nn.softmax(z, axis=1) * self.d_model
        if not self.multiply:
            return alpha
        paste = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )(base * alpha[:, None, None, :])
        return base + paste


class SpatialAttention(nn.Module):
    """Masked spatial softmax attention with add-paste residual
    (reference ``SpatialAttentionLayer``, utils.py:457-523).

    Live-path semantics (``attenet2.py:374``): h_t defaults to the masked
    spatial mean, beta is a foreground-masked softmax scaled by the
    foreground pixel count, and the BN'd attention paste is added back.
    """

    d_model: int
    reduction: int = 2
    multiply: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, base, y, h_t=None, use_sigmoid: bool = False,
        decoder: bool = False, train: bool = False,
    ):
        b, h, w, c = base.shape
        masked = base * y
        z = nn.Conv(self.d_model // self.reduction, (1, 1), dtype=self.dtype)(masked)
        if h_t is None:
            h_t = jnp.mean(masked.reshape(b, h * w, c), axis=1)  # /HW, as reference
        h_t = nn.Dense(
            self.d_model // self.reduction, use_bias=False, dtype=self.dtype
        )(h_t)
        z = z + h_t[:, None, None, :]
        beta = nn.Conv(1, (1, 1), dtype=self.dtype)(jnp.tanh(z))  # (b,h,w,1)
        if use_sigmoid:
            beta = jax.nn.sigmoid(beta)
        else:
            if not decoder:
                logits = jnp.where(y > 0, beta, _NEG_INF).reshape(b, -1)
                y_sum = jnp.sum(y, axis=(1, 2, 3)).reshape(b, 1)
                p = jax.nn.softmax(logits, axis=1)
                # empty-mask guard (reference would NaN here)
                p = jnp.where(y_sum > 0, p, 0.0)
                beta = (p * y_sum).reshape(b, h, w, 1)
            else:
                beta = jax.nn.softmax(beta.reshape(b, -1), axis=1).reshape(
                    b, h, w, 1
                ) * (h * w)
        if not self.multiply:
            return beta
        paste = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )(base * beta)
        return base + paste * y


class MaskedBatchNorm(nn.Module):
    """Batch-norm whose statistics only see mask=1 pixels.

    Reference ``maskBN`` (utils.py:529-611): per-channel mean/var are the
    batch average of per-sample masked moments (denominator ``|mask|+1``),
    normalisation is applied to *all* pixels, and running stats follow the
    reference's (reversed-EMA) update ``running = momentum*running +
    (1-momentum)*batch`` with momentum=0.1 — i.e. running stats track the
    latest batch closely.  That reversed convention is preserved because
    eval-time behaviour depends on it.
    """

    momentum: float = 0.1
    eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        b, h, w, c = x.shape
        scale = self.param("scale", nn.initializers.uniform(1.0), (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if train:
            m = jnp.broadcast_to(mask, x.shape).astype(jnp.float32)
            xf = x.astype(jnp.float32)
            cnt = jnp.sum(m.reshape(b, -1, c)[:, :, 0], axis=1) + 1.0  # (b,)
            mean = jnp.mean(
                jnp.sum(xf * m, axis=(1, 2)) / cnt[:, None], axis=0
            )  # (c,)
            sq = (xf - mean) ** 2
            var = jnp.mean(jnp.sum(sq * m, axis=(1, 2)) / cnt[:, None], axis=0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
            use_mean, use_var = mean, var
        else:
            use_mean, use_var = ra_mean.value, ra_var.value
        y = (x - use_mean) * jax.lax.rsqrt(use_var + self.eps)
        return y * scale + bias


class HardAttention(nn.Module):
    """Per-instance hard-attention distribution head.

    Reference ``HardAttentionLayer`` (utils.py:613-663): smooth features,
    project to a 1-channel score map, masked-BN against the semantic mask,
    smooth again, then per-instance foreground-masked softmax over pixels.

    Returns (per_instance (B,H,W,N) softmax maps with empty instances
    zeroed, raw merged map (B,H,W,1)).
    """

    d_k: int = 12
    use_pallas: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, s, sem_seg, ins_seg, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, h, w, _ = s.shape
        n = ins_seg.shape[-1]
        s = avg_pool_3x3_same(s)
        e = nn.Conv(self.d_k, (1, 1), dtype=self.dtype)(s)
        e = jnp.tanh(e)
        e = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype)(e)
        e = MaskedBatchNorm(dtype=self.dtype)(e, sem_seg, train)
        e = avg_pool_3x3_same(e) * sem_seg  # (b,h,w,1)

        ins = ins_seg.astype(jnp.float32)
        if self.use_pallas:
            from tpuseg.kernels.masked_softmax import masked_softmax_pallas

            p = masked_softmax_pallas(
                e.reshape(b, h * w).astype(jnp.float32),
                ins.reshape(b, h * w, n),
            ).reshape(b, h, w, n)
            return p, e
        logits = jnp.where(ins > 0, e.astype(jnp.float32), _NEG_INF).reshape(
            b, h * w, n
        )
        p = jax.nn.softmax(logits, axis=1)
        # zero out empty instances (reference NaN-scrub, utils.py:655)
        nonempty = jnp.sum(ins.reshape(b, h * w, n), axis=1, keepdims=True) > 0
        p = jnp.where(nonempty, p, 0.0)
        return p.reshape(b, h, w, n), e
