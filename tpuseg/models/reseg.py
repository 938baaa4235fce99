"""ReSeg top model: UNet backbone + SE semantic head + instance decoder.

Reference: ``code/lib/archs/reseg.py:12-137``.  The name is historical —
the live backbone is the depthwise UNet (reseg.py:56,61); the semantic head
is an SE channel attention followed by a 1x1 conv (reseg.py:72-75); the
instance stem is a depthwise-separable projection to ``d_model`` channels
plus a bottleneck residual (reseg.py:78-102,122-123).

Forward modes:
  * ``train_or_eval_loss``: mirrors the reference's 4-arg forward — the
    semantic mask fed to the decoder comes from the GT one-hot argmax in
    training and from the prediction at eval (reseg.py:117-120); returns
    semantic logits + the decoder loss dict.
  * ``infer``: semantic logits + per-pixel instance id map + counts — the
    *working* instance inference path (the reference's crashes, SURVEY.md
    quirk #2).
  * ``infer_semantic``: semantic-only path (reference pred.py fg-mask
    usage).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuseg.configs import Config
from tpuseg.decoder.instance import InstanceDecoder
from tpuseg.nn.attention import SqueezeExcite
from tpuseg.nn.blocks import _BN, relu6
from tpuseg.nn.unet import UNet


class _InsStem(nn.Module):
    """Instance-feature stem (reseg.py:78-102): depthwise 3x3 + pointwise
    to d_model, then a 1x1-expand / dw / 1x1-project residual."""

    d_model: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        # ins_seg_output_1
        y = nn.Conv(
            c, (3, 3), padding=1, feature_group_count=c, dtype=self.dtype
        )(x)
        y = _BN(dtype=self.dtype)(y, train)
        y = relu6(y)
        y = nn.Conv(self.d_model, (1, 1), dtype=self.dtype)(y)
        y = _BN(dtype=self.dtype)(y, train)
        y = relu6(y)
        # ins_seg_output_2 (+ residual, reseg.py:123)
        z = nn.Conv(self.d_model * 2, (1, 1), dtype=self.dtype)(y)
        z = _BN(dtype=self.dtype)(z, train)
        z = relu6(z)
        z = nn.Conv(
            self.d_model * 2, (3, 3), padding=1,
            feature_group_count=self.d_model * 2, dtype=self.dtype,
        )(z)
        z = _BN(dtype=self.dtype)(z, train)
        z = relu6(z)
        z = nn.Conv(self.d_model, (1, 1), dtype=self.dtype)(z)
        z = _BN(dtype=self.dtype)(z, train)
        return z + y


class _CountHead(nn.Module):
    """Learned instance-count head on the UNet bottleneck.

    The reference's ReSeg docstring promises a counting output
    (reseg.py:21-22,40) but the implementation hardcodes
    ``n_objects_prediction = 16`` (model.py:496); this head is the real
    thing: global-pooled bottleneck -> MLP -> (max_n+1)-way count logits,
    trained with CE against the GT count and used at inference as the
    per-sample extraction budget.
    """

    n_classes: int
    hidden: int = 128
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x5):
        y = jnp.mean(x5, axis=(1, 2))
        y = nn.Dense(self.hidden, dtype=self.dtype)(y)
        y = nn.relu(y)
        return nn.Dense(self.n_classes, dtype=jnp.float32)(y)


class ReSeg(nn.Module):
    cfg: Config
    dtype: Optional[jnp.dtype] = None
    extract_loop: str = "scan"

    def _backbone(self, images, train):
        x_dec, skips = UNet(
            n_filters=self.cfg.model.n_filters,
            use_encode=self.cfg.decoder.use_encode,
            dtype=self.dtype,
            name="base",
        )(images, train)
        x_att = SqueezeExcite(dtype=self.dtype, name="channel_attend")(x_dec)
        sem_logits = nn.Conv(
            self.cfg.data.n_classes, (1, 1), dtype=self.dtype,
            name="sem_seg_output",
        )(x_att)
        return x_dec, skips, sem_logits

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        sem_onehot: Optional[jnp.ndarray] = None,
        ins_target: Optional[jnp.ndarray] = None,
        n_objects: Optional[jnp.ndarray] = None,
        train: bool = False,
        mode: str = "loss",
        max_instances: Optional[int] = None,
        stop_params: Optional[Tuple] = None,
    ):
        """images: (B, H, W, 21) standardized inputs (NHWC).

        mode='loss' requires sem_onehot (B,H,W,C), ins_target (B,H,W,N),
        n_objects (B,); returns (sem_logits, sem_mask, decoder_losses).
        mode='infer' returns (sem_probs, idmap, n_objects_pred).
        mode='semantic' returns sem_probs only.
        """
        cfg = self.cfg
        x_dec, skips, sem_logits = self._backbone(images, train)

        if mode == "semantic":
            return jax.nn.softmax(sem_logits, axis=-1)

        decoder = InstanceDecoder(
            cfg=cfg.decoder,
            max_n_objects=cfg.data.max_n_objects,
            dtype=self.dtype,
            extract_loop=self.extract_loop,
            name="decoder",
        )
        x_enc = _InsStem(cfg.decoder.d_model, dtype=self.dtype, name="ins_stem")(
            x_dec, train
        )
        count_logits = None
        if cfg.model.use_count_head:
            count_logits = _CountHead(
                n_classes=cfg.model.count_classes, dtype=self.dtype,
                name="count_head",
            )(skips[-1])

        if mode == "loss":
            # GT semantic argmax as the decoder mask whenever labels are
            # given — the reference's 4-arg branch applies to BOTH train
            # and validation minibatches (reseg.py:117-120); the predicted
            # mask is only used on the label-free inference path.
            sem_mask = jnp.argmax(sem_onehot, axis=-1)[..., None]
            sem_mask = sem_mask.astype(jnp.float32)
            losses = decoder(
                x_enc, sem_mask, ins_target, n_objects, skips, train=train,
                mode="loss",
            )
            if count_logits is not None:
                losses["count_logits"] = count_logits
            return sem_logits, sem_mask, losses

        if mode == "embed":
            # the embedding/discriminative lineage (prediction.py:52-85):
            # per-pixel instance embeddings for KMeans clustering, plus the
            # count-head estimate standing in for the reference's
            # hardcoded ``n_objects=16`` (model.py:496)
            sem_probs = jax.nn.softmax(sem_logits, axis=-1)
            n_est = (
                jnp.argmax(count_logits, axis=-1).astype(jnp.int32)
                if count_logits is not None
                else jnp.full((images.shape[0],), 16, jnp.int32)
            )
            return sem_probs, x_enc, n_est

        if mode in ("infer", "infer_prep"):
            sem_probs = jax.nn.softmax(sem_logits, axis=-1)
            sem_mask = jnp.argmax(sem_logits, axis=-1)[..., None].astype(
                jnp.float32
            )
            k_cap = max_instances or cfg.data.max_n_objects
            count_budget = None
            if count_logits is not None:
                # the head's count caps the extraction budget per sample
                count_budget = jnp.clip(
                    jnp.argmax(count_logits, axis=-1).astype(jnp.int32),
                    1, k_cap,
                )
            if mode == "infer_prep":
                # stage A of the staged dispatch (runtime/predict.py):
                # everything glimpse-independent, plus the budget vector
                # the host reads to size stage B's round count
                score, skips_t = decoder(
                    x_enc, sem_mask, feats=skips, mode="prep"
                )
                budget = (
                    count_budget if count_budget is not None
                    else jnp.full((images.shape[0],), k_cap, jnp.int32)
                )
                return sem_probs, sem_mask, budget, score, skips_t
            idmap, counts = decoder(
                x_enc, sem_mask, feats=skips, mode="extract",
                max_instances=max_instances, count_budget=count_budget,
                stop_params=stop_params,
            )
            return sem_probs, idmap, counts

        raise ValueError(mode)
