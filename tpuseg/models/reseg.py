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


# GT density values are ~1/instance_area (1e-4..1e-3); scaling both the
# target and the head's output keeps the regression in a well-conditioned
# range.  count = sum(density) / DENSITY_SCALE.
DENSITY_SCALE = 256.0


class _DensityHead(nn.Module):
    """Density-regression counting head (per-pixel density, unit mass per
    GT instance; count = integral of the map).

    Density regression is the standard strong architecture for leaf
    counting — a globally-pooled classifier (``_CountHead``) has to count
    through one average vector, while the density integral accumulates
    evidence per instance.  Operates at 1/4 resolution on the UNet
    1/4+1/8 skip scales (a full-res head's 5-px receptive field cannot
    see a 40-px leaf; the mid scales can) behind a ``stop_gradient`` so
    the head trains without perturbing the segmentation backbone (the
    reference hardcodes ``n_objects_prediction = 16``, model.py:496 —
    there is no analogue).
    """

    hidden: int = 128
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, skips):
        # skips[2] = 1/4 res, skips[3] = 1/8 res (both UNet skip layouts)
        x3 = jax.lax.stop_gradient(skips[2])
        x4 = jax.lax.stop_gradient(skips[3])
        x4u = jnp.repeat(jnp.repeat(x4, 2, axis=1), 2, axis=2)
        y = jnp.concatenate([x3, x4u], axis=-1)
        y = nn.Conv(self.hidden, (3, 3), padding=1, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.hidden // 2, (3, 3), padding=1, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(1, (1, 1), dtype=jnp.float32)(y)
        # scaled density >= 0 at 1/4 res; the integral is scale-free
        dens = jax.nn.softplus(y.astype(jnp.float32))
        # affine output calibration in COUNT units: integral of the
        # returned map = gain * integral(dens) + off * DENSITY_SCALE.
        # Trained like any param; tools/train_density.py also folds a
        # closed-form post-fit (least squares on the val counts) into
        # these two scalars, removing the head's systematic count bias
        # without touching the map shape.
        gain = self.param("out_gain", nn.initializers.ones, (1,))
        off = self.param("out_off", nn.initializers.zeros, (1,))
        b, h, w, _ = dens.shape
        return dens * gain + off * (DENSITY_SCALE / float(h * w))


def pool_density(gt: jnp.ndarray, dh: int, dw: int) -> jnp.ndarray:
    """Mass-preserving sum-pool of a (B,H,W,1) density map onto the head's
    (dh, dw) grid."""
    b, h, w, _ = gt.shape
    fh, fw = h // dh, w // dw
    return gt.reshape(b, dh, fh, dw, fw, 1).sum(axis=(2, 4))


def density_target(ins_target, n_objects):
    """(B,H,W,N) instance masks + (B,) counts -> (B,H,W,1) scaled GT
    density: each valid instance's mask normalized to unit mass."""
    masks = ins_target.astype(jnp.float32)
    areas = jnp.sum(masks, axis=(1, 2))                       # (B, N)
    n_slots = masks.shape[-1]
    valid = (
        jnp.arange(n_slots)[None, :] < n_objects[:, None]
    ) & (areas > 0)
    w = jnp.where(valid, DENSITY_SCALE / jnp.maximum(areas, 1.0), 0.0)
    return jnp.einsum("bhwn,bn->bhw", masks, w)[..., None]


def density_count(density):
    """(B,H,W,1) scaled density map -> (B,) rounded count estimate."""
    return jnp.round(
        jnp.sum(density.astype(jnp.float32), axis=(1, 2, 3)) / DENSITY_SCALE
    ).astype(jnp.int32)


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
        aux: Optional[Dict[str, Any]] = None,
    ):
        """images: (B, H, W, 21) standardized inputs (NHWC).

        mode='loss' requires sem_onehot (B,H,W,C), ins_target (B,H,W,N),
        n_objects (B,); returns (sem_logits, sem_mask, decoder_losses).
        mode='infer' returns (sem_probs, idmap, n_objects_pred).
        mode='semantic' returns sem_probs only.
        """
        cfg = self.cfg
        decoder = InstanceDecoder(
            cfg=cfg.decoder,
            max_n_objects=cfg.data.max_n_objects,
            dtype=self.dtype,
            extract_loop=self.extract_loop,
            name="decoder",
        )
        if mode == "loss_tail":
            # stage B of the hoisted train step (runtime/train.py): the
            # backbone/stem/head outputs arrive precomputed via ``aux``
            # from the mode='loss_prep' apply — only the attend + glimpse
            # scan runs here.  Gradients flow through both applies (they
            # execute inside one jitted loss_fn).
            sem_logits = aux["sem_logits"]
            sem_mask = aux["sem_mask"]
            x_enc = aux["x_enc"]
            skips = list(aux["skips"])
            count_logits = aux.get("count_logits")
            density = aux.get("density")
        else:
            x_dec, skips, sem_logits = self._backbone(images, train)

            if mode == "semantic":
                return jax.nn.softmax(sem_logits, axis=-1)

            x_enc = _InsStem(
                cfg.decoder.d_model, dtype=self.dtype, name="ins_stem"
            )(x_dec, train)
            count_logits = None
            if cfg.model.use_count_head:
                count_logits = _CountHead(
                    n_classes=cfg.model.count_classes, dtype=self.dtype,
                    name="count_head",
                )(skips[-1])
            density = None
            if cfg.model.use_density_head:
                density = _DensityHead(dtype=self.dtype, name="density_head")(
                    skips
                )

        if mode == "loss_prep":
            # stage A of the hoisted train step: everything
            # glimpse-independent EXCEPT the attend (which needs the
            # instance targets and mutates its BN stats inside the loss
            # apply) — backbone, stem, counting heads, plus ONE train-mode
            # evaluation of the decoder's skip-feature transforms.
            sem_mask = jnp.argmax(sem_onehot, axis=-1)[..., None]
            sem_mask = sem_mask.astype(jnp.float32)
            skips_t = decoder(
                x_enc, sem_mask, feats=skips, train=train, mode="skips"
            )
            return {
                "sem_logits": sem_logits,
                "sem_mask": sem_mask,
                "x_enc": x_enc,
                "skips": tuple(skips),
                "skips_t": tuple(skips_t),
                "count_logits": count_logits,
                "density": density,
            }

        if mode == "density":
            # head-training / diagnosis path: backbone + density map only
            # (no decoder pass — the REINFORCE glimpse loop is ~10x the
            # backbone cost and irrelevant to the counting head)
            return density

        if mode == "debug":
            # periodic debug-image dumps during training (reference
            # attenet2.py:247-251): GT semantic mask like the loss path,
            # one argmax glimpse on instance slot 0
            sem_mask = jnp.argmax(sem_onehot, axis=-1)[..., None]
            sem_mask = sem_mask.astype(jnp.float32)
            out = decoder(
                x_enc, sem_mask, target=ins_target, feats=skips,
                mode="debug",
            )
            out["sem_mask"] = sem_mask
            return out

        if mode in ("loss", "loss_tail"):
            # GT semantic argmax as the decoder mask whenever labels are
            # given — the reference's 4-arg branch applies to BOTH train
            # and validation minibatches (reseg.py:117-120); the predicted
            # mask is only used on the label-free inference path.
            if mode == "loss":
                sem_mask = jnp.argmax(sem_onehot, axis=-1)[..., None]
                sem_mask = sem_mask.astype(jnp.float32)
                skips_t = None
            else:
                # hoisted path: stage A already computed the mask and the
                # skip transforms (cfg.hoist_skips_train)
                skips_t = aux.get("skips_t")
            losses = decoder(
                x_enc, sem_mask, ins_target, n_objects, skips, train=train,
                mode="loss", skips_t=skips_t,
            )
            if count_logits is not None:
                losses["count_logits"] = count_logits
            if density is not None:
                # loss computed here (ins_target lives in this scope):
                # scaled-MSE on the map + smooth count consistency
                gt = pool_density(
                    density_target(ins_target, n_objects),
                    density.shape[1], density.shape[2],
                )
                # npix/16 normalization keeps the map term at the
                # full-res-head magnitude (1/4-res pixels carry 16x the
                # mass); lambda_density further rebalances it against the
                # decoder/semantic terms so a fresh-init head cannot eat
                # the global grad-norm clip budget (observed: grad_norm
                # 2e6 at init rescales EVERY other gradient to ~nothing)
                losses["density_loss"] = jnp.mean(
                    jnp.square(density - gt)
                ) * float(gt.shape[1] * gt.shape[2] / 16.0)
                est = (
                    jnp.sum(density, axis=(1, 2, 3)) / DENSITY_SCALE
                )
                losses["density_count_loss"] = jnp.mean(
                    jnp.square(est - n_objects.astype(jnp.float32))
                )
                losses["density_count"] = est
            return sem_logits, sem_mask, losses

        if mode == "embed":
            # the embedding/discriminative lineage (prediction.py:52-85):
            # per-pixel instance embeddings for KMeans clustering, plus the
            # count-head estimate standing in for the reference's
            # hardcoded ``n_objects=16`` (model.py:496)
            sem_probs = jax.nn.softmax(sem_logits, axis=-1)
            if density is not None:
                n_est = density_count(density)
            elif count_logits is not None:
                n_est = jnp.argmax(count_logits, axis=-1).astype(jnp.int32)
            else:
                n_est = jnp.full((images.shape[0],), 16, jnp.int32)
            return sem_probs, x_enc, n_est

        if mode in ("infer", "infer_prep"):
            sem_probs = jax.nn.softmax(sem_logits, axis=-1)
            sem_mask = jnp.argmax(sem_logits, axis=-1)[..., None].astype(
                jnp.float32
            )
            k_cap = max_instances or cfg.data.max_n_objects
            count_budget = None
            if density is not None:
                # density integral supersedes the classifier as the
                # extraction-budget source (stronger counting signal)
                count_budget = jnp.clip(density_count(density), 1, k_cap)
            elif count_logits is not None:
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
