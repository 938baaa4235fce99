"""jitted train/eval steps.

Mirrors the reference minibatch semantics (``code/lib/model.py:190-284``):
total cost = instance decoder loss + semantic CE + semantic Dice(time=1)
under criterion 'Multi' (model.py:245-269), gradient clipping inside the
optimizer chain, BN stats and the REINFORCE baseline threaded through the
state.

Data parallelism: steps are plain jit functions; under a
``jax.sharding.Mesh`` the caller passes batch arrays sharded along 'data'
and replicated state — XLA inserts the ICI all-reduce for the gradient
mean automatically (SURVEY.md §5.8).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from tpuseg.configs import Config
from tpuseg.data.colorspace import image_ex_standardize
from tpuseg.losses.dice import dice_loss
from tpuseg.losses.focal import softmax_cross_entropy
from tpuseg.runtime.state import TrainState


def prepare_images(images: jnp.ndarray) -> jnp.ndarray:
    """On-device preprocessing: raw uint8 RGB batches are expanded to the
    21-channel standardized representation inside the jitted step; already
    expanded inputs pass through."""
    if images.shape[-1] == 3:
        return image_ex_standardize(images)
    return images


def total_cost(
    cfg: Config, sem_logits, sem_onehot, dec_losses, train: bool,
    n_objects=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """ins cost + CE + Dice per criterion 'Multi' (model.py:245-269),
    plus the count-head CE (new capability, no reference analogue)."""
    metrics: Dict[str, jnp.ndarray] = {}
    cost = 0.0
    if dec_losses is not None:
        cost = cost + dec_losses["loss"]
        metrics["ins_cost"] = dec_losses["loss"]
        metrics["criterion"] = dec_losses["criterion"]
        metrics["ins_ce_loss"] = dec_losses["ins_ce_loss"]
        metrics["ins_dice_loss"] = dec_losses["ins_dice_loss"]
        if "count_logits" in dec_losses and n_objects is not None:
            count_labels = jnp.clip(
                n_objects.astype(jnp.int32), 0,
                dec_losses["count_logits"].shape[-1] - 1,
            )
            count_ce = softmax_cross_entropy(
                dec_losses["count_logits"], count_labels
            )
            cost = cost + cfg.train.lambda_count * count_ce
            metrics["count_loss"] = count_ce
            metrics["count_err"] = jnp.mean(
                jnp.abs(
                    jnp.argmax(dec_losses["count_logits"], axis=-1)
                    - n_objects
                ).astype(jnp.float32)
            )
        if "density_loss" in dec_losses:
            dl = (
                dec_losses["density_loss"]
                + 0.1 * dec_losses["density_count_loss"]
            )
            cost = cost + cfg.train.lambda_density * dl
            metrics["density_loss"] = dl
            if n_objects is not None:
                metrics["density_err"] = jnp.mean(
                    jnp.abs(
                        jnp.round(dec_losses["density_count"])
                        - n_objects.astype(jnp.float32)
                    )
                )
    crit = cfg.train.criterion
    n_classes = cfg.data.n_classes
    if crit in ("CE", "Multi"):
        labels = jnp.argmax(sem_onehot, axis=-1).reshape(-1)
        cw = (
            jnp.asarray(cfg.data.class_weights)
            if cfg.data.class_weights is not None
            else None
        )
        ce = softmax_cross_entropy(
            sem_logits.reshape(-1, n_classes), labels, cw
        )
        cost = cost + ce
        metrics["ce_cost"] = ce
    if crit in ("Dice", "Multi"):
        d = dice_loss(
            sem_logits, sem_onehot, optimize_bg=cfg.train.optimize_bg,
            smooth=1.0, time=1,
        )
        cost = cost + d
        metrics["dice_cost"] = d
    metrics["cost"] = cost
    return cost, metrics


_BN_MOMENTUM = 0.9  # flax BatchNorm default in tpuseg.nn.blocks._BN


def _merge_hoisted_stats(old, mut1, mut2, k: int):
    """Combine the two hoisted applies' batch_stats (cfg.hoist_skips_train).

    flax returns the FULL collection from each apply (untouched leaves pass
    through at their input values), and the two stages touch DISJOINT
    module sets — stage A: backbone/stem/heads + the decoder's skip
    transforms; stage B: attend + the glimpse scan (the transforms are
    skipped there because ``skips_t`` is supplied).  So the exact merge is
    delta-additive per leaf:

        final = old + (mut1 - old) * f + (mut2 - old)

    where ``f`` maps stage A's ONE BN running-stat update onto the K
    identical updates the unhoisted glimpse scan would have applied:
    flax BatchNorm does ra' = m*ra + (1-m)*batch, so K identical updates
    give ra_K = m^K*ra + (1-m^K)*batch = ra + (ra_1 - ra)*(1-m^K)/(1-m).
    ``f`` applies only to the ``decoder`` subtree (everything else runs
    once per step in the unhoisted path too); it is exact when the K
    scan-side transform inputs are identical, i.e. drop_rate == 0 (the
    transforms depend only on the UNet skips)."""
    f = (1.0 - _BN_MOMENTUM**k) / (1.0 - _BN_MOMENTUM)
    out = {}
    for key in old:
        fac = f if key == "decoder" else 1.0
        out[key] = jax.tree.map(
            lambda o, a, b, fac=fac: o + (a - o) * fac + (b - o),
            old[key], mut1[key], mut2[key],
        )
    return out


def make_train_step(cfg: Config, model, train_cnn: bool = True,
                    device_aug: bool = False):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: dict(images (B,H,W,21), sem_onehot (B,H,W,C),
                ins_masks (B,H,W,N), n_objects (B,)).
    ``train_cnn=False`` freezes the UNet backbone (reference
    model.py:199-201) by zeroing its gradients.

    With ``cfg.decoder.hoist_skips_train`` (default) the step runs as TWO
    applies inside one jitted loss: stage A (mode='loss_prep') computes
    everything glimpse-independent — backbone, stem, counting heads, ONE
    train-mode pass of the decoder's skip-feature transforms — and stage B
    (mode='loss_tail') runs only the attend + glimpse scan on the hoisted
    outputs.  Gradients flow through both applies; the transform BN
    running stats get the exact momentum^K fix-up (see
    ``_merge_hoisted_stats``).  The reference instead recomputes the skip
    transforms inside every glimpse iteration (attenet2.py:377).

    ``device_aug=True`` applies the on-device augmentation subset
    (tpuseg/data/device_aug.py) inside the jitted step — feed it
    batches collated WITHOUT host augmentation (AlignCollate 'test'
    mode); the PIL host path otherwise starves the chip on low-core
    hosts.
    """
    hoist = cfg.decoder.hoist_skips_train

    def loss_fn(params, state: TrainState, batch, rng):
        variables = {
            "params": params,
            "batch_stats": state.batch_stats,
            "decoder_state": state.decoder_state,
        }
        r1, r2 = jax.random.split(rng)
        images = prepare_images(batch["images"])
        if hoist:
            aux, mut1 = model.apply(
                variables,
                images,
                batch["sem_onehot"],
                train=True,
                mode="loss_prep",
                rngs={"dropout": r2},
                mutable=["batch_stats"],
            )
            (sem_logits, _, dec_losses), mut2 = model.apply(
                variables,
                images,
                batch["sem_onehot"],
                batch["ins_masks"],
                batch["n_objects"],
                train=True,
                mode="loss_tail",
                aux=aux,
                rngs={"glimpse": r1, "dropout": r2},
                mutable=["batch_stats", "decoder_state"],
            )
            mut = {
                "batch_stats": _merge_hoisted_stats(
                    state.batch_stats, mut1["batch_stats"],
                    mut2["batch_stats"], cfg.decoder.max_iter,
                ),
                "decoder_state": mut2["decoder_state"],
            }
        else:
            (sem_logits, _, dec_losses), mut = model.apply(
                variables,
                images,
                batch["sem_onehot"],
                batch["ins_masks"],
                batch["n_objects"],
                train=True,
                mode="loss",
                rngs={"glimpse": r1, "dropout": r2},
                mutable=["batch_stats", "decoder_state"],
            )
        # bf16 compute path (VERDICT r3 weak #1): the model may run in
        # bfloat16 (params/optimizer stay f32 — flax dtype affects
        # activations only); losses are always accumulated in f32.  The
        # decoder already pins f32 at its loss aggregations; the sem
        # head logits are cast here.
        cost, metrics = total_cost(
            cfg, sem_logits.astype(jnp.float32), batch["sem_onehot"],
            dec_losses, train=True, n_objects=batch["n_objects"],
        )
        return cost, (metrics, mut)

    @jax.jit
    def train_step(state: TrainState, batch, rng):
        if device_aug:
            from tpuseg.data.device_aug import device_augment

            rng, r_aug = jax.random.split(rng)
            batch = device_augment(batch, r_aug, cfg.data)
        grads, (metrics, mut) = jax.grad(loss_fn, has_aux=True)(
            state.params, state, batch, rng
        )
        if not train_cnn:
            grads = {**grads, "base": jax.tree.map(jnp.zeros_like, grads["base"])}
        state = state.apply_gradients(
            grads,
            batch_stats=mut["batch_stats"],
            decoder_state=mut["decoder_state"],
        )
        metrics["grad_norm"] = jnp.sqrt(
            sum(jnp.sum(g * g) for g in jax.tree_util.tree_leaves(grads))
        )
        return state, metrics

    return train_step


def make_debug_step(cfg: Config, model):
    """jitted single-glimpse debug forward for the periodic image dumps
    (reference attenet2.py:247-251); ``fit`` feeds its outputs to
    ``tpuseg.utils.debug_images.dump_pyramid_debug``."""

    @jax.jit
    def debug_step(state: TrainState, batch):
        return model.apply(
            state.model_variables,
            prepare_images(batch["images"]),
            batch["sem_onehot"],
            batch["ins_masks"],
            batch["n_objects"],
            train=False,
            mode="debug",
        )

    return debug_step


def make_eval_step(cfg: Config, model):
    """Returns eval_step(state, batch, rng) -> metrics (no state update)."""

    @jax.jit
    def eval_step(state: TrainState, batch, rng):
        sem_logits, _, dec_losses = model.apply(
            state.model_variables,
            prepare_images(batch["images"]),
            batch["sem_onehot"],
            batch["ins_masks"],
            batch["n_objects"],
            train=False,
            mode="loss",
            rngs={"glimpse": rng},
        )
        _, metrics = total_cost(
            cfg, sem_logits.astype(jnp.float32), batch["sem_onehot"],
            dec_losses, train=False, n_objects=batch["n_objects"],
        )
        return metrics

    return eval_step
