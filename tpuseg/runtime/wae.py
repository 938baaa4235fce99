"""WAE match loss — a self-contained trainable loss head.

Reference: ``MatchLoss`` (``code/lib/losses/dice.py:248-333``): owns a
``DcganDecoder`` with its own Adam optimizer + plateau scheduler, and
combines a focal reconstruction loss, the gl rank-matching penalty and the
sampled point-cloud MMD (``dice.py:287-303``).  Dormant in the reference
(``use_wae=False``, training_settings.py:54); provided here as a tested
functional capability.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from tpuseg.losses.focal import focal_loss
from tpuseg.losses.mmd import decoder_mmd_loss, gl_loss
from tpuseg.nn.dcgan_decoder import DcganDecoder
from tpuseg.runtime.state import PlateauState


@dataclasses.dataclass
class MatchLoss:
    decoder: DcganDecoder
    params: Any
    opt_state: Any
    plateau: PlateauState
    tx: optax.GradientTransformation
    lam: float = 1.0
    clip: float = 10.0

    @classmethod
    def create(
        cls, coding: int = 24, out_shape=(64, 64, 1), learning_rate: float = 1e-3,
        weight_decay: float = 0.0, lr_drop_factor: float = 0.5,
        lr_drop_patience: int = 25, lam: float = 1.0, seed: int = 0,
    ) -> "MatchLoss":
        decoder = DcganDecoder(coding=coding, out_shape=out_shape)
        params = decoder.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, coding))
        )["params"]
        tx = optax.chain(
            optax.clip_by_global_norm(10.0),
            optax.adamw(learning_rate, b1=0.5, b2=0.999,
                        weight_decay=weight_decay),
        )
        return cls(
            decoder=decoder,
            params=params,
            opt_state=tx.init(params),
            plateau=PlateauState.create(1.0, lr_drop_factor, lr_drop_patience),
            tx=tx,
            lam=lam,
        )

    def loss_fn(
        self, params, sample_qz: jnp.ndarray, ins_annotations: jnp.ndarray,
        key: jax.Array,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """sample_qz: (B, coding) latents; ins_annotations: (B, H, W) masks.

        Mirrors reference dice.py:287-303: recon (focal) * 100 + gl penalty
        + lambda * point-cloud MMD."""
        recon = self.decoder.apply({"params": params}, sample_qz)
        b = recon.shape[0]
        logits = jnp.stack([1.0 - recon, recon], axis=-1).reshape(-1, 2)
        # focal on probabilities: convert to logit-free focal via log-probs
        t = ins_annotations.reshape(-1)
        p = jnp.clip(recon.reshape(-1), 1e-7, 1 - 1e-7)
        rec_loss = jnp.mean(
            -((1 - p) ** 2) * jnp.log(p) * t - (p**2) * jnp.log(1 - p) * (1 - t)
        )
        penalty = gl_loss(sample_qz, recon)
        dmmd = decoder_mmd_loss(recon, ins_annotations.astype(recon.dtype), key)
        total = 100.0 * rec_loss + penalty + self.lam * dmmd
        return total, {
            "reconstruction": rec_loss,
            "gl_penalty": penalty,
            "decoder_mmd": dmmd,
        }

    def step(self, sample_qz, ins_annotations, key):
        (total, parts), grads = jax.value_and_grad(
            self.loss_fn, has_aux=True
        )(self.params, sample_qz, ins_annotations, key)
        updates, self.opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        updates = jax.tree.map(lambda u: u * self.plateau.lr, updates)
        self.params = optax.apply_updates(self.params, updates)
        return total, parts

    def scheduler_step(self, cost):
        self.plateau = self.plateau.step(cost)
